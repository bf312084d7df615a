"""SDF ray casting: DDA sampling + bisection surface refinement.

Parity port of the reference's rendering raycast helpers
(voxel_data_structures.cu:340-383 findIntersectionLinear /
findIntersectionBisection, and the RayCastSample machinery of
voxel_hash_utils.cuh:40-44) — present in the reference's inventory though
unused by its runner paths (SURVEY quirk list).  Useful here for depth-map
rendering from the TSDF (e.g. view synthesis or ICP front-ends).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mrhash_tpu import params as P
from mrhash_tpu.core.state import MapConfig, VoxelPool
from mrhash_tpu.ops import camera as C
from mrhash_tpu.ops import hashtable as H
from mrhash_tpu.ops import meshing as M


def find_intersection_linear(t_near, t_far, d_near, d_far):
    """voxel_data_structures.cu:341-346."""
    return t_near + (d_near / (d_near - d_far)) * (t_far - t_near)


def find_intersection_bisection(cfg: MapConfig, table: H.HashTable,
                                pool: VoxelPool, origin, direction,
                                d0, r0, d1, r1):
    """voxel_data_structures.cu:348-383: n_iteration_bisection rounds of
    linear interpolation + trilinear re-sampling between bracketing samples
    (r0, d0) and (r1, d1).  Vectorized over rays.

    Returns (alpha, valid)."""
    a, a_dist = r0, d0
    b, b_dist = r1, d1
    c = jnp.zeros_like(a)
    valid = jnp.ones(a.shape, bool)
    for _ in range(P.N_ITERATION_BISECTION):
        c = find_intersection_linear(a, b, a_dist, b_dist)
        pos = origin + c[..., None] * direction
        c_dist, ok = M.trilinear_interpolation(cfg, table, pool, pos)
        valid = valid & ok
        take_a = a_dist * c_dist > 0
        a = jnp.where(take_a, c, a)
        a_dist = jnp.where(take_a, c_dist, a_dist)
        b = jnp.where(take_a, b, c)
        b_dist = jnp.where(take_a, b_dist, c_dist)
    return c, valid


def raycast_depth(cfg: MapConfig, table: H.HashTable, pool: VoxelPool,
                  cam: C.Camera, step_scale: float = 0.5,
                  max_steps: int = 256):
    """Render a depth map by marching each pixel ray through the TSDF at
    step_scale * truncation increments, bracketing the first sign change,
    then refining with bisection.  Returns (depth f32[H,W], hit bool[H,W]).
    """
    rows = jnp.arange(cam.rows, dtype=jnp.float32)[:, None]
    cols = jnp.arange(cam.cols, dtype=jnp.float32)[None, :]
    r = jnp.broadcast_to(rows, (cam.rows, cam.cols)).reshape(-1)
    c = jnp.broadcast_to(cols, (cam.rows, cam.cols)).reshape(-1)
    ray_cam = C.inverse_projection(cam, r, c, jnp.ones_like(r))
    ray_cam = ray_cam / jnp.linalg.norm(ray_cam, axis=-1, keepdims=True)
    direction = ray_cam @ cam.rot.T
    origin = cam.trans

    step = step_scale * cfg.sdf_truncation

    def body(carry, _):
        tcur, prev_t, prev_d, hit_a, hit_b, hit_da, hit_db, found = carry
        pos = origin + tcur[..., None] * direction
        sdf, w, _, _, _ = M.get_voxel(cfg, table, pool, pos)
        valid = w > 0
        # sdf == 0 is on the surface: include it so exact-zero samples
        # (synthetic data, axis-aligned walls) still bracket
        crossed = valid & (prev_d > 0) & (sdf <= 0) & ~found
        hit_a = jnp.where(crossed, prev_t, hit_a)
        hit_b = jnp.where(crossed, tcur, hit_b)
        hit_da = jnp.where(crossed, prev_d, hit_da)
        hit_db = jnp.where(crossed, sdf, hit_db)
        found = found | crossed
        prev_t = jnp.where(valid, tcur, prev_t)
        prev_d = jnp.where(valid, sdf, prev_d)
        return (tcur + step, prev_t, prev_d, hit_a, hit_b, hit_da, hit_db,
                found), None

    n = r.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    init = (jnp.full((n,), cam.min_depth), z, z, z, z, z, z,
            jnp.zeros((n,), bool))
    (tend, _, _, ha, hb, hda, hdb, found), _ = jax.lax.scan(
        body, init, None, length=max_steps)

    alpha, ok = find_intersection_bisection(cfg, table, pool, origin,
                                            direction, hda, ha, hdb, hb)
    depth = jnp.where(found, jnp.where(ok, alpha, 0.5 * (ha + hb)), 0.0)
    # convert ray length to camera depth convention
    d = depth * (ray_cam[:, 2] if cam.model == C.PINHOLE
                 else jnp.ones_like(depth))
    return d.reshape(cam.rows, cam.cols), found.reshape(cam.rows, cam.cols)
