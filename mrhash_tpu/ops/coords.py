"""Coordinate transforms: world <-> virtual-voxel <-> SDF-block <-> linear index.

Vectorized jnp re-derivation of the reference's device helpers
(mrhash/src/sdf/voxel_hash_utils.cuh:66-224).  All functions broadcast over
leading dimensions; coordinates ride in a trailing axis of size 3.

One deliberate fix vs the reference: `virtual_voxel_pos_to_block_index`
linearizes res-1 (4^3) local coordinates densely (z*16+y*4+x) so reads match
the dense writes of the integrate/reintegrate/meshing paths.  The reference's
`virtualVoxelPosToSDFBlockIndex` (voxel_hash_utils.cuh:110-128) linearizes
with the full block stride (z*64+y*8+x), which indexes past a 64-voxel low-res
block; documented in DESIGN.md.
"""
from __future__ import annotations

import jax.numpy as jnp

from mrhash_tpu import params as P


def virtual_voxel_pos_to_world(virtual_voxel_size, voxel_pos):
    """voxel_hash_utils.cuh:66-72 — integer/float voxel coords -> metres."""
    return voxel_pos.astype(jnp.float32) * jnp.float32(virtual_voxel_size)


def _sign_aware_floor(x, eps=P.COORD_EPSILON):
    """floor for x>=0, ceil for x<0, each nudged by eps toward zero bias.

    Matches the (pw >= 0) ? floorf(pw+eps) : ceilf(pw-eps) idiom used all over
    voxel_hash_utils.cuh (:96-100, :147-149).
    """
    x = x.astype(jnp.float32)
    return jnp.where(x >= 0, jnp.floor(x + eps), jnp.ceil(x - eps))


def virtual_voxel_pos_to_sdf_block(virtual_voxel_pos, virtual_voxel_size,
                                   voxel_extents, block_size=P.SDF_BLOCK_SIZE):
    """voxel_hash_utils.cuh:75-103 — virtual voxel coords -> owning block coords."""
    vp = virtual_voxel_pos
    vp = jnp.where(vp < 0, vp - (block_size - 1), vp)
    pw = virtual_voxel_pos_to_world(virtual_voxel_size, vp)
    metric_block = (jnp.asarray(voxel_extents, jnp.float32)
                    * jnp.float32(P.SDF_BLOCK_SIZE) * jnp.float32(virtual_voxel_size))
    return _sign_aware_floor(pw / metric_block).astype(jnp.int32)


def linearize_voxel_pos(local_pos, block_size=P.SDF_BLOCK_SIZE):
    """voxel_hash_utils.cuh:106-108 — local (x,y,z) -> flat index, z-major."""
    return (local_pos[..., 2] * block_size * block_size
            + local_pos[..., 1] * block_size + local_pos[..., 0])


def delinearize_voxel_pos(index, block_size=P.SDF_BLOCK_SIZE):
    """voxel_hash_utils.cuh:130-136 — flat index -> local (x,y,z)."""
    size2 = block_size * block_size
    x = index % block_size
    y = (index % size2) // block_size
    z = index // size2
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def virtual_voxel_pos_to_block_index(virtual_voxel_pos, block_size=P.SDF_BLOCK_SIZE):
    """Local index of a virtual voxel inside its block, dense per resolution.

    Re-derivation of voxel_hash_utils.cuh:110-128 with the dense-stride fix
    (see module docstring).  `block_size` is the per-resolution side (8 or 4).
    """
    scaling = P.SDF_BLOCK_SIZE // block_size
    local = jnp.mod(virtual_voxel_pos, P.SDF_BLOCK_SIZE)  # jnp mod is non-negative
    local = local // scaling
    return linearize_voxel_pos(local, block_size)


def sdf_block_to_virtual_voxel_pos(sdf_block):
    """voxel_hash_utils.cuh:138-140."""
    return sdf_block * P.SDF_BLOCK_SIZE


def world_point_to_virtual_voxel_pos(virtual_voxel_size, point):
    """voxel_hash_utils.cuh:143-151 — nearest virtual voxel (round half away)."""
    p = point.astype(jnp.float32) / jnp.float32(virtual_voxel_size)
    approx = p + jnp.sign(p) * 0.5
    return _sign_aware_floor(approx).astype(jnp.int32)


def world_point_to_sdf_block(virtual_voxel_size, voxel_extents, point):
    """voxel_hash_utils.cuh:157-161."""
    return virtual_voxel_pos_to_sdf_block(
        world_point_to_virtual_voxel_pos(virtual_voxel_size, point),
        virtual_voxel_size, voxel_extents)


def sdf_block_to_world_point(virtual_voxel_size, sdf_block):
    """voxel_hash_utils.cuh:163-165."""
    return virtual_voxel_pos_to_world(virtual_voxel_size,
                                      sdf_block_to_virtual_voxel_pos(sdf_block))


def get_truncation(z, sdf_truncation, sdf_truncation_scale):
    """voxel_hash_utils.cuh:184-187 — linear-in-depth truncation band."""
    return sdf_truncation + sdf_truncation_scale * z


def world_to_chunks(pw, voxel_extents):
    """voxel_hash_utils.cuh:211-223 — world point -> chunk coords.

    int3(p + sign(p)*0.5) truncates toward zero == round half away from zero.
    """
    p = pw.astype(jnp.float32) / jnp.asarray(voxel_extents, jnp.float32)
    return jnp.trunc(p + jnp.sign(p) * 0.5).astype(jnp.int32)


def combine_voxel(sdf0, w0, rgb0, sdf1, w1, rgb1,
                  integration_weight_max=P.INTEGRATION_WEIGHT_MAX):
    """voxel_hash_utils.cuh:167-181 — weighted SDF merge + 50/50 color blend.

    Weights are carried as int32 with u8 semantics (cap 255).  Keeps the
    reference's deliberate 50/50 color average (not weight-proportional).
    """
    w0f = w0.astype(jnp.float32)
    w1f = w1.astype(jnp.float32)
    rgb = jnp.floor(0.5 * rgb0.astype(jnp.float32)
                    + 0.5 * rgb1.astype(jnp.float32) + 0.5).astype(jnp.uint8)
    sdf = (sdf0 * w0f + sdf1 * w1f) / (w0f + w1f)
    w = jnp.minimum(integration_weight_max, w0 + w1)
    return sdf, w, rgb
