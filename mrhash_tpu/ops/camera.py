"""Pinhole + spherical (LiDAR equirectangular) camera model.

Functional re-derivation of the reference's device-resident Camera class
(mrhash/src/sdf/camera.{cuh,cu}).  The camera is a pytree: intrinsics and the
cam->world SE3 are traced f32 leaves; image shape and model are static fields
so they can shape jit-compiled programs.

All projections are vectorized over arbitrary leading dims; `compute_cloud`
replaces the per-pixel calculateCloudKernel (camera.cu:5-19) with one
broadcasted back-projection.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

PINHOLE = 0
SPHERICAL = 1


@struct.dataclass
class Camera:
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    min_depth: jax.Array
    max_depth: jax.Array
    # cam -> world transform
    rot: jax.Array      # f32[3,3]
    trans: jax.Array    # f32[3]
    rows: int = struct.field(pytree_node=False, default=0)
    cols: int = struct.field(pytree_node=False, default=0)
    model: int = struct.field(pytree_node=False, default=PINHOLE)


def make_camera(fx, fy, cx, cy, rows, cols, min_depth, max_depth,
                model=PINHOLE) -> Camera:
    return Camera(
        fx=jnp.float32(fx), fy=jnp.float32(fy),
        cx=jnp.float32(cx), cy=jnp.float32(cy),
        min_depth=jnp.float32(min_depth), max_depth=jnp.float32(max_depth),
        rot=jnp.eye(3, dtype=jnp.float32), trans=jnp.zeros(3, jnp.float32),
        rows=int(rows), cols=int(cols), model=int(model))


def with_pose(cam: Camera, rot, trans) -> Camera:
    """camera.cuh:72 setCamInWorld."""
    return cam.replace(rot=jnp.asarray(rot, jnp.float32),
                       trans=jnp.asarray(trans, jnp.float32))


def cam_to_world(cam: Camera, pc):
    """Apply cam-in-world SE3 to camera-frame points [...,3]."""
    return pc @ cam.rot.T + cam.trans


def world_to_cam(cam: Camera, pw):
    """Apply the inverse SE3 (cuda_algebra.cuh CUDAMatSE3::inverse)."""
    return (pw - cam.trans) @ cam.rot


def inverse_projection(cam: Camera, row, col, d):
    """camera.cuh:84-103 — pixel (row,col) at depth/range d -> camera-frame point."""
    row = row.astype(jnp.float32)
    col = col.astype(jnp.float32)
    d = d.astype(jnp.float32)
    if cam.model == PINHOLE:
        x = (col - cam.cx - 0.5) / cam.fx
        y = (row - cam.cy - 0.5) / cam.fy
        ray = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    else:
        az = (col - cam.cx - 0.5) / cam.fx
        el = (row - cam.cy - 0.5) / cam.fy
        c1 = jnp.cos(el)
        ray = jnp.stack([jnp.cos(az) * c1, jnp.sin(az) * c1, jnp.sin(el)], axis=-1)
    return d[..., None] * ray


def get_depth(cam: Camera, pc):
    """camera.cuh:120-129 — z for pinhole, range for spherical."""
    if cam.model == PINHOLE:
        return pc[..., 2]
    return jnp.linalg.norm(pc, axis=-1)


def normalize_depth(cam: Camera, depth):
    """camera.cuh:105-107."""
    return (depth - cam.min_depth) / (cam.max_depth - cam.min_depth)


def _project_rowcol(cam: Camera, pc):
    """Shared row/col math of projectPoint{,Approx} (camera.cuh:131-203).

    The reference assigns the float result to int — C truncation toward zero,
    kept here via jnp.trunc (differs from floor only in (-1, 0)).
    """
    if cam.model == PINHOLE:
        depth_ok = (pc[..., 2] > cam.min_depth) & (pc[..., 2] <= cam.max_depth)
        z = jnp.where(pc[..., 2] == 0, 1.0, pc[..., 2])
        row = jnp.trunc(cam.fy * pc[..., 1] / z + cam.cy + 0.5).astype(jnp.int32)
        col = jnp.trunc(cam.fx * pc[..., 0] / z + cam.cx + 0.5).astype(jnp.int32)
    else:
        rng = jnp.linalg.norm(pc, axis=-1)
        depth_ok = (rng >= cam.min_depth) & (rng <= cam.max_depth)
        safe = jnp.where(rng == 0, 1.0, rng)
        px = jnp.arctan2(pc[..., 1], pc[..., 0])
        py = jnp.arcsin(jnp.clip(pc[..., 2] / safe, -1.0, 1.0))
        row = jnp.trunc(cam.fy * py + cam.cy + 0.5).astype(jnp.int32)
        col = jnp.trunc(cam.fx * px + cam.cx + 0.5).astype(jnp.int32)
    return row, col, depth_ok


def project_point(cam: Camera, pc):
    """camera.cuh:131-165 — exact projection.  Returns (row, col, valid)."""
    row, col, depth_ok = _project_rowcol(cam, pc)
    inside = (row >= 0) & (col >= 0) & (row < cam.rows) & (col < cam.cols)
    return row, col, depth_ok & inside


def project_point_approx(cam: Camera, pc):
    """camera.cuh:167-203 — projection with +-50% image-border slack."""
    row, col, depth_ok = _project_rowcol(cam, pc)
    rt = int(cam.rows * 0.5)
    ct = int(cam.cols * 0.5)
    inside = ((row >= -rt) & (col >= -ct)
              & (row < cam.rows + rt) & (col < cam.cols + ct))
    return row, col, depth_ok & inside


def is_in_camera_frustum_approx(cam: Camera, pw):
    """camera.cuh:109-118 — world point inside the padded frustum."""
    _, _, ok = project_point_approx(cam, world_to_cam(cam, pw))
    return ok


def compute_cloud(cam: Camera, depth_img):
    """camera.cu:5-26 — back-project a depth image to a [rows,cols,3] cloud.

    Depth outside [min_depth, max_depth] produces the zero point, matching the
    kernel's early-out on an all-zero initialized cloud image.
    """
    rows = jnp.arange(cam.rows, dtype=jnp.float32)[:, None]
    cols = jnp.arange(cam.cols, dtype=jnp.float32)[None, :]
    r = jnp.broadcast_to(rows, depth_img.shape)
    c = jnp.broadcast_to(cols, depth_img.shape)
    pc = inverse_projection(cam, r, c, depth_img)
    valid = (depth_img > cam.min_depth) & (depth_img <= cam.max_depth)
    return jnp.where(valid[..., None], pc, 0.0)
