"""Per-frame pipelines: one jit-compiled program per frame type.

Composition mirrors VoxelContainer::integrate
(mrhash/src/sdf/voxel_data_structures.cpp:89-134):
  alloc -> compact -> integrate -> [variance coarsen -> realloc ->
  reintegrate] -> [starve every N frames] -> GC identify/free
but as a single fused XLA program per frame (the reference launches ~10
kernels with cudaDeviceSynchronize between each).

The returned stats dict carries the scalars the host needs (occupied blocks,
heap free counts) so one small device->host transfer per frame suffices.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from mrhash_tpu.core import resident as R
from mrhash_tpu.core.state import MapConfig, MapState
from mrhash_tpu.ops import camera as C
from mrhash_tpu.ops import integrate as I


def resident_enabled(cfg: MapConfig) -> bool:
    """Resident window mode: fused single-res RGB-D only (multi-res sibling
    windows share pool rows, which breaks the one-block-per-resident-row
    invariant — they keep the scatter writeback)."""
    return (cfg.resident_rows > 0 and cfg.sample_mode == "fused"
            and cfg.sdf_var_threshold == 0.0)


def _stats(state: MapState, count, unserved=None):
    return dict(occupied_blocks=count,
                high_free=state.table.high_count,
                low_free=state.table.low_count,
                frame=state.frame,
                unserved_blocks=(jnp.int32(0) if unserved is None
                                 else unserved))


def integrate_rgbd(cfg: MapConfig, state: MapState, cam: C.Camera,
                   depth_img, rgb_img):
    """Full RGB-D frame step.  depth_img f32[H,W] metric depth,
    rgb_img u8[H,W,3]."""
    pc = C.compute_cloud(cam, depth_img)
    pc_depth = C.get_depth(cam, pc)  # 0 where invalid
    num_steps = cfg.dda_steps(float(cfg.max_integration_distance))

    # --- allocation -------------------------------------------------------
    keys, valid = I.alloc_candidates_depth(cfg, cam, pc_depth, num_steps,
                                           frame=state.frame)
    table = I.alloc_blocks(cfg, state.table, keys, valid, state.frame)

    # --- compaction + integration -----------------------------------------
    slots, count, bpos, bptr, bres, bvalid = I.compact_active(cfg, table, cam)
    unserved = None
    if resident_enabled(cfg):
        # resident window: slice-addressed fused integrate + GC/starve on
        # the resident rows (see core/resident.py for the TPU rationale)
        rp, pool, (slots, bpos, bptr, bres, bvalid) = R.adopt_window(
            cfg, state.resident, state.pool, slots, bpos, bptr, bres, bvalid)
        rpool, iaux = I.fused_integrate_depth(
            cfg, rp.pool, cam, pc_depth, rgb_img,
            bpos, bptr, bres, bvalid, frame=state.frame, resident=True)
        unserved = iaux["unserved_blocks"]
        A = bptr.shape[0]
        rptr = jnp.arange(A, dtype=jnp.int32) * 512
        if cfg.n_frames_invalidate_voxels > 0:
            n = cfg.n_frames_invalidate_voxels
            rpool = jax.lax.cond(
                (state.frame > 0) & (state.frame % n == 0),
                lambda p: I.starve_voxels(cfg, p, cam, bpos, rptr, bres,
                                          bvalid),
                lambda p: p, rpool)
            rp = rp.replace(pool=rpool)
            table, pool, rp = I.garbage_collect_sweep(
                cfg, table, pool, cam, slots, bpos, bptr, bres, bvalid,
                kernel_flags=(iaux["gc_min_s"], iaux["gc_max_w"]),
                resident_rp=rp)
        else:
            rp = rp.replace(pool=rpool)
        state = MapState(table=table, pool=pool, frame=state.frame + 1,
                         resident=rp)
        return state, _stats(state, count, unserved)
    if cfg.sample_mode == "fused":
        # single fused Pallas pass (projection + sampling + TSDF merge);
        # multi-res windows carry res + lane0 in the kernel meta and write
        # back window-granularly (sibling res-1 blocks share pool rows)
        pool, iaux = I.fused_integrate_depth(
            cfg, state.pool, cam, pc_depth, rgb_img,
            bpos, bptr, bres, bvalid, frame=state.frame)
        unserved = iaux["unserved_blocks"]
    else:
        pool = I.integrate_depth(cfg, state.pool, cam, pc_depth, rgb_img,
                                 bpos, bptr, bres, bvalid)

    # --- variance-adaptive coarsening --------------------------------------
    if cfg.sdf_var_threshold > 0.0:
        # reintegrate via the split pallas sampler (integrate_depth has no
        # fused mode; gather mode would cost ~4M element gathers at the
        # max_coarsen window)
        rcfg = (dataclasses.replace(cfg, sample_mode="pallas")
                if cfg.sample_mode == "fused" else cfg)
        decide = I.coarsen_decide(cfg, pool, bptr, bres, bvalid)

        def do_coarsen(table, pool):
            t, p, new_slots, new_mask = I.coarsen_by_variance(
                cfg, table, pool, slots, bpos, bptr, bres, bvalid,
                decide=decide)
            p = I.reintegrate_blocks(rcfg, t, p, cam, pc_depth, rgb_img,
                                     new_slots, new_mask)
            # table changed: refresh the compacted window
            return (t, p) + I.compact_active(cfg, t, cam)

        def skip(table, pool):
            return (table, pool, slots, count, bpos, bptr, bres, bvalid)

        # decide.any() gates the whole free/realloc/reintegrate/recompact
        # chain: steady-state frames (nothing left to coarsen) pay only the
        # variance scan (lax.cond branches are real on this path — measured)
        (table, pool, slots, count, bpos, bptr, bres,
         bvalid) = jax.lax.cond((state.frame > 0) & jnp.any(decide),
                                do_coarsen, skip, table, pool)

    # --- garbage collection -------------------------------------------------
    if cfg.n_frames_invalidate_voxels > 0:
        n = cfg.n_frames_invalidate_voxels
        pool = jax.lax.cond(
            (state.frame > 0) & (state.frame % n == 0),
            lambda p: I.starve_voxels(cfg, p, cam, bpos, bptr, bres, bvalid),
            lambda p: p, pool)
        flags = None
        if unserved is not None and cfg.sdf_var_threshold == 0.0:
            # fused path: GC inputs ride the kernel out (single-res only —
            # res-1 flag lanes would mix sibling windows sharing the row)
            flags = (iaux["gc_min_s"], iaux["gc_max_w"])
        table, pool = I.garbage_collect_sweep(
            cfg, table, pool, cam, slots, bpos, bptr, bres, bvalid,
            kernel_flags=flags)

    state = MapState(table=table, pool=pool, frame=state.frame + 1,
                     resident=state.resident)
    return state, _stats(state, count, unserved)


def integrate_points(cfg: MapConfig, state: MapState, cam: C.Camera,
                     points, normals, weights, point_valid):
    """Full LiDAR frame step (voxel_data_structures.cpp:112-134).

    points f32[N,3] camera-frame, normals f32[N,3] (zeros if none),
    weights f32[N] per-point measurement weights, point_valid bool[N]
    (padding mask — LiDAR clouds are padded to a static bucket size)."""
    num_steps = cfg.dda_steps(float(cfg.max_integration_distance))
    num_voxel_steps = cfg.dda_voxel_steps(float(cfg.max_integration_distance))

    keys, valid = I.alloc_candidates_points(cfg, cam, points, normals,
                                            point_valid, num_steps)
    table = I.alloc_blocks(cfg, state.table, keys, valid, state.frame)

    slots, count, bpos, bptr, bres, bvalid = I.compact_active(cfg, table)
    pool = I.integrate_points_sdf(cfg, table, state.pool, cam, points,
                                  normals, weights, point_valid,
                                  num_voxel_steps, frame=state.frame,
                                  window=(slots, bpos, bptr, bres, bvalid))

    if cfg.sdf_var_threshold > 0.0:
        decide = I.coarsen_decide(cfg, pool, bptr, bres, bvalid)

        def do_coarsen(table, pool):
            t, p, new_slots, new_mask = I.coarsen_by_variance(
                cfg, table, pool, slots, bpos, bptr, bres, bvalid,
                decide=decide)
            # NOTE: reference quirk preserved — the 3D reintegrate wrapper
            # launches the plain integrate kernel (voxel_data_structures.cu:
            # 1560-1580), which only touches frustum-projected voxels; for
            # the 3D path new coarse blocks are refilled on later frames.
            return (t, p) + I.compact_active(cfg, t)

        def skip(table, pool):
            return (table, pool, slots, count, bpos, bptr, bres, bvalid)

        (table, pool, slots, count, bpos, bptr, bres,
         bvalid) = jax.lax.cond((state.frame > 0) & jnp.any(decide),
                                do_coarsen, skip, table, pool)

    if cfg.n_frames_invalidate_voxels > 0:
        n = cfg.n_frames_invalidate_voxels
        pool = jax.lax.cond(
            (state.frame > 0) & (state.frame % n == 0),
            lambda p: I.starve_voxels(cfg, p, cam, bpos, bptr, bres, bvalid),
            lambda p: p, pool)
        table, pool = I.garbage_collect_sweep(
            cfg, table, pool, cam, slots, bpos, bptr, bres, bvalid)

    state = MapState(table=table, pool=pool, frame=state.frame + 1,
                     resident=state.resident)
    return state, _stats(state, count)


@functools.lru_cache(maxsize=None)
def jit_integrate_rgbd(cfg: MapConfig):
    return jax.jit(functools.partial(integrate_rgbd, cfg),
                   donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def jit_integrate_points(cfg: MapConfig):
    return jax.jit(functools.partial(integrate_points, cfg),
                   donate_argnums=(0,))
