"""Multi-chip SPMD mapping over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY 2, parallelism checklist) — this module
is the TPU-native scale-out extension: spatial domain decomposition of the
hash map combined with data parallelism over camera rays.

Design (shard_map over a 1-D device mesh axis "d"):
- rays (image rows) are data-parallel: each device DDA-walks its row shard
  and emits candidate block keys;
- the hash table, block heaps and voxel pool are model-parallel, sharded by
  key ownership (avalanche(key) mod n_devices) — every block lives on
  exactly one device, so integration writes are conflict-free across chips;
- candidate keys are routed with one all_gather over ICI per allocation
  round (the only per-frame collective on the hot path);
- the garbage-collection z-buffer is merged with ppermute-free psum-style
  min reductions (jax.lax.pmin) so starvation matches the single-chip
  two-pass semantics.

Camera images are replicated (tens of MB); map state (GBs) is what shards.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as PSpec

from mrhash_tpu import params as P
from mrhash_tpu.core.state import MapConfig, MapState, VoxelPool, make_state
from mrhash_tpu.ops import camera as C
from mrhash_tpu.ops import hashtable as H
from mrhash_tpu.ops import integrate as I

AXIS = "d"


def owner_of(keys, n_dev):
    """Deterministic device ownership of a block key."""
    x = keys[..., 0].astype(jnp.uint32)
    y = keys[..., 1].astype(jnp.uint32)
    z = keys[..., 2].astype(jnp.uint32)
    h = I._avalanche((x * jnp.uint32(P.P0)) ^ (y * jnp.uint32(P.P1))
                     ^ (z * jnp.uint32(P.P2)))
    return (h % jnp.uint32(n_dev)).astype(jnp.int32)


def local_config(cfg: MapConfig, n_dev: int) -> MapConfig:
    """Per-device capacities: each shard is a full map of 1/n size."""
    import dataclasses
    return dataclasses.replace(
        cfg,
        num_blocks=max(cfg.num_blocks // n_dev, 64),
        max_active_blocks=max(cfg.max_active_blocks // n_dev, 64),
        max_alloc_per_frame=max(cfg.max_alloc_per_frame // n_dev, 64),
        max_coarsen_per_frame=max(cfg.max_coarsen_per_frame // n_dev, 64),
        max_gc_free_per_frame=max(cfg.max_gc_free_per_frame // n_dev, 64),
        low_split_chunk=max(cfg.low_split_chunk // n_dev, 8),
    )


def make_sharded_state(cfg: MapConfig, mesh: Mesh) -> MapState:
    """Global state whose arrays are sharded over the mesh: leading axes of
    the table/pool split by device (each shard is an independent sub-map)."""
    n = mesh.shape[AXIS]
    lcfg = local_config(cfg, n)
    state = make_state(lcfg.num_blocks * n)
    # re-init: heap ids must be LOCAL to each shard
    local = make_state(lcfg.num_blocks)

    def rep(x):
        return jnp.concatenate([x] * n, axis=0)

    table = state.table.replace(
        pos=rep(local.table.pos), ptr=rep(local.table.ptr),
        res=rep(local.table.res), fp=rep(local.table.fp),
        pck=rep(local.table.pck),
        heap_high=rep(local.table.heap_high),
        heap_low=rep(local.table.heap_low),
        high_count=jnp.full((n,), local.table.high_count, jnp.int32),
        low_count=jnp.zeros((n,), jnp.int32))
    pool = VoxelPool(sdf=rep(local.pool.sdf), sumsq=rep(local.pool.sumsq),
                     weight=rep(local.pool.weight), rgbp=rep(local.pool.rgbp))
    state = MapState(table=table, pool=pool, frame=jnp.int32(0))

    sharding = _fill_like(state, NamedSharding(mesh, PSpec(AXIS)),
                          NamedSharding(mesh, PSpec()))
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, sharding)


def _fill_like(state: MapState, shard, repl) -> MapState:
    """A MapState-shaped tree with `shard` on sharded leaves and `repl` on
    the frame counter (static aux fields copied from `state` so the treedefs
    match)."""
    table = state.table.replace(
        pos=shard, ptr=shard, res=shard, fp=shard, pck=shard,
        heap_high=shard, heap_low=shard, high_count=shard, low_count=shard)
    pool = state.pool.replace(sdf=shard, sumsq=shard, weight=shard,
                              rgbp=shard)
    return MapState(table=table, pool=pool, frame=repl)


def _local_table(cfg_local: MapConfig, table: H.HashTable) -> H.HashTable:
    return table.replace(high_count=table.high_count.reshape(())[()],
                         low_count=table.low_count.reshape(())[()],
                         num_buckets=cfg_local.num_blocks,
                         num_blocks=cfg_local.num_blocks)


def sharded_integrate_rgbd(cfg: MapConfig, mesh: Mesh):
    """Build the jitted SPMD frame step: (state, cam, depth, rgb) ->
    (state', stats)."""
    n = mesh.shape[AXIS]
    lcfg = local_config(cfg, n)
    num_steps = cfg.dda_steps(float(cfg.max_integration_distance))

    def local_step(table_t, pool_t, frame, cam_t, depth, rgb):
        table = _local_table(lcfg, table_t)
        pool = pool_t
        cam = cam_t
        me = jax.lax.axis_index(AXIS)

        pc = C.compute_cloud(cam, depth)
        pc_depth = C.get_depth(cam, pc)
        rows_local = cam.rows // n
        my_rows = jax.lax.dynamic_slice_in_dim(pc_depth, me * rows_local,
                                               rows_local, axis=0)

        # --- allocation with key routing over ICI -----------------------
        keys, valid = I.alloc_candidates_depth(lcfg, cam, my_rows, num_steps,
                                               row0=me * rows_local,
                                               frame=frame)
        for rnd in range(lcfg.alloc_rounds):
            ukeys, uvalid = I.dedup_candidates(
                keys, valid, frame * lcfg.alloc_rounds + rnd,
                lcfg.max_alloc_per_frame * lcfg.dedup_scratch_factor,
                lcfg.max_alloc_per_frame)
            gk = jax.lax.all_gather(ukeys, AXIS).reshape(-1, 3)
            gv = jax.lax.all_gather(uvalid, AXIS).reshape(-1)
            mine = gv & (owner_of(gk, n) == me)
            # re-dedup on the owner: several devices may each contribute the
            # same key once (insert requires globally unique keys)
            u = lcfg.max_alloc_per_frame
            okeys, ovalid = I.dedup_candidates(
                gk, mine, frame * lcfg.alloc_rounds + rnd,
                u * lcfg.dedup_scratch_factor, u)
            table, _ = H.insert(table, okeys, ovalid,
                                jnp.zeros((u,), jnp.int32))

        # --- local integrate over the full (replicated) frame ------------
        slots, count, bpos, bptr, bres, bvalid = I.compact_active(
            lcfg, table, cam)
        pool = I.integrate_depth(lcfg, pool, cam, pc_depth, rgb,
                                 bpos, bptr, bres, bvalid)

        # --- variance-adaptive coarsening (fully shard-local: a coarsened
        # block keeps its key, so owner routing is unchanged and the
        # res-1 re-insert lands on the same shard; matches the single-chip
        # pipeline, core/pipeline.py:68-82) --------------------------------
        if cfg.sdf_var_threshold > 0.0:
            def do_coarsen(table, pool):
                t, p, new_slots, new_mask, freed = I.coarsen_by_variance(
                    lcfg, table, pool, slots, bpos, bptr, bres, bvalid)
                p = I.reintegrate_blocks(lcfg, t, p, cam, pc_depth, rgb,
                                         new_slots, new_mask)
                return t, p, freed

            # mirrors the single-chip pipeline's no-recompact order
            # (deviation D18): starve/GC below run on the pre-coarsen
            # window minus the entries coarsening freed
            table, pool, coarsen_freed = jax.lax.cond(
                frame > 0, do_coarsen,
                lambda t, p: (t, p, jnp.zeros_like(bvalid)), table, pool)
            bvalid = bvalid & ~coarsen_freed

        # --- garbage collection with a global z-buffer -------------------
        if cfg.n_frames_invalidate_voxels > 0:
            nf = cfg.n_frames_invalidate_voxels

            def starve(pool):
                return _sharded_starve(lcfg, pool, cam, bpos, bptr, bres,
                                       bvalid)

            pool = jax.lax.cond((frame > 0) & (frame % nf == 0), starve,
                                lambda p: p, pool)
            table, pool = I.garbage_collect_sweep(lcfg, table, pool, cam,
                                                  slots, bpos, bptr, bres,
                                                  bvalid)

        count = jax.lax.psum(count, AXIS)
        high_free = jax.lax.psum(table.high_count, AXIS)
        gn = lcfg.num_blocks * n
        table_out = table.replace(high_count=table.high_count.reshape(1),
                                  low_count=table.low_count.reshape(1),
                                  num_buckets=gn, num_blocks=gn)
        stats = dict(occupied_blocks=count, high_free=high_free,
                     low_free=jax.lax.psum(table.low_count, AXIS),
                     frame=frame)
        return table_out, pool, stats

    def _sharded_starve(lcfg, pool, cam, bpos, bptr, bres, bvalid):
        """starveVoxels with the depth z-buffer pmin-merged across devices
        (ops/integrate.starve_mask axis_name path).  Same D11 semantics as
        the single-chip starve — all exact-depth ties starve — so the
        sharded map stays bit-equal to the single-chip map; the reference's
        lowest-thread-id tie-break (voxel_data_structures.cu:1629-1639) is
        a reproducibility device, not a correctness requirement, and
        cross-device thread ids would be meaningless anyway."""
        starved = I.starve_mask(lcfg, cam, bpos, bptr, bres, bvalid,
                                axis_name=AXIS)
        return I.apply_starve(lcfg, pool, bptr, bres, bvalid, starved)

    gn = lcfg.num_blocks * n
    s = PSpec(AXIS)
    specs = MapState(
        table=H.HashTable(pos=s, ptr=s, res=s, fp=s, pck=s,
                          heap_high=s, heap_low=s,
                          high_count=s, low_count=s, num_buckets=gn,
                          num_blocks=gn),
        pool=VoxelPool(sdf=s, sumsq=s, weight=s, rgbp=s), frame=PSpec())

    sharded_cache = {}

    def get_sharded(cam: C.Camera):
        key = (cam.rows, cam.cols, cam.model)
        if key not in sharded_cache:
            cam_spec = jax.tree.map(lambda _: PSpec(), cam)
            sharded_cache[key] = shard_map(
                local_step, mesh=mesh,
                in_specs=(specs.table, specs.pool, PSpec(), cam_spec,
                          PSpec(), PSpec()),
                out_specs=(specs.table, specs.pool,
                           dict(occupied_blocks=PSpec(), high_free=PSpec(),
                                low_free=PSpec(), frame=PSpec())),
                check_vma=False)
        return sharded_cache[key]

    @jax.jit
    def step(state: MapState, cam: C.Camera, depth, rgb):
        table, pool, stats = get_sharded(cam)(
            state.table, state.pool, state.frame, cam, depth, rgb)
        new_state = MapState(table=table, pool=pool, frame=state.frame + 1)
        return new_state, stats

    return step


def snapshot_to_grid(cfg: MapConfig, mesh: Mesh, state: MapState,
                     grid=None, staging: int = 4096):
    """Gather every occupied block of a SHARDED map into a host ChunkGrid
    (the sharded half of extractMesh / serializeGrid, mirroring the
    reference's streamAllOut protocol, streamer.cpp:249-281).

    Each shard is an independent sub-map (key-ownership partitioning), so
    the single-chip plan/pack eviction programs run per addressable shard
    on its own device — no collective needed.  The collection is READ-ONLY:
    the planned table is discarded, so `state` stays valid for further
    frames.  Returns the ChunkGrid."""
    import numpy as np

    from mrhash_tpu.core import streaming as S

    n = mesh.shape[AXIS]
    lcfg = local_config(cfg, n)
    if grid is None:
        grid = S.ChunkGrid(np.asarray(cfg.voxel_extents, np.float32))
    staging = min(staging, lcfg.num_blocks)
    plan = jax.jit(functools.partial(S.plan_evictions, lcfg))
    pack = jax.jit(functools.partial(S.pack_evicted_pass, lcfg, staging))

    def shard_list(arr):
        """Per-shard local arrays ordered by global offset (shard ordinal =
        device position along the mesh axis for every PSpec(AXIS) leaf)."""
        return [s.data for s in sorted(arr.addressable_shards,
                                       key=lambda s: s.index[0].start or 0)]

    tnames = ("pos", "ptr", "res", "fp", "pck", "heap_high", "heap_low",
              "high_count", "low_count")
    pnames = ("sdf", "sumsq", "weight", "rgbp")
    tparts = {nm: shard_list(getattr(state.table, nm)) for nm in tnames}
    pparts = {nm: shard_list(getattr(state.pool, nm)) for nm in pnames}
    n_shards = len(tparts["ptr"])
    zero3 = jnp.zeros((3,), jnp.float32)
    for d in range(n_shards):
        table = H.HashTable(
            pos=tparts["pos"][d], ptr=tparts["ptr"][d],
            res=tparts["res"][d], fp=tparts["fp"][d], pck=tparts["pck"][d],
            heap_high=tparts["heap_high"][d],
            heap_low=tparts["heap_low"][d],
            high_count=tparts["high_count"][d].reshape(())[()],
            low_count=tparts["low_count"][d].reshape(())[()],
            num_buckets=lcfg.num_blocks, num_blocks=lcfg.num_blocks)
        pool = VoxelPool(sdf=pparts["sdf"][d], sumsq=pparts["sumsq"][d],
                         weight=pparts["weight"][d], rgbp=pparts["rgbp"][d])
        _, n_evict, pos_all, res_all, ptr_all = plan(
            table, zero3, jnp.float32(0.0), jnp.asarray(True))
        n_evict = int(n_evict)
        nd = jnp.int32(n_evict)
        for off in range(0, n_evict, staging):
            pool2, buf = pack(pool, pos_all, res_all, ptr_all, nd,
                              jnp.int32(off))
            k = min(staging, n_evict - off)
            buf_h = np.asarray(buf[:k]) if k == staging else \
                np.asarray(buf)[:k]
            pos_h, res_h, sdf_h, ssq_h, w_h, rgb_h = S.unpack_transfer(buf_h)
            bw = (pos_h.astype(np.float64) * P.SDF_BLOCK_SIZE
                  * cfg.virtual_voxel_size)
            grid.add_blocks(bw, pos_h, res_h, sdf_h, ssq_h, w_h, rgb_h)
            pool = pool2
    return grid


def extract_mesh_sharded(cfg: MapConfig, mesh: Mesh, state: MapState,
                         geo, filename: str):
    """Sharded-map extractMesh: snapshot all shards to `geo`'s host chunk
    grid, then run the single-chip batch sweep (GeoWrapper.extractMesh).
    `geo` must be a GeoWrapper built with a compatible MapConfig (it
    provides the sweep capacity + mesh post-processing); its own map must
    be empty.  Mirrors geowrapper.cpp:150-230 at the protocol level."""
    snapshot_to_grid(cfg, mesh, state, grid=geo.streamer.grid)
    geo.extractMesh(filename)
    return geo.mesh


def sharded_integrate_points(cfg: MapConfig, mesh: Mesh):
    """Sharded LiDAR frame step (mirrors pipeline.integrate_points).

    Allocation is point-data-parallel (each device DDA-walks its N/n point
    slice, candidate keys route to their owner over one all_gather);
    integration is map-parallel: every device runs the per-point voxel walk
    over the full replicated cloud, but its local hash lookup only resolves
    blocks it owns, so the segment-sum writes stay shard-local and
    conflict-free across chips.  Coarsening (sdf_var_threshold > 0) is
    shard-local like the RGB-D path; the 3D reintegrate quirk (D8) is
    preserved — no reintegration after coarsening."""
    n = mesh.shape[AXIS]
    lcfg = local_config(cfg, n)
    num_steps = cfg.dda_steps(float(cfg.max_integration_distance))
    num_voxel_steps = cfg.dda_voxel_steps(float(cfg.max_integration_distance))

    def local_step(table_t, pool_t, frame, cam_t, points, normals, weights,
                   point_valid):
        table = _local_table(lcfg, table_t)
        pool = pool_t
        cam = cam_t
        me = jax.lax.axis_index(AXIS)

        n_local = points.shape[0] // n
        sl = me * n_local
        my_pts = jax.lax.dynamic_slice_in_dim(points, sl, n_local)
        my_nrm = jax.lax.dynamic_slice_in_dim(normals, sl, n_local)
        my_ok = jax.lax.dynamic_slice_in_dim(point_valid, sl, n_local)

        keys, valid = I.alloc_candidates_points(lcfg, cam, my_pts, my_nrm,
                                                my_ok, num_steps)
        for rnd in range(lcfg.alloc_rounds):
            ukeys, uvalid = I.dedup_candidates(
                keys, valid, frame * lcfg.alloc_rounds + rnd,
                lcfg.max_alloc_per_frame * lcfg.dedup_scratch_factor,
                lcfg.max_alloc_per_frame)
            gk = jax.lax.all_gather(ukeys, AXIS).reshape(-1, 3)
            gv = jax.lax.all_gather(uvalid, AXIS).reshape(-1)
            mine = gv & (owner_of(gk, n) == me)
            u = lcfg.max_alloc_per_frame
            okeys, ovalid = I.dedup_candidates(
                gk, mine, frame * lcfg.alloc_rounds + rnd,
                u * lcfg.dedup_scratch_factor, u)
            table, _ = H.insert(table, okeys, ovalid,
                                jnp.zeros((u,), jnp.int32))

        slots, count, bpos, bptr, bres, bvalid = I.compact_active(lcfg, table)
        if lcfg.sample_mode == "fused" and lcfg.projective_sdf:
            # fused spherical kernel per shard (deviation D19): every device
            # rasterizes the replicated cloud identically and runs its LOCAL
            # window through the kernel — writes stay shard-local, no
            # collective beyond the alloc all_gather above
            pool, _ = I.fused_integrate_points(
                lcfg, table, pool, cam, points, normals, weights,
                point_valid, frame,
                window=(slots, bpos, bptr, bres, bvalid))
        else:
            pool = I.integrate_points_sdf(lcfg, table, pool, cam, points,
                                          normals, weights, point_valid,
                                          num_voxel_steps, frame=frame,
                                          window=(slots, bpos, bptr, bres,
                                                  bvalid))

        if cfg.sdf_var_threshold > 0.0:
            def do_coarsen(table, pool):
                t, p, _, _, _ = I.coarsen_by_variance(
                    lcfg, table, pool, slots, bpos, bptr, bres, bvalid)
                return t, p

            table, pool = jax.lax.cond(frame > 0, do_coarsen,
                                       lambda t, p: (t, p), table, pool)
            slots, count, bpos, bptr, bres, bvalid = I.compact_active(
                lcfg, table)

        if cfg.n_frames_invalidate_voxels > 0:
            nf = cfg.n_frames_invalidate_voxels
            pool = jax.lax.cond(
                (frame > 0) & (frame % nf == 0),
                lambda p: _sharded_starve_points(lcfg, p, cam, bpos, bptr,
                                                 bres, bvalid),
                lambda p: p, pool)
            table, pool = I.garbage_collect_sweep(lcfg, table, pool, cam,
                                                  slots, bpos, bptr, bres,
                                                  bvalid)

        count = jax.lax.psum(count, AXIS)
        gn2 = lcfg.num_blocks * n
        table_out = table.replace(high_count=table.high_count.reshape(1),
                                  low_count=table.low_count.reshape(1),
                                  num_buckets=gn2, num_blocks=gn2)
        stats = dict(occupied_blocks=count,
                     high_free=jax.lax.psum(table.high_count, AXIS),
                     low_free=jax.lax.psum(table.low_count, AXIS),
                     frame=frame)
        return table_out, pool, stats

    def _sharded_starve_points(lcfg, pool, cam, bpos, bptr, bres, bvalid):
        """Same global-pmin z-buffer as the RGB-D _sharded_starve."""
        starved = I.starve_mask(lcfg, cam, bpos, bptr, bres, bvalid,
                                axis_name=AXIS)
        return I.apply_starve(lcfg, pool, bptr, bres, bvalid, starved)

    gn = lcfg.num_blocks * n
    s = PSpec(AXIS)
    specs = MapState(
        table=H.HashTable(pos=s, ptr=s, res=s, fp=s, pck=s,
                          heap_high=s, heap_low=s,
                          high_count=s, low_count=s, num_buckets=gn,
                          num_blocks=gn),
        pool=VoxelPool(sdf=s, sumsq=s, weight=s, rgbp=s), frame=PSpec())

    sharded_cache = {}

    def get_sharded(cam: C.Camera, shape):
        key = (cam.rows, cam.cols, cam.model, shape)
        if key not in sharded_cache:
            cam_spec = jax.tree.map(lambda _: PSpec(), cam)
            sharded_cache[key] = shard_map(
                local_step, mesh=mesh,
                in_specs=(specs.table, specs.pool, PSpec(), cam_spec,
                          PSpec(), PSpec(), PSpec(), PSpec()),
                out_specs=(specs.table, specs.pool,
                           dict(occupied_blocks=PSpec(), high_free=PSpec(),
                                low_free=PSpec(), frame=PSpec())),
                check_vma=False)
        return sharded_cache[key]

    @jax.jit
    def step(state: MapState, cam: C.Camera, points, normals, weights,
             point_valid):
        table, pool, stats = get_sharded(cam, points.shape[0])(
            state.table, state.pool, state.frame, cam, points, normals,
            weights, point_valid)
        new_state = MapState(table=table, pool=pool, frame=state.frame + 1)
        return new_state, stats

    return step
