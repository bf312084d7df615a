"""Fast-iteration TPU perf harness for the multi-res integrate frame.

The standard warmup (10 full jitted frames over the axon tunnel) costs
~10 min per measurement run; this tool runs it ONCE (`save`), snapshots the
map state to /tmp/mr_snap.npz, and then every stage-timing invocation
(`run <stage ...>`) reloads the snapshot in seconds.

Usage:
  python tools/perf_snap.py save
  python tools/perf_snap.py run [stage ...]
Stages: pack packparts kernel rowgather writeback flagmap fused full
"""
import dataclasses
import functools
import sys
import time

import numpy as np

SNAP = "/tmp/mr_snap.npz"
ROWS, COLS = 680, 1200


def build_cfg(jax):
    from mrhash_tpu.core.state import MapConfig
    sample_mode = "fused" if jax.default_backend() != "cpu" else "gather"
    return MapConfig(
        virtual_voxel_size=0.01, sdf_truncation=0.07,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=30.0, n_frames_invalidate_voxels=100,
        sdf_var_threshold=1.0,
        num_blocks=1 << 19, max_active_blocks=1 << 17, num_buckets=1 << 15,
        max_alloc_per_frame=1 << 13, sample_mode=sample_mode,
        alloc_tile=4)


def make_cam0(C):
    return C.make_camera(fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                         rows=ROWS, cols=COLS, min_depth=0.01, max_depth=30.0)


def frame_cam(C, cam0, i):
    import jax.numpy as jnp
    th = 0.02 * i
    rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    t = np.array([0.01 * i, 0.0, 0.0], np.float32)
    return C.with_pose(cam0, jnp.asarray(rot), jnp.asarray(t))


def save():
    import jax
    import jax.numpy as jnp
    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import synthetic_room_depth
    from mrhash_tpu.core import pipeline
    from mrhash_tpu.core.state import make_state
    from mrhash_tpu.ops import camera as C

    cfg = build_cfg(jax)
    cam0 = make_cam0(C)
    rng = np.random.default_rng(0)
    state = make_state(cfg.num_blocks, cfg.num_buckets or None)
    rgb = jnp.asarray(rng.integers(0, 255, (ROWS, COLS, 3)), jnp.uint8)
    depths = [synthetic_room_depth(ROWS, COLS, cam0, rng) for _ in range(4)]

    step = pipeline.jit_integrate_rgbd(cfg)
    for i in range(10):
        state, stats = step(state, frame_cam(C, cam0, i),
                            depths[i % 4], rgb)
    occ = int(stats["occupied_blocks"])
    print(f"# occupancy {occ}, low_free {int(stats['low_free'])}")
    t = state.table
    p = state.pool
    np.savez_compressed(
        SNAP, occ=occ,
        pos=np.asarray(t.pos), ptr=np.asarray(t.ptr), res=np.asarray(t.res),
        fp=np.asarray(t.fp), heap_high=np.asarray(t.heap_high),
        heap_low=np.asarray(t.heap_low), high_count=np.asarray(t.high_count),
        low_count=np.asarray(t.low_count),
        sdf=np.asarray(p.sdf), sumsq=np.asarray(p.sumsq),
        weight=np.asarray(p.weight), rgbp=np.asarray(p.rgbp),
        frame=np.asarray(state.frame),
        depth0=np.asarray(depths[0]), rgb=np.asarray(rgb))
    print(f"# saved {SNAP}")


def load():
    import jax.numpy as jnp
    from mrhash_tpu.core.state import MapState, VoxelPool
    from mrhash_tpu.ops import hashtable as H

    z = np.load(SNAP)
    table = H.HashTable(
        pos=jnp.asarray(z["pos"]), ptr=jnp.asarray(z["ptr"]),
        res=jnp.asarray(z["res"]), fp=jnp.asarray(z["fp"]),
        heap_high=jnp.asarray(z["heap_high"]),
        heap_low=jnp.asarray(z["heap_low"]),
        high_count=jnp.asarray(z["high_count"]),
        low_count=jnp.asarray(z["low_count"]),
        pck=jnp.zeros((H.PC_FACTOR * (1 << 19), 3), jnp.int32),
        num_buckets=1 << 15, num_blocks=1 << 19)
    table = H.rebuild_pcache(table)
    pool = VoxelPool(sdf=jnp.asarray(z["sdf"]), sumsq=jnp.asarray(z["sumsq"]),
                     weight=jnp.asarray(z["weight"]),
                     rgbp=jnp.asarray(z["rgbp"]))
    state = MapState(table=table, pool=pool, frame=jnp.asarray(z["frame"]))
    return state, int(z["occ"]), jnp.asarray(z["depth0"]), jnp.asarray(z["rgb"])


def run(which):
    import jax
    import jax.numpy as jnp
    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from mrhash_tpu.core import pipeline
    from mrhash_tpu.ops import camera as C
    from mrhash_tpu.ops import hashtable as H
    from mrhash_tpu.ops import integrate as I

    state, occ, depth_img, rgb = load()
    cfg = build_cfg(jax)
    bucket = max(-(-int(occ * 1.8) // 4096) * 4096, 4096)
    cfg = dataclasses.replace(cfg, max_active_blocks=bucket)
    print(f"# occupancy {occ}, bucket {bucket}", file=sys.stderr)
    cam0 = make_cam0(C)
    cam = frame_cam(C, cam0, 10)
    pc_depth = C.get_depth(cam, C.compute_cloud(cam, depth_img))
    table, pool, frame = state.table, state.pool, state.frame
    S = pool.sdf.shape[0]
    K = 5

    def _psum(p2):
        return (jnp.sum(p2.sdf[:1, :8]) + jnp.sum(p2.sumsq[:1, :8])
                + jnp.sum(p2.weight[:1, :8]).astype(jnp.float32)
                + jnp.sum(p2.rgbp[:1, :8]).astype(jnp.float32))

    def clock(name, fn, *args, n=K):
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0][:1].astype(jnp.float32)).block_until_ready()
              if leaves[0].ndim else leaves[0])
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:28s} {dt:8.2f} ms")
        return out

    cpct = jax.jit(functools.partial(I.compact_active, cfg))
    slots, count, bpos, bptr, bres, bvalid = cpct(table, cam)

    if "full" in which:
        # NON-donating jit: the clock re-dispatches the same state buffers
        stepb = jax.jit(functools.partial(pipeline.integrate_rgbd, cfg))
        s3, st = stepb(state, cam, depth_img, rgb)
        float(st["occupied_blocks"].block_until_ready())
        t0 = time.perf_counter()
        for _ in range(K):
            s3, st = stepb(state, cam, depth_img, rgb)
        float(st["occupied_blocks"].block_until_ready())
        print(f"{'full_frame[multires]':28s} "
              f"{(time.perf_counter()-t0)/K*1e3:8.2f} ms")

    if "resfull" in which:
        # multi-res resident row-slot cache: rebuild the state with a
        # resident pool, warm residency for 3 frames (steady churn ~0),
        # then clock the steady frame
        from mrhash_tpu.core.state import make_resident
        plain = max((-(-int(occ * 1.4) // 4096)) * 4096, 4096)
        plain = min(plain, bucket - 4096)
        rcfg = dataclasses.replace(cfg, resident_rows=cfg.max_active_blocks,
                                   resident_plain_rows=plain)
        print(f"# resident bucket {bucket}, plain {plain}", file=sys.stderr)
        # deep-copy: stepd donates its state arg; `state` must survive for
        # the other stages
        rstate = jax.tree.map(lambda x: x.copy(), state).replace(
            resident=make_resident(rcfg.num_blocks, rcfg.resident_rows))
        stepd = pipeline.jit_integrate_rgbd(rcfg)  # donating, like prod
        for j in range(3):
            rstate, st = stepd(rstate, frame_cam(C, cam0, 10 + j),
                               depth_img, rgb)
        print(f"# warm stats: res0_demand {int(st['res0_demand'])} "
              f"rows1_demand {int(st['rows1_demand'])} "
              f"unserved {int(st['unserved_blocks'])}", file=sys.stderr)
        t0 = time.perf_counter()
        for j in range(K):
            rstate, st = stepd(rstate, frame_cam(C, cam0, 13 + j),
                               depth_img, rgb)
        float(st["occupied_blocks"].block_until_ready())
        print(f"{'full_frame[multires-res]':28s} "
              f"{(time.perf_counter()-t0)/K*1e3:8.2f} ms")

    if "pack" in which:
        @jax.jit
        def f_pack(bptr):
            rw = I.pack_window_rows(cfg, bpos, bptr, bres, bvalid, S)
            return sum(jnp.sum(v[:1].astype(jnp.float32)) for v in
                       (rw["rrow"], rw["eslot"], rw["gvalid"].ravel()))
        clock("pack_window_rows", f_pack, bptr)

    if "alloc" in which:
        num_steps = cfg.dda_steps(float(cfg.max_integration_distance))

        @jax.jit
        def f_alloc(table, frame):
            keys, valid = I.alloc_candidates_depth(cfg, cam, pc_depth,
                                                   num_steps, frame=frame)
            t2 = I.alloc_blocks(cfg, table, keys, valid, frame)
            return t2.high_count
        clock("alloc", f_alloc, table, frame)

    if "compact" in which:
        @jax.jit
        def f_compact(table):
            s, c, bp, bt, br, bv = I.compact_active(cfg, table, cam)
            return c + jnp.sum(bt[:1])
        clock("compact_active", f_compact, table)

    if "coarsen" in which:
        @jax.jit
        def f_coarsen(table, pool):
            t2, p2, ns, nm, _ = I.coarsen_by_variance(
                cfg, table, pool, slots, bpos, bptr, bres, bvalid)
            return t2.high_count.astype(jnp.float32) + _psum(p2)
        clock("coarsen_by_variance", f_coarsen, table, pool)

    if "reintegrate" in which:
        rcfg = dataclasses.replace(cfg, sample_mode="pallas")
        u = cfg.max_coarsen_per_frame
        ns = jnp.zeros((u,), jnp.int32)
        nm = jnp.zeros((u,), bool).at[:64].set(True)

        @jax.jit
        def f_reint(table, pool, pc_depth, rgb):
            p2 = I.reintegrate_blocks(rcfg, table, pool, cam, pc_depth, rgb,
                                      ns, nm)
            return _psum(p2)
        clock(f"reintegrate[u={u}]", f_reint, table, pool, pc_depth, rgb)

    if "gc" in which:
        @jax.jit
        def f_gc(table, pool):
            t2, p2 = I.garbage_collect_sweep(cfg, table, pool, cam, slots,
                                             bpos, bptr, bres, bvalid)
            return t2.high_count.astype(jnp.float32) + _psum(p2)
        clock("gc_sweep[row-gather]", f_gc, table, pool)

        fl = (jnp.full((bptr.shape[0],), 99.0, jnp.float32),
              jnp.ones((bptr.shape[0],), jnp.int32))

        @jax.jit
        def f_gcf(table, pool):
            t2, p2 = I.garbage_collect_sweep(cfg, table, pool, cam, slots,
                                             bpos, bptr, bres, bvalid,
                                             kernel_flags=fl)
            return t2.high_count.astype(jnp.float32) + _psum(p2)
        clock("gc_sweep[kernel-flags]", f_gcf, table, pool)

    if "starve" in which:
        @jax.jit
        def f_starve(pool):
            p2 = I.starve_voxels(cfg, pool, cam, bpos, bptr, bres, bvalid)
            return _psum(p2)
        clock("starve", f_starve, pool)

    if "decide" in which:
        @jax.jit
        def f_dec(pool):
            d = I.coarsen_decide(cfg, pool, bptr, bres, bvalid)
            return jnp.sum(d.astype(jnp.int32))
        n_dec = clock("coarsen_decide[gather]", f_dec, pool)
        print(f"# decide count {int(n_dec)}", file=sys.stderr)

    if "packparts" in which:
        import mrhash_tpu.params as P
        A = bptr.shape[0]
        arange = jnp.arange(A, dtype=jnp.int32)

        @jax.jit
        def f_prow(bptr):
            prow = jnp.where(bvalid, bptr // 512, S)
            carve = jnp.where(bvalid, (bptr % 512) // P.TOTAL_LOW_BLOCK_SIZE,
                              0)
            return jnp.sum(prow[:1]) + jnp.sum(carve[:1])
        clock("  prow/carve", f_prow, bptr)

        prow = jnp.where(bvalid, bptr // 512, S)
        carve = jnp.where(bvalid, (bptr % 512) // P.TOTAL_LOW_BLOCK_SIZE, 0)
        is1 = bvalid & (bres == 1)

        @jax.jit
        def f_rowfirst(prow):
            row_first = jnp.full((S + 1,), A, jnp.int32).at[
                jnp.where(is1, prow, S)].min(arange)
            return jnp.sum(row_first[:1])
        clock("  row_first scatter-min", f_rowfirst, prow)

        row_first = jnp.full((S + 1,), A, jnp.int32).at[
            jnp.where(is1, prow, S)].min(arange)

        @jax.jit
        def f_leader(prow):
            leader = bvalid & ((bres == 0) | (row_first[prow] == arange))
            ridx, rok, _ = H.compact_indices(leader, A)
            return jnp.sum(ridx[:1]) + jnp.sum(rok[:1])
        clock("  leader+compact", f_leader, prow)

        leader = bvalid & ((bres == 0) | (row_first[prow] == arange))
        ridx, rok, _ = H.compact_indices(leader, A)
        ridx_c = jnp.where(rok, ridx, 0)
        rrow = jnp.where(rok, prow[ridx_c], S)

        @jax.jit
        def f_slotof(rrow):
            slot_of_row = jnp.full((S + 1,), -1, jnp.int32).at[rrow].set(
                arange)
            eslot = jnp.where(bvalid, slot_of_row[prow], -1)
            return jnp.sum(eslot[:1])
        clock("  slot_of_row+eslot", f_slotof, rrow)

        slot_of_row = jnp.full((S + 1,), -1, jnp.int32).at[rrow].set(arange)
        eslot = jnp.where(bvalid, slot_of_row[prow], -1)

        @jax.jit
        def f_gmeta(eslot):
            gdest = jnp.where(is1, eslot * 8 + carve, A * 8)
            gpos = jnp.zeros((A * 8, 3), jnp.int32).at[gdest].set(
                bpos, mode="drop").reshape(A, 8, 3)
            gvalid = jnp.zeros((A * 8,), jnp.int32).at[gdest].set(
                1, mode="drop").reshape(A, 8)
            return jnp.sum(gpos[:1].astype(jnp.float32)) + jnp.sum(gvalid[:1])
        clock("  gpos/gvalid scatter", f_gmeta, eslot)

    rw = I.pack_window_rows(cfg, bpos, bptr, bres, bvalid, S)
    from mrhash_tpu.ops import fused_integrate as FI
    cast = jax.lax.bitcast_convert_type
    hpad = -(-ROWS // 8) * 8 + FI.PATCH_H
    wpad = -(-COLS // 128) * 128 + FI.PATCH_W
    img_cf = jnp.zeros((2, hpad, wpad), jnp.float32).at[
        0, :ROWS, :COLS].set(pc_depth)
    cam_vec = FI.make_cam_vec(
        cam, cfg.virtual_voxel_size, cfg.sdf_truncation,
        cfg.sdf_truncation_scale, cfg.max_integration_distance,
        cfg.integration_weight_sample, cfg.integration_weight_max,
        hpad, wpad)
    A = bptr.shape[0]
    meta = jnp.zeros((A, 128), jnp.int32)
    meta = meta.at[:, :3].set(rw["rpos"])
    meta = meta.at[:, 3].set(rw["rvalid"].astype(jnp.int32))
    meta = meta.at[:, 4].set(jnp.where(rw["rvalid"], rw["rres"], 0))
    gmeta = jnp.concatenate(
        [rw["gpos"], rw["gvalid"][..., None]], axis=2).reshape(A, 32)
    meta = meta.at[:, 8:40].set(gmeta)
    rrow_c = jnp.where(rw["rvalid"], rw["rrow"], 0)
    n_pack = int(jnp.sum(rw["rvalid"] & (rw["rres"] == 1)))
    n_plain = int(jnp.sum(rw["rvalid"] & (rw["rres"] == 0)))
    print(f"# kernel slots: {n_plain} plain + {n_pack} packed "
          f"(window entries {int(jnp.sum(bvalid))})", file=sys.stderr)

    if "rowgather" in which:
        @jax.jit
        def f_rg(pool, rrow_c):
            return jnp.concatenate(
                [cast(pool.sdf[rrow_c], jnp.int32),
                 cast(pool.sumsq[rrow_c], jnp.int32),
                 pool.weight[rrow_c], pool.rgbp[rrow_c]], axis=1)[:1, :8]
        clock("row_gather[4xA]", f_rg, pool, rrow_c)

    pool_rows = jnp.concatenate(
        [cast(pool.sdf[rrow_c], jnp.int32),
         cast(pool.sumsq[rrow_c], jnp.int32),
         pool.weight[rrow_c], pool.rgbp[rrow_c]], axis=1)

    if "kernel" in which:
        @jax.jit
        def f_kern(pool_rows):
            out = FI.fused_integrate_pallas(img_cf, cam_vec, meta, pool_rows,
                                            multires=True)
            return jnp.sum(out[:1, :8])
        clock("kernel[packed-multires]", f_kern, pool_rows)

    out = FI.fused_integrate_pallas(img_cf, cam_vec, meta, pool_rows,
                                    multires=True)
    L = 512

    if "writeback" in which:
        @jax.jit
        def f_wb(pool, out):
            rows_w = jnp.where(rw["rvalid"], rw["rrow"], S)
            p2 = pool.replace(
                sdf=pool.sdf.at[rows_w].set(cast(out[:, 0:L], jnp.float32),
                                            mode="drop",
                                            unique_indices=True),
                sumsq=pool.sumsq.at[rows_w].set(
                    cast(out[:, L:2 * L], jnp.float32), mode="drop",
                    unique_indices=True),
                weight=pool.weight.at[rows_w].set(out[:, 2 * L:3 * L],
                                                  mode="drop",
                                                  unique_indices=True),
                rgbp=pool.rgbp.at[rows_w].set(out[:, 3 * L:4 * L],
                                              mode="drop",
                                              unique_indices=True))
            return _psum(p2)
        clock("writeback[row-set x4]", f_wb, pool, out)

    if "flagmap" in which:
        @jax.jit
        def f_fm(out):
            flags = out[:, 4 * L:4 * L + 32]
            eslot_c = jnp.where(bvalid, rw["eslot"], 0)
            ef = flags[eslot_c]
            is1e = bvalid & (bres == 1)
            crv = rw["ecarve"]

            def pick(lane_res0, lane_grp0):
                lanes = jnp.where(is1e, lane_grp0 + crv, lane_res0)
                return jnp.take_along_axis(ef, lanes[:, None], axis=1)[:, 0]

            return (jnp.sum(pick(0, 8)[:1])
                    + jnp.sum(pick(1, 16)[:1]) + jnp.sum(pick(2, 24)[:1])
                    + jnp.sum(pick(3, 3)[:1]) + jnp.sum(pick(4, 4)[:1]))
        clock("flag_map[per-entry]", f_fm, out)

    if "fused" in which:
        @jax.jit
        def f_fused(pool, pc_depth, rgb, frame):
            p2, aux = I.fused_integrate_depth(cfg, pool, cam, pc_depth, rgb,
                                              bpos, bptr, bres, bvalid,
                                              frame=frame)
            return _psum(p2)
        clock("fused[full-stage]", f_fused, pool, pc_depth, rgb, frame)


if __name__ == "__main__":
    if sys.argv[1:2] == ["save"]:
        save()
    else:
        run(set(sys.argv[2:]) or {"pack", "kernel", "fused"})
