"""Stage isolation for the ScanNet multi-res bench row (the 0.86x row of
BENCH_EXTRA.json round 2): replays bench_scannet(multires=True)'s exact
warmup once (`save`), snapshots the steady state (table + pool + resident
cache) to /tmp/scannet_mr_snap.npz, then times individual stages of the
resident multi-res frame (`run [stage ...]`) in seconds per invocation.

Usage:
  python tools/perf_scannet_mr.py save
  python tools/perf_scannet_mr.py run [full front adopt fused coarsen
                                       gc starve decidecount]
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SNAP = "/tmp/scannet_mr_snap.npz"
ROWS, COLS = 480, 640
ORBIT = 40


def build_cfg(jax):
    from mrhash_tpu.core.state import MapConfig
    sample_mode = "fused" if jax.default_backend() != "cpu" else "gather"
    return MapConfig(
        virtual_voxel_size=0.01, sdf_truncation=0.07,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=30.0, n_frames_invalidate_voxels=100,
        sdf_var_threshold=1.0,
        num_blocks=1 << 19, max_active_blocks=1 << 17, num_buckets=1 << 15,
        dedup_scratch_factor=8,
        max_alloc_per_frame=1 << 13, sample_mode=sample_mode,
        alloc_tile=4, max_coarsen_per_frame=1 << 9,
        max_gc_free_per_frame=1 << 9)


def make_cam0(C):
    return C.make_camera(fx=577.590698, fy=578.729797, cx=318.905426,
                         cy=242.683609, rows=ROWS, cols=COLS,
                         min_depth=0.01, max_depth=30.0)


def frame_cam(C, cam0, i):
    import jax.numpy as jnp
    th = 2.0 * np.pi * (i % ORBIT) / ORBIT
    rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    t = np.array([0.05 * np.sin(th), 0.02 * np.cos(th), 0.0], np.float32)
    return C.with_pose(cam0, jnp.asarray(rot), jnp.asarray(t))


def run_cfg_for(jax, occ_max, res0_max):
    cfg = build_cfg(jax)
    bucket = max(-(-int(occ_max * 1.15) // 2048) * 2048, 2048)
    bucket = min(bucket, cfg.max_active_blocks)
    plain = max(-(-int(res0_max * 1.3) // 2048) * 2048, 2048)
    grow = plain + 2048 - bucket
    if grow > 0:
        bucket = min(bucket + -(-grow // 2048) * 2048, cfg.max_active_blocks)
    plain = min(plain, bucket - 2048)
    return dataclasses.replace(cfg, max_active_blocks=bucket,
                               resident_rows=bucket,
                               resident_plain_rows=plain,
                               resident_churn=1 << 10)


def save():
    import jax
    import jax.numpy as jnp
    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import synthetic_room_depth
    from mrhash_tpu.core import pipeline
    from mrhash_tpu.core.state import make_resident, make_state
    from mrhash_tpu.ops import camera as C

    cfg = build_cfg(jax)
    cam0 = make_cam0(C)
    rng = np.random.default_rng(0)
    state = make_state(cfg.num_blocks, cfg.num_buckets or None)
    rgb = jnp.asarray(rng.integers(0, 255, (ROWS, COLS, 3)), jnp.uint8)
    depths = [synthetic_room_depth(ROWS, COLS, frame_cam(C, cam0, i), rng)
              for i in range(ORBIT)]

    import time as _t
    t0 = _t.time()
    step = pipeline.jit_integrate_rgbd(cfg)
    occ_max = res0_max = 0
    for i in range(ORBIT):
        state, stats = step(state, frame_cam(C, cam0, i),
                            depths[i % ORBIT], rgb)
        occ_max = max(occ_max, int(stats["occupied_blocks"]))
        res0_max = max(res0_max, int(stats.get("res0_blocks", 0)))
        if i % 10 == 0:
            print(f"# orbit1 frame {i} @ {_t.time()-t0:.0f}s", flush=True)
    cfg_run = run_cfg_for(jax, occ_max, res0_max)
    state = state.replace(resident=make_resident(
        cfg.num_blocks, cfg_run.max_active_blocks))
    step = pipeline.jit_integrate_rgbd(cfg_run)
    for i in range(ORBIT, 2 * ORBIT):
        state, stats = step(state, frame_cam(C, cam0, i),
                            depths[i % ORBIT], rgb)
        if i % 10 == 0:
            print(f"# orbit2 frame {i} @ {_t.time()-t0:.0f}s", flush=True)
    jax.block_until_ready(stats["occupied_blocks"])
    print(f"# warmup done @ {_t.time()-t0:.0f}s", flush=True)
    t, p, r = state.table, state.pool, state.resident
    # the big pool is 4x 1 GB; fetch only the occupied rows through the
    # 40 MB/s tunnel and rebuild zeros on load
    ptr_h = np.asarray(t.ptr)
    occ_rows = np.unique(ptr_h[ptr_h >= 0] // 512).astype(np.int32)
    rows_d = jnp.asarray(occ_rows)
    np.savez_compressed(
        SNAP, occ_max=occ_max, res0_max=res0_max,
        pos=np.asarray(t.pos), ptr=ptr_h, res=np.asarray(t.res),
        fp=np.asarray(t.fp), heap_high=np.asarray(t.heap_high),
        heap_low=np.asarray(t.heap_low), high_count=np.asarray(t.high_count),
        low_count=np.asarray(t.low_count),
        occ_rows=occ_rows,
        sdf=np.asarray(p.sdf[rows_d]), sumsq=np.asarray(p.sumsq[rows_d]),
        weight=np.asarray(p.weight[rows_d]), rgbp=np.asarray(p.rgbp[rows_d]),
        r_sdf=np.asarray(r.pool.sdf), r_sumsq=np.asarray(r.pool.sumsq),
        r_weight=np.asarray(r.pool.weight), r_rgbp=np.asarray(r.pool.rgbp),
        r_backing=np.asarray(r.backing), r_res_index=np.asarray(r.res_index),
        frame=np.asarray(state.frame),
        depths=np.stack([np.asarray(d) for d in depths]),
        rgb=np.asarray(rgb))
    print(f"# saved {SNAP}: occ_max {occ_max} res0_max {res0_max} "
          f"frame {int(state.frame)}")


def load(jax):
    import jax.numpy as jnp
    from mrhash_tpu.core.state import (MapState, ResidentPool, VoxelPool)
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
    n_rows = 1 << 19

    def dense(key, dtype):
        out = np.zeros((n_rows, 512), dtype)
        out[z["occ_rows"]] = z[key]
        return jnp.asarray(out)

    pool = VoxelPool(sdf=dense("sdf", np.float32),
                     sumsq=dense("sumsq", np.float32),
                     weight=dense("weight", np.int32),
                     rgbp=dense("rgbp", np.int32))
    rpool = VoxelPool(sdf=jnp.asarray(z["r_sdf"]),
                      sumsq=jnp.asarray(z["r_sumsq"]),
                      weight=jnp.asarray(z["r_weight"]),
                      rgbp=jnp.asarray(z["r_rgbp"]))
    resident = ResidentPool(pool=rpool, backing=jnp.asarray(z["r_backing"]),
                            res_index=jnp.asarray(z["r_res_index"]))
    state = MapState(table=table, pool=pool, frame=jnp.asarray(z["frame"]),
                     resident=resident)
    cfg_run = run_cfg_for(jax, int(z["occ_max"]), int(z["res0_max"]))
    depths = [jnp.asarray(d) for d in z["depths"]]
    return state, cfg_run, depths, jnp.asarray(z["rgb"])


def run(which):
    import jax
    import jax.numpy as jnp
    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from mrhash_tpu.core import pipeline
    from mrhash_tpu.core import resident as RES
    from mrhash_tpu.ops import camera as C
    from mrhash_tpu.ops import integrate as I

    state, cfg, depths, rgb = load(jax)
    cam0 = make_cam0(C)
    print(f"# bucket {cfg.max_active_blocks}, plain "
          f"{cfg.resident_plain_rows}, frame {int(state.frame)}",
          file=sys.stderr)
    fidx = int(state.frame)
    cam = frame_cam(C, cam0, fidx)
    depth_img = depths[fidx % ORBIT]
    K = 10

    def clock(name, fn, *args, n=K):
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        jax.block_until_ready(leaves[0])
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:32s} {dt:8.2f} ms")
        return out

    if "full" in which:
        stepb = jax.jit(functools.partial(pipeline.integrate_rgbd, cfg))

        def f_full(state):
            s2, st = stepb(state, cam, depth_img, rgb)
            return st["occupied_blocks"]
        clock("full_frame", f_full, state)

    if "variants" in which:
        # DONATED state-threading like the bench: marginal stage costs =
        # full minus variant-with-stage-skipped (fusion-honest; the
        # non-donated isolated stages above double-count 4 GB pool copies)
        import mrhash_tpu.core.pipeline as PL

        def run_variant(name, fn_cfg_state):
            fn, vstate = fn_cfg_state
            for j in range(3):
                vstate, st = fn(vstate, frame_cam(C, cam0, fidx + j),
                                depths[(fidx + j) % ORBIT], rgb)
            float(st["occupied_blocks"])
            n = 10
            t0 = time.perf_counter()
            for j in range(n):
                vstate, st = fn(vstate, frame_cam(C, cam0, fidx + 3 + j),
                                depths[(fidx + 3 + j) % ORBIT], rgb)
            float(st["occupied_blocks"])
            dt = (time.perf_counter() - t0) / n * 1e3
            print(f"{name:32s} {dt:8.2f} ms")

        def fresh_state():
            s, cfg2, d, r = load(jax)
            return s

        orig_cbv = I.coarsen_by_variance
        orig_gc = I.garbage_collect_sweep
        orig_alloc = I.alloc_blocks

        run_variant("vfull[donated]",
                    (pipeline.jit_integrate_rgbd(cfg), fresh_state()))

        # no-coarsen: decide forced False via a wrapper pipeline fn
        def no_decide_fid(cfg_, cam_, out, emap, bres_, bvalid_, uu):
            uns_b, aux = orig_fd(cfg_, cam_, out, emap, bres_, bvalid_, uu)
            aux["coarsen_decide"] = jnp.zeros_like(aux["coarsen_decide"])
            return uns_b, aux
        orig_fd = I._window_flag_decisions
        I._window_flag_decisions = no_decide_fid
        run_variant("vno_coarsen",
                    (jax.jit(functools.partial(PL.integrate_rgbd, cfg),
                             donate_argnums=(0,)), fresh_state()))
        I._window_flag_decisions = orig_fd

        # no-gc
        def no_gc(cfg_, table_, pool_, cam_, *a, **kw):
            rp_ = kw.get("resident_rp")
            if rp_ is not None:
                return table_, pool_, rp_
            return table_, pool_
        I.garbage_collect_sweep = no_gc
        run_variant("vno_gc",
                    (jax.jit(functools.partial(PL.integrate_rgbd, cfg),
                             donate_argnums=(0,)), fresh_state()))
        I.garbage_collect_sweep = orig_gc

        # no-alloc (window frozen to prior occupancy)
        I.alloc_blocks = lambda cfg_, table_, keys_, valid_, frame_: table_
        run_variant("vno_alloc",
                    (jax.jit(functools.partial(PL.integrate_rgbd, cfg),
                             donate_argnums=(0,)), fresh_state()))
        I.alloc_blocks = orig_alloc

        # minimal element fallback
        cfg_fb = dataclasses.replace(cfg, sample_fallback=512)
        run_variant("vfb512",
                    (jax.jit(functools.partial(PL.integrate_rgbd, cfg_fb),
                             donate_argnums=(0,)), fresh_state()))

    pc = C.compute_cloud(cam, depth_img)
    pc_depth = C.get_depth(cam, pc)
    num_steps = cfg.dda_steps(float(cfg.max_integration_distance))

    if "front" in which:
        @jax.jit
        def f_front(table, frame, depth_img):
            pc = C.compute_cloud(cam, depth_img)
            pcd = C.get_depth(cam, pc)
            keys, valid = I.alloc_candidates_depth(cfg, cam, pcd, num_steps,
                                                   frame=frame)
            t2 = I.alloc_blocks(cfg, table, keys, valid, frame)
            s, c, bp, bt, br, bv = I.compact_active(cfg, t2, cam)
            return c
        clock("front[cloud+alloc+compact]", f_front, state.table,
              state.frame, depth_img)

    cpct = jax.jit(functools.partial(I.compact_active, cfg))
    slots, count, bpos, bptr, bres, bvalid = cpct(state.table, cam)
    print(f"# window count {int(count)}", file=sys.stderr)

    if "adopt" in which:
        @jax.jit
        def f_adopt(rp, pool):
            rp2, pool2, rm = RES.adopt_window_rows(cfg, rp, pool, bpos,
                                                   bptr, bres, bvalid)
            return rm["p_demand"] + rm["q_demand"]
        clock("adopt_window_rows", f_adopt, state.resident, state.pool)

    rp, pool, rm = jax.jit(functools.partial(
        RES.adopt_window_rows, cfg))(state.resident, state.pool, bpos,
                                     bptr, bres, bvalid)

    if "fused" in which:
        @jax.jit
        def f_fused(rpool, depth_img, frame):
            pc = C.compute_cloud(cam, depth_img)
            pcd = C.get_depth(cam, pc)
            rpool2, iaux = I.fused_integrate_depth(
                cfg, rpool, cam, pcd, rgb, bpos, bptr, bres, bvalid,
                frame=frame, resident_meta=rm)
            return (jnp.sum(rpool2.sdf[:1, :8])
                    + iaux["unserved_blocks"].astype(jnp.float32))
        clock("fused[resident_meta]", f_fused, rp.pool, depth_img,
              state.frame)

    rpool2, iaux = jax.jit(functools.partial(
        I.fused_integrate_depth, cfg,
        resident_meta=rm))(rp.pool, cam, pc_depth, rgb, bpos, bptr, bres,
                           bvalid, frame=state.frame)
    decide = iaux["coarsen_decide"]

    if "decidecount" in which:
        print(f"# coarsen decide count {int(jnp.sum(decide))}, "
              f"gc decision count {int(jnp.sum(iaux['gc_decision']))}",
              file=sys.stderr)

    if "coarsen" in which:
        rcfg = dataclasses.replace(cfg, sample_mode="pallas")
        slotted = rm["eslot"] >= 0

        @jax.jit
        def f_coarsen(table, pool, rp, depth_img):
            pc = C.compute_cloud(cam, depth_img)
            pcd = C.get_depth(cam, pc)
            t, p, new_slots, new_mask, freed = I.coarsen_by_variance(
                cfg, table, pool, slots, bpos, bptr, bres, bvalid,
                decide=decide)
            rp2 = RES.release_rows(rp, bptr // 512, rm["eslot"],
                                   freed & slotted)
            safe = jnp.where(new_mask, new_slots, 0)
            rp2, p = RES.flush_release_rows(rp2, p, t.ptr[safe] // 512,
                                            new_mask)
            p = I.reintegrate_blocks(rcfg, t, p, cam, pcd, rgb,
                                     new_slots, new_mask)
            return t.high_count + jnp.sum(p.weight[:1, :8])
        clock("coarsen_chain[forced-on]", f_coarsen, state.table, pool, rp,
              depth_img)

    if "coarsenparts" in which:
        rcfg = dataclasses.replace(cfg, sample_mode="pallas")
        slotted = rm["eslot"] >= 0

        @jax.jit
        def f_cbv(table, pool):
            t, p, new_slots, new_mask, freed = I.coarsen_by_variance(
                cfg, table, pool, slots, bpos, bptr, bres, bvalid,
                decide=decide)
            return t.high_count + jnp.sum(p.weight[:1, :8]) + jnp.sum(
                new_slots[:1])
        clock("  coarsen_by_variance", f_cbv, state.table, pool)

        tbl2, pool2, new_slots, new_mask, freed = jax.jit(
            functools.partial(I.coarsen_by_variance, cfg))(
            state.table, pool, slots, bpos, bptr, bres, bvalid,
            decide=decide)

        @jax.jit
        def f_flush(rp, pool):
            rp2 = RES.release_rows(rp, bptr // 512, rm["eslot"],
                                   freed & slotted)
            safe = jnp.where(new_mask, new_slots, 0)
            rp2, p = RES.flush_release_rows(rp2, pool,
                                            tbl2.ptr[safe] // 512, new_mask)
            return jnp.sum(p.weight[:1, :8]) + rp2.backing[0]
        clock("  release+flush", f_flush, rp, pool2)

        @jax.jit
        def f_reint(pool, depth_img):
            pc = C.compute_cloud(cam, depth_img)
            pcd = C.get_depth(cam, pc)
            p = I.reintegrate_blocks(rcfg, tbl2, pool, cam, pcd, rgb,
                                     new_slots, new_mask)
            return jnp.sum(p.weight[:1, :8])
        clock("  reintegrate[u]", f_reint, pool2, depth_img)

    if "frontparts" in which:
        @jax.jit
        def f_cand(depth_img, frame):
            pc = C.compute_cloud(cam, depth_img)
            pcd = C.get_depth(cam, pc)
            keys, valid = I.alloc_candidates_depth(cfg, cam, pcd, num_steps,
                                                   frame=frame)
            return jnp.sum(keys[:1]) + jnp.sum(valid[:1])
        clock("  alloc_candidates", f_cand, depth_img, state.frame)

        keys, valid = jax.jit(functools.partial(
            I.alloc_candidates_depth, cfg, cam,
            num_steps=num_steps))(pc_depth, frame=state.frame)

        @jax.jit
        def f_ab(table, frame):
            t2 = I.alloc_blocks(cfg, table, keys, valid, frame)
            return t2.high_count
        clock("  alloc_blocks", f_ab, state.table, state.frame)

        @jax.jit
        def f_cp(table):
            s, c, bp, bt, br, bv = I.compact_active(cfg, table, cam)
            return c + jnp.sum(bt[:1])
        clock("  compact_active", f_cp, state.table)

    if "gc" in which:
        @jax.jit
        def f_gc(table, pool, rp):
            t2, p2, rp2 = I.garbage_collect_sweep(
                cfg, table, pool, cam, slots, bpos, bptr, bres, bvalid,
                kernel_decision=iaux["gc_decision"], resident_rp=rp)
            return t2.high_count + jnp.sum(p2.weight[:1, :8])
        clock("gc_sweep", f_gc, state.table, pool, rp)

    if "starveparts" in which:
        import jax.numpy as jnp2
        from mrhash_tpu import params as PP
        from mrhash_tpu.ops import coords as X

        vvs = cfg.virtual_voxel_size
        prow, lane0 = I._block_rows(bptr, bvalid)

        @jax.jit
        def f_proj(depth_img):
            pi, lane_valid = I._block_voxel_grid(bpos, bres, lane0)
            pf = X.virtual_voxel_pos_to_world(vvs, pi)
            pcam = C.world_to_cam(cam, pf)
            row, col, ok = C.project_point(cam, pcam)
            dd = C.get_depth(cam, pcam)
            ok = ok & (dd >= cam.min_depth) & bvalid[:, None] & lane_valid
            return row, col, ok, dd
        clock("  starve_proj", f_proj, depth_img)
        row, col, ok, dd = jax.jit(f_proj)(depth_img)
        HW = cam.rows * cam.cols
        FAR = jnp2.float32(1e30)
        pix = jnp2.where(ok, row * cam.cols + col, HW).reshape(-1)
        dflat = jnp2.where(ok, dd, FAR).reshape(-1)

        @jax.jit
        def f_zbuf(pix, dflat):
            return jnp2.full((HW,), FAR, jnp2.float32).at[pix].min(
                dflat, mode="drop")
        clock("  starve_zbuf_scattermin", f_zbuf, pix, dflat)

        @jax.jit
        def f_zbuf_i32(pix, dflat):
            di = (dflat * 2048.0).astype(jnp2.int32)
            return jnp2.full((HW,), jnp2.iinfo(jnp2.int32).max,
                             jnp2.int32).at[pix].min(di, mode="drop")
        clock("  starve_zbuf_scattermin_i32", f_zbuf_i32, pix, dflat)

        zbuf = jax.jit(f_zbuf)(pix, dflat)

        @jax.jit
        def f_gatherback(zbuf, pix, dflat):
            zs = zbuf[jnp2.where(pix < HW, pix, 0)]
            return jnp2.sum((dflat == zs).astype(jnp2.int32))
        clock("  starve_winner_gather", f_gatherback, zbuf, pix, dflat)

        @jax.jit
        def f_winner_sampler(zbuf, depth_img):
            import dataclasses as dc
            scfg = dc.replace(cfg, sample_mode="pallas")
            zimg = zbuf.reshape(cam.rows, cam.cols)
            block_center = X.virtual_voxel_pos_to_world(
                vvs, X.sdf_block_to_virtual_voxel_pos(bpos)) + 3.5 * vvs
            cr, cc, _ = C.project_point_approx(
                cam, C.world_to_cam(cam, block_center))
            center_rc = jnp2.stack([cr, cc], axis=-1)
            zeros_rgb = jnp2.zeros((cam.rows, cam.cols, 3), jnp2.uint8)
            zsamp, _ = I._sample_depth_rgb(scfg, zimg, zeros_rgb, row, col,
                                           ok, center_rc)
            return jnp2.sum((dd == zsamp).astype(jnp2.int32))
        clock("  starve_winner_sampler", f_winner_sampler, zbuf, depth_img)

        starved = jax.jit(functools.partial(
            I.starve_mask, cfg, cam))(bpos, bptr, bres, bvalid)

        @jax.jit
        def f_apply(pool, starved):
            return I.apply_starve(cfg, pool, bptr, bres, bvalid, starved)
        clock("  starve_apply", f_apply, pool, starved)

    if "starve" in which:
        n_big = cfg.num_blocks
        prow_e = jnp.where(bvalid, bptr // 512, n_big)
        eslot_now = rp.res_index[prow_e]
        svalid_res = bvalid & (eslot_now >= 0)
        rptr_now = jnp.maximum(eslot_now, 0) * 512 + rm["ecarve"] * 64
        rem = bvalid & (eslot_now < 0)

        @jax.jit
        def f_starve(pool, rpool):
            starved = I.starve_mask(cfg, cam, bpos, bptr, bres, bvalid)
            rpool = I.apply_starve(cfg, rpool, rptr_now, bres, svalid_res,
                                   starved)
            pool = I.apply_starve(cfg, pool, bptr, bres, rem, starved)
            return jnp.sum(pool.weight[:1, :8]) + jnp.sum(
                rpool.weight[:1, :8])
        clock("starve_event", f_starve, pool, rp.pool)


if __name__ == "__main__":
    if sys.argv[1:2] == ["save"]:
        save()
    else:
        run(set(sys.argv[2:]) or {"full", "front", "adopt", "fused",
                                  "coarsen", "gc", "starve", "decidecount"})
