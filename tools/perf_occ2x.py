"""Stage isolation for the occupancy-sweep bench row (BENCH_EXTRA's
tsdf_integration_fps_replica_like_occ2x): replays bench_occsweep's exact
warmup once (`save`, 9 m box room -> ~2x the headline window), snapshots
the steady state to /tmp/occ2x_snap.npz, then times individual stages of
the single-res resident frame (`run [stage ...]`).

Usage:
  python tools/perf_occ2x.py save
  python tools/perf_occ2x.py run [full variants front frontparts adopt
                                  fused gc]
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SNAP = "/tmp/occ2x_snap.npz"
ROWS, COLS = 680, 1200
ORBIT = 40
HALF = 4.5


def build_cfg(jax):
    from mrhash_tpu.core.state import MapConfig
    sample_mode = "fused" if jax.default_backend() != "cpu" else "gather"
    return MapConfig(
        virtual_voxel_size=0.01, sdf_truncation=0.07,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=30.0, n_frames_invalidate_voxels=100,
        num_blocks=1 << 19, max_active_blocks=1 << 17, num_buckets=1 << 15,
        max_alloc_per_frame=1 << 13, sample_mode=sample_mode, alloc_tile=4,
        starve_bands=8,
        resident_rows=(1 << 17) if sample_mode == "fused" else 0)


def make_cam0(C):
    return C.make_camera(fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                         rows=ROWS, cols=COLS, min_depth=0.01,
                         max_depth=30.0)


def frame_cam(C, cam0, i):
    import jax.numpy as jnp
    th = 2.0 * np.pi * (i % ORBIT) / ORBIT
    rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    t = np.array([0.05 * np.sin(th), 0.02 * np.cos(th), 0.0], np.float32)
    return C.with_pose(cam0, jnp.asarray(rot), jnp.asarray(t))


def run_cfg_for(jax, occ_max, occ_total=None):
    """occ_max: max IN-FRUSTUM count (sizes the window bucket).
    occ_total: max TOTAL occupancy (sizes the two-stage occupied bucket —
    the truncation shells of every wall stay occupied outside the frustum,
    ~2.6x the in-frustum count on the occ2x room, so sizing B from occ_max
    silently halves the window: the round-4 overflow hazard, measured)."""
    cfg = build_cfg(jax)
    bucket = max(-(-int(occ_max * 1.2) // 4096) * 4096, 4096)
    bucket = min(bucket, cfg.max_active_blocks)
    from mrhash_tpu import params as MP
    occ_t = int(occ_total) if occ_total else 0
    ob = min(max(-(-int(max(occ_t, occ_max) * 1.25) // 4096) * 4096, bucket),
             (cfg.num_buckets or cfg.num_blocks) * MP.HASH_BUCKET_SIZE)
    return dataclasses.replace(
        cfg, max_active_blocks=bucket, occupied_bucket=ob,
        resident_rows=bucket if cfg.resident_rows else 0)


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
    state = make_state(cfg.num_blocks, cfg.num_buckets or None,
                       cfg.resident_rows)
    rgb = jnp.asarray(rng.integers(0, 255, (ROWS, COLS, 3)), jnp.uint8)
    depths = [synthetic_room_depth(ROWS, COLS, frame_cam(C, cam0, i), rng,
                                   half=HALF)
              for i in range(ORBIT)]

    t0 = time.time()
    step = pipeline.jit_integrate_rgbd(cfg)
    occ_max = occ_total = 0
    for i in range(ORBIT):
        state, stats = step(state, frame_cam(C, cam0, i),
                            depths[i % ORBIT], rgb)
        occ_max = max(occ_max, int(stats["occupied_blocks"]))
        occ_total = max(occ_total, int(stats["occupied_total"]))
        if i % 10 == 0:
            print(f"# orbit1 frame {i} @ {time.time()-t0:.0f}s", flush=True)
    cfg_run = run_cfg_for(jax, occ_max, occ_total)
    if cfg.resident_rows:
        state = state.replace(resident=make_resident(
            cfg.num_blocks, cfg_run.max_active_blocks))
    step = pipeline.jit_integrate_rgbd(cfg_run)
    for i in range(ORBIT, 2 * ORBIT):
        state, stats = step(state, frame_cam(C, cam0, i),
                            depths[i % ORBIT], rgb)
        if i % 10 == 0:
            print(f"# orbit2 frame {i} @ {time.time()-t0:.0f}s", flush=True)
    jax.block_until_ready(stats["occupied_blocks"])
    print(f"# warmup done @ {time.time()-t0:.0f}s", flush=True)
    t, p, r = state.table, state.pool, state.resident
    ptr_h = np.asarray(t.ptr)
    occ_rows = np.unique(ptr_h[ptr_h >= 0] // 512).astype(np.int32)
    rows_d = jnp.asarray(occ_rows)
    np.savez_compressed(
        SNAP, occ_max=occ_max, occ_total=occ_total,
        pos=np.asarray(t.pos), ptr=ptr_h, res=np.asarray(t.res),
        fp=np.asarray(t.fp), heap_high=np.asarray(t.heap_high),
        heap_low=np.asarray(t.heap_low),
        high_count=np.asarray(t.high_count),
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
    print(f"# saved {SNAP}: occ_max {occ_max} frame {int(state.frame)}")


def load(jax):
    import jax.numpy as jnp
    from mrhash_tpu.core.state import MapState, ResidentPool, VoxelPool
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
    cfg_run = run_cfg_for(jax, int(z["occ_max"]),
                          int(z["occ_total"]) if "occ_total" in z else None)
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
    print(f"# bucket {cfg.max_active_blocks}, frame {int(state.frame)}",
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
        clock("full_frame[non-donated]", f_full, state)

    if "variants" in which:
        import mrhash_tpu.core.pipeline as PL

        def run_variant(name, fn, vstate):
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
            s, _, _, _ = load(jax)
            return s

        orig_gc = I.garbage_collect_sweep
        orig_alloc = I.alloc_blocks
        orig_compact = I.compact_active

        run_variant("vfull[donated]", pipeline.jit_integrate_rgbd(cfg),
                    fresh_state())

        def no_gc(cfg_, table_, pool_, cam_, *a, **kw):
            rp_ = kw.get("resident_rp")
            if rp_ is not None:
                return table_, pool_, rp_
            return table_, pool_
        I.garbage_collect_sweep = no_gc
        run_variant("vno_gc",
                    jax.jit(functools.partial(PL.integrate_rgbd, cfg),
                            donate_argnums=(0,)), fresh_state())
        I.garbage_collect_sweep = orig_gc

        I.alloc_blocks = lambda cfg_, table_, keys_, valid_, frame_: table_
        run_variant("vno_alloc",
                    jax.jit(functools.partial(PL.integrate_rgbd, cfg),
                            donate_argnums=(0,)), fresh_state())
        I.alloc_blocks = orig_alloc

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

    if "adopt" in which:
        @jax.jit
        def f_adopt(rp, pool):
            rp2, pool2, win = RES.adopt_window(cfg, rp, pool, slots, bpos,
                                               bptr, bres, bvalid)
            return win[2][:1]
        clock("adopt_window", f_adopt, state.resident, state.pool)

    rp, pool, (slots2, bpos2, bptr2, bres2, bvalid2) = jax.jit(
        functools.partial(RES.adopt_window, cfg))(
        state.resident, state.pool, slots, bpos, bptr, bres, bvalid)

    if "fused" in which:
        @jax.jit
        def f_fused(rpool, depth_img, frame):
            pc = C.compute_cloud(cam, depth_img)
            pcd = C.get_depth(cam, pc)
            rpool2, iaux = I.fused_integrate_depth(
                cfg, rpool, cam, pcd, rgb, bpos2, bptr2, bres2, bvalid2,
                frame=frame, resident=True)
            return (jnp.sum(rpool2.sdf[:1, :8])
                    + iaux["unserved_blocks"].astype(jnp.float32))
        clock("fused[resident]", f_fused, rp.pool, depth_img, state.frame)

    rpool2, iaux = jax.jit(functools.partial(
        I.fused_integrate_depth, cfg, resident=True))(
        rp.pool, cam, pc_depth, rgb, bpos2, bptr2, bres2, bvalid2,
        frame=state.frame)

    if "gc" in which:
        rp2 = rp.replace(pool=rpool2)

        @jax.jit
        def f_gc(table, pool, rp_):
            t2, p2, rp3 = I.garbage_collect_sweep(
                cfg, table, pool, cam, slots2, bpos2, bptr2, bres2, bvalid2,
                kernel_flags=(iaux["gc_min_s"], iaux["gc_max_w"]),
                resident_rp=rp_)
            return t2.high_count + jnp.sum(p2.weight[:1, :8])
        clock("gc_sweep", f_gc, state.table, pool, rp2)


if __name__ == "__main__":
    if sys.argv[1:2] == ["save"]:
        save()
    else:
        run(set(sys.argv[2:]) or {"full", "variants", "front", "frontparts",
                                  "adopt", "fused", "gc"})
