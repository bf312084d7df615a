"""Stage-by-stage timing of the LiDAR (integrate_points) frame on the real
device at the Newer-College-like bench settings.

Usage: python tools/perf_lidar.py [stage ...]
Stages: full alloc insert compact integrate dda lookup scatter gc
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses
    import functools

    from bench_extra import synthetic_lidar_cloud
    sys.path.insert(0, ".")
    from mrhash_tpu.core import pipeline
    from mrhash_tpu.core.state import MapConfig, make_state
    from mrhash_tpu.ops import camera as C
    from mrhash_tpu.ops import hashtable as H
    from mrhash_tpu.ops import integrate as I

    which = set(sys.argv[1:]) or {"full", "alloc", "insert", "compact",
                                  "integrate", "dda", "lookup", "scatter",
                                  "gc"}

    n_el, n_az = 64, 1024
    n_pts = n_el * n_az
    cfg = MapConfig(
        virtual_voxel_size=0.20, sdf_truncation=0.40,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=100.0, n_frames_invalidate_voxels=0,
        num_blocks=1 << 18, max_active_blocks=1 << 17,
        num_buckets=1 << 16, max_alloc_per_frame=1 << 13)
    cam = C.make_camera(fx=n_az / (2 * np.pi), fy=n_el / 0.65,
                        cx=n_az / 2.0, cy=n_el / 2.0, rows=n_el, cols=n_az,
                        min_depth=0.2, max_depth=100.0, model=C.SPHERICAL)
    rng = np.random.default_rng(1)
    state = make_state(cfg.num_blocks, cfg.num_buckets or None)
    normals = jnp.zeros((n_pts, 3), jnp.float32)
    weights = jnp.ones((n_pts,), jnp.float32)
    valid = jnp.ones((n_pts,), bool)

    step = pipeline.jit_integrate_points(cfg)
    occ_max = 0
    for i in range(8):
        t = np.array([0.5 * i, 0.0, 0.0], np.float32)
        pcam = C.with_pose(cam, jnp.eye(3, dtype=np.float32), jnp.asarray(t))
        pts = jnp.asarray(synthetic_lidar_cloud(n_el, n_az, t, rng))
        state, stats = step(state, pcam, pts, normals, weights, valid)
    occ = int(stats["occupied_blocks"])
    bucket = max(-(-int(occ * 1.8) // 4096) * 4096, 4096)
    cfg = dataclasses.replace(cfg, max_active_blocks=bucket)
    print(f"# occupancy {occ}, bucket {bucket}", file=sys.stderr)

    t = np.array([0.5 * 8, 0.0, 0.0], np.float32)
    pcam = C.with_pose(cam, jnp.eye(3, dtype=np.float32), jnp.asarray(t))
    points = jnp.asarray(synthetic_lidar_cloud(n_el, n_az, t, rng))
    num_steps = cfg.dda_steps(float(cfg.max_integration_distance))
    num_voxel_steps = cfg.dda_voxel_steps(float(cfg.max_integration_distance))
    table = state.table
    pool = state.pool
    frame = state.frame

    K = 10

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

    if "full" in which:
        stepb = jax.jit(functools.partial(pipeline.integrate_points, cfg))
        s3, st = stepb(state, pcam, points, normals, weights, valid)
        float(st["occupied_blocks"].block_until_ready())
        t0 = time.perf_counter()
        for _ in range(K):
            s3, st = stepb(state, pcam, points, normals, weights, valid)
        float(st["occupied_blocks"].block_until_ready())
        print(f"{'full_frame[lidar]':28s} "
              f"{(time.perf_counter()-t0)/K*1e3:8.2f} ms")

    if "alloc" in which:
        @jax.jit
        def f_alloc(points):
            keys, kvalid = I.alloc_candidates_points(cfg, pcam, points,
                                                     normals, valid,
                                                     num_steps)
            return jnp.sum(jnp.where(kvalid, keys[:, 0], 0))
        clock("alloc_candidates", f_alloc, points)

    keys, kvalid = jax.jit(functools.partial(
        I.alloc_candidates_points, cfg, pcam,
        num_steps=num_steps))(points, normals, valid)

    if "insert" in which:
        @jax.jit
        def f_ins(table, keys, kvalid):
            t2 = I.alloc_blocks(cfg, table, keys, kvalid, frame)
            return t2.high_count
        clock("alloc_blocks", f_ins, table, keys, kvalid)

    if "compact" in which:
        @jax.jit
        def f_compact(table):
            return I.compact_active(cfg, table)[1]
        clock("compact_active", f_compact, table)

    cpct = jax.jit(functools.partial(I.compact_active, cfg))
    slots, count, bpos, bptr, bres, bvalid = cpct(table)

    def _psum(p2):
        return (jnp.sum(p2.sdf[:1, :8]) + jnp.sum(p2.sumsq[:1, :8])
                + jnp.sum(p2.weight[:1, :8]).astype(jnp.float32))

    if "integrate" in which:
        @jax.jit
        def f_int(table, pool, points, frame):
            p2 = I.integrate_points_sdf(cfg, table, pool, pcam, points,
                                        normals, weights, valid,
                                        num_voxel_steps, frame=frame)
            return _psum(p2)
        clock("integrate_points_sdf", f_int, table, pool, points, frame)

    if "dda" in which:
        @jax.jit
        def f_dda(points):
            rngn = jnp.linalg.norm(points, axis=-1)
            trunc = jnp.full_like(rngn, cfg.sdf_truncation)
            pc_min = points - points / rngn[..., None].clip(1e-6) * 0.4
            pc_max = points + points / rngn[..., None].clip(1e-6) * 0.4
            pw_min = C.cam_to_world(pcam, pc_min)
            pw_max = C.cam_to_world(pcam, pc_max)
            vox, vis = I._dda_visit(cfg, pcam, pw_min, pw_max, valid,
                                    num_voxel_steps, block_level=False)
            return jnp.sum(jnp.where(vis, vox[..., 0], 0))
        clock(f"dda_visit[K={num_voxel_steps}]", f_dda, points)

    if "lookup" in which:
        KN = num_voxel_steps * n_pts
        blk = jnp.zeros((KN, 3), jnp.int32)
        vis = jnp.ones((KN,), bool)

        @jax.jit
        def f_lkp(table, blk, vis, frame):
            f, p, r = H.lookup_dedup(table, blk, vis,
                                     cfg.lookup_dedup_scratch,
                                     frame_salt=frame)
            return jnp.sum(jnp.where(f, p, 0))
        clock(f"lookup_dedup[{KN/1e6:.1f}M keys]", f_lkp, table, blk, vis,
              frame)

    if "scatter" in which:
        KN = num_voxel_steps * n_pts
        nv = pool.num_voxels
        fidx = jnp.zeros((KN,), jnp.int32)
        w = jnp.ones((KN,), jnp.float32)

        @jax.jit
        def f_scat(pool, fidx, w):
            acc_w = jnp.zeros((nv,), jnp.float32).at[fidx].add(w, mode="drop")
            acc_sw = jnp.zeros((nv,), jnp.float32).at[fidx].add(
                w * 2.0, mode="drop")
            hit = acc_w > 0
            sdf = jnp.where(hit, acc_sw / acc_w.clip(1e-20), pool.flat_sdf)
            return jnp.sum(sdf[:8])
        clock(f"flat_acc+merge[nv={nv/1e6:.0f}M]", f_scat, pool, fidx, w)

    if "gc" in which:
        @jax.jit
        def f_gc(table, pool):
            t2, p2 = I.garbage_collect_sweep(cfg, table, pool, pcam, slots,
                                             bpos, bptr, bres, bvalid)
            return t2.high_count.astype(jnp.float32) + _psum(p2)
        clock("gc_sweep", f_gc, table, pool)


if __name__ == "__main__":
    main()
