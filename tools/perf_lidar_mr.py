"""Stage isolation for the fused LiDAR multi-res frame: alloc internals,
pack_window_rows, coarsen cond, flag mapping.

Usage: python tools/perf_lidar_mr.py
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

    sys.path.insert(0, ".")
    from bench_extra import synthetic_lidar_cloud
    from mrhash_tpu.core import pipeline
    from mrhash_tpu.core.state import MapConfig, make_state
    from mrhash_tpu.ops import camera as C
    from mrhash_tpu.ops import hashtable as H
    from mrhash_tpu.ops import integrate as I

    n_el, n_az = 64, 1024
    n_pts = n_el * n_az
    cfg = MapConfig(
        virtual_voxel_size=0.20, sdf_truncation=0.40,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=100.0, n_frames_invalidate_voxels=0,
        num_blocks=1 << 18, max_active_blocks=1 << 17,
        num_buckets=1 << 16, max_alloc_per_frame=1 << 13,
        sdf_var_threshold=1.0, sample_mode="fused")
    cam = C.make_camera(fx=n_az / (2 * np.pi), fy=n_el / 0.65,
                        cx=n_az / 2.0, cy=n_el / 2.0, rows=n_el, cols=n_az,
                        min_depth=0.2, max_depth=100.0, model=C.SPHERICAL)
    rng = np.random.default_rng(1)
    state = make_state(cfg.num_blocks, cfg.num_buckets or None)
    normals = jnp.zeros((n_pts, 3), jnp.float32)
    weights = jnp.ones((n_pts,), jnp.float32)
    valid = jnp.ones((n_pts,), bool)

    step = pipeline.jit_integrate_points(cfg)
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
    num_steps = cfg.dda_steps(100.0)
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

    keys, kvalid = jax.jit(functools.partial(
        I.alloc_candidates_points, cfg, pcam,
        num_steps=num_steps))(points, normals, valid)

    @jax.jit
    def f_dedup(keys, kvalid, frame):
        uk, uv = I.dedup_candidates(
            keys, kvalid, frame,
            cfg.max_alloc_per_frame * cfg.dedup_scratch_factor,
            cfg.max_alloc_per_frame)
        return jnp.sum(jnp.where(uv, uk[:, 0], 0))
    clock("dedup_candidates", f_dedup, keys, kvalid, frame)

    uk, uv = jax.jit(lambda k, v, f: I.dedup_candidates(
        k, v, f, cfg.max_alloc_per_frame * cfg.dedup_scratch_factor,
        cfg.max_alloc_per_frame))(keys, kvalid, frame)

    @jax.jit
    def f_insert(table, uk, uv):
        t2, _ = H.insert(table, uk, uv,
                         jnp.zeros((cfg.max_alloc_per_frame,), jnp.int32))
        return t2.high_count
    clock("insert", f_insert, table, uk, uv)

    cpct = jax.jit(functools.partial(I.compact_active, cfg))
    slots, count, bpos, bptr, bres, bvalid = cpct(table)
    A = bpos.shape[0]
    print(f"# window A = {A}", file=sys.stderr)

    @jax.jit
    def f_pack(bpos, bptr, bres, bvalid):
        rw = I.pack_window_rows(cfg, bpos, bptr, bres, bvalid,
                                pool.sdf.shape[0])
        return jnp.sum(rw["rrow"][:8])
    clock("pack_window_rows", f_pack, bpos, bptr, bres, bvalid)

    @jax.jit
    def f_origin(bpos):
        c0 = I._sph_patch_origin(cfg, pcam, bpos)
        return jnp.sum(c0[:8])
    clock("sph_patch_origin[A]", f_origin, bpos)

    @jax.jit
    def f_coarsen(table, pool):
        t, p, ns, nm, freed = I.coarsen_by_variance(
            cfg, table, pool, slots, bpos, bptr, bres, bvalid,
            decide=jnp.zeros((A,), bool))
        return t.high_count + jnp.sum(p.sdf[:1, :8])
    clock("coarsen_by_variance[u=1k]", f_coarsen, table, pool)

    @jax.jit
    def f_full(state, points):
        s2, st = pipeline.integrate_points(cfg, state, pcam, points,
                                           normals, weights, valid)
        return st["occupied_blocks"]
    clock("full_frame (no donate)", f_full, state, points)


if __name__ == "__main__":
    main()
