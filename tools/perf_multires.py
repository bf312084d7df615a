"""Stage-by-stage timing of the MULTI-RES RGB-D integrate frame on the real
device (the variance-adaptive flagship mode, sdf_var_threshold > 0).

Same clock protocol as perf_breakdown.py: dispatch the jitted stage K times
back-to-back, fetch one tiny scalar.

Usage: python tools/perf_multires.py [stage ...]
Stages: full fused coarsen reintegrate gc starve writeback
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

    from bench import synthetic_room_depth
    from mrhash_tpu.core import pipeline
    from mrhash_tpu.core.state import MapConfig, make_state
    from mrhash_tpu.ops import camera as C
    from mrhash_tpu.ops import integrate as I

    which = set(sys.argv[1:]) or {"full", "fused", "coarsen", "reintegrate",
                                  "gc", "starve", "writeback"}

    rows, cols = 680, 1200
    sample_mode = "fused" if jax.default_backend() != "cpu" else "gather"
    cfg = MapConfig(
        virtual_voxel_size=0.01, sdf_truncation=0.07,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=30.0, n_frames_invalidate_voxels=100,
        sdf_var_threshold=1.0,
        num_blocks=1 << 19, max_active_blocks=1 << 17, num_buckets=1 << 15,
        max_alloc_per_frame=1 << 13, sample_mode=sample_mode,
        alloc_tile=4)
    cam0 = C.make_camera(fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                         rows=rows, cols=cols, min_depth=0.01, max_depth=30.0)
    rng = np.random.default_rng(0)
    state = make_state(cfg.num_blocks, cfg.num_buckets or None)
    rgb = jnp.asarray(rng.integers(0, 255, (rows, cols, 3)), jnp.uint8)
    depths = [synthetic_room_depth(rows, cols, cam0, rng) for _ in range(4)]

    def frame_cam(i):
        th = 0.02 * i
        rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.array([0.01 * i, 0.0, 0.0], np.float32)
        return C.with_pose(cam0, jnp.asarray(rot), jnp.asarray(t))

    step = pipeline.jit_integrate_rgbd(cfg)
    for i in range(10):
        state, stats = step(state, frame_cam(i), depths[i % 4], rgb)
    occ = int(stats["occupied_blocks"])
    bucket = max(-(-int(occ * 1.8) // 4096) * 4096, 4096)
    cfg = dataclasses.replace(cfg, max_active_blocks=bucket)
    print(f"# occupancy {occ}, bucket {bucket}, "
          f"low_free {int(stats['low_free'])}", file=sys.stderr)

    cam = frame_cam(10)
    depth_img = depths[0]
    pc_depth = C.get_depth(cam, C.compute_cloud(cam, depth_img))
    table = state.table
    pool = state.pool
    frame = state.frame

    K = 5

    def _psum(p2):
        # touch one element of every array so no scatter is DCE'd
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

    if "full" in which:
        stepb = jax.jit(functools.partial(pipeline.integrate_rgbd, cfg))
        s3, st = stepb(state, cam, depth_img, rgb)
        float(st["occupied_blocks"].block_until_ready())
        t0 = time.perf_counter()
        for _ in range(K):
            s3, st = stepb(state, cam, depth_img, rgb)
        float(st["occupied_blocks"].block_until_ready())
        print(f"{'full_frame[multires]':28s} "
              f"{(time.perf_counter()-t0)/K*1e3:8.2f} ms")

    cpct = jax.jit(functools.partial(I.compact_active, cfg))
    slots, count, bpos, bptr, bres, bvalid = cpct(table, cam)

    if "fused" in which:
        @jax.jit
        def f_fused(pool, pc_depth, rgb, frame):
            p2, aux = I.fused_integrate_depth(cfg, pool, cam, pc_depth, rgb,
                                              bpos, bptr, bres, bvalid,
                                              frame=frame)
            return _psum(p2)
        clock("fused[multires-writeback]", f_fused, pool, pc_depth, rgb,
              frame)

    if "writeback" in which:
        # isolate the multires scatter writeback: row gather + 8-carve scatter
        prow, lane0 = I._block_rows(bptr, bvalid)
        L = 512

        @jax.jit
        def f_wb(pool):
            lanes = jnp.arange(L, dtype=jnp.int32)
            local = lanes[None, :] - lane0[:, None]
            import mrhash_tpu.params as P
            nvox = jnp.where(bres == 1, P.TOTAL_LOW_BLOCK_SIZE, L)[:, None]
            in_win = (local >= 0) & (local < nvox) & bvalid[:, None]
            old = I._gather_block_rows(pool, prow)
            new = dict(sdf=old["sdf"] + 1.0, sumsq=old["sumsq"],
                       weight=old["weight"], rgbp=old["rgbp"])
            p2 = I._scatter_block_rows(pool, prow, bres, bvalid, in_win,
                                       new, old, multires=True, lane0=lane0)
            return _psum(p2)
        clock("multires_row_writeback", f_wb, pool)

    if "pack" in which:
        @jax.jit
        def f_pack(bptr):
            rw = I.pack_window_rows(cfg, bpos, bptr, bres, bvalid,
                                    pool.sdf.shape[0])
            return sum(jnp.sum(v[:1].astype(jnp.float32)) for v in
                       (rw["rrow"], rw["eslot"], rw["gvalid"].ravel()))
        clock("pack_window_rows", f_pack, bptr)

    if "kernel" in which:
        from mrhash_tpu.ops import fused_integrate as FI
        import mrhash_tpu.params as P2
        cast = jax.lax.bitcast_convert_type
        hpad = -(-rows // 8) * 8 + FI.PATCH_H
        wpad = -(-cols // 128) * 128 + FI.PATCH_W
        img_cf = jnp.zeros((2, hpad, wpad), jnp.float32).at[
            0, :rows, :cols].set(pc_depth)
        cam_vec = FI.make_cam_vec(
            cam, cfg.virtual_voxel_size, cfg.sdf_truncation,
            cfg.sdf_truncation_scale, cfg.max_integration_distance,
            cfg.integration_weight_sample, cfg.integration_weight_max,
            hpad, wpad)
        rw = I.pack_window_rows(cfg, bpos, bptr, bres, bvalid,
                                pool.sdf.shape[0])
        A = bptr.shape[0]
        meta = jnp.zeros((A, 128), jnp.int32)
        meta = meta.at[:, :3].set(rw["rpos"])
        meta = meta.at[:, 3].set(rw["rvalid"].astype(jnp.int32))
        meta = meta.at[:, 4].set(jnp.where(rw["rvalid"], rw["rres"], 0))
        gmeta = jnp.concatenate(
            [rw["gpos"], rw["gvalid"][..., None]], axis=2).reshape(A, 32)
        meta = meta.at[:, 8:40].set(gmeta)
        rrow_c = jnp.where(rw["rvalid"], rw["rrow"], 0)
        pool_rows = jnp.concatenate(
            [cast(pool.sdf[rrow_c], jnp.int32),
             cast(pool.sumsq[rrow_c], jnp.int32),
             pool.weight[rrow_c], pool.rgbp[rrow_c]], axis=1)
        n_pack = int(jnp.sum(rw["rvalid"] & (rw["rres"] == 1)))
        n_plain = int(jnp.sum(rw["rvalid"] & (rw["rres"] == 0)))
        print(f"# kernel slots: {n_plain} plain + {n_pack} packed "
              f"(window entries {int(jnp.sum(bvalid))})", file=sys.stderr)

        @jax.jit
        def f_kern(pool_rows):
            out = FI.fused_integrate_pallas(img_cf, cam_vec, meta, pool_rows,
                                            multires=True)
            return jnp.sum(out[:1, :8])
        clock("kernel[packed-multires]", f_kern, pool_rows)

        @jax.jit
        def f_gather(bptr):
            rw = I.pack_window_rows(cfg, bpos, bptr, bres, bvalid,
                                    pool.sdf.shape[0])
            rrow_c = jnp.where(rw["rvalid"], rw["rrow"], 0)
            pr = jnp.concatenate(
                [cast(pool.sdf[rrow_c], jnp.int32),
                 cast(pool.sumsq[rrow_c], jnp.int32),
                 pool.weight[rrow_c], pool.rgbp[rrow_c]], axis=1)
            return jnp.sum(pr[:1, :8])
        clock("pack+row_gather", f_gather, bptr)

    if "coarsen" in which:
        @jax.jit
        def f_coarsen(table, pool):
            t2, p2, ns, nm, _ = I.coarsen_by_variance(
                cfg, table, pool, slots, bpos, bptr, bres, bvalid)
            return t2.high_count.astype(jnp.float32) + _psum(p2)
        clock("coarsen_by_variance", f_coarsen, table, pool)

    if "reintegrate" in which:
        rcfg = (dataclasses.replace(cfg, sample_mode="pallas")
                if cfg.sample_mode == "fused" else cfg)
        u = cfg.max_coarsen_per_frame
        ns = jnp.zeros((u,), jnp.int32)
        nm = jnp.zeros((u,), bool).at[:64].set(True)

        @jax.jit
        def f_reint(table, pool, pc_depth, rgb):
            p2 = I.reintegrate_blocks(rcfg, table, pool, cam, pc_depth, rgb,
                                      ns, nm)
            return _psum(p2)
        clock(f"reintegrate[{rcfg.sample_mode},u={u}]", f_reint, table, pool,
              pc_depth, rgb)

    if "gc" in which:
        @jax.jit
        def f_gc(table, pool):
            t2, p2 = I.garbage_collect_sweep(cfg, table, pool, cam, slots,
                                             bpos, bptr, bres, bvalid)
            return t2.high_count.astype(jnp.float32) + _psum(p2)
        clock("gc_sweep[multires]", f_gc, table, pool)

    if "starve" in which:
        @jax.jit
        def f_starve(pool):
            p2 = I.starve_voxels(cfg, pool, cam, bpos, bptr, bres, bvalid)
            return _psum(p2)
        clock("starve[multires]", f_starve, pool)


if __name__ == "__main__":
    main()
