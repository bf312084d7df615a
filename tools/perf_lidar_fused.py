"""Stage-by-stage timing of the FUSED LiDAR frame (fused_integrate_points)
on the real device at the Newer-College-like bench settings.

Usage: python tools/perf_lidar_fused.py
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
    from mrhash_tpu.ops import fused_integrate as FI

    n_el, n_az = 64, 1024
    n_pts = n_el * n_az
    cfg = MapConfig(
        virtual_voxel_size=0.20, sdf_truncation=0.40,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=100.0, n_frames_invalidate_voxels=0,
        num_blocks=1 << 18, max_active_blocks=1 << 17,
        num_buckets=1 << 16, max_alloc_per_frame=1 << 13,
        sample_mode="fused")
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

    cpct = jax.jit(functools.partial(I.compact_active, cfg))
    slots, count, bpos, bptr, bres, bvalid = cpct(table)
    A = bpos.shape[0]
    print(f"# window A = {A}", file=sys.stderr)

    @jax.jit
    def f_raster(points):
        el_lo, s_el = I._scan_raster_mapping(cam, points, valid)
        img = I.rasterize_scan(cfg, cam, points, valid, el_lo, s_el)
        return jnp.sum(img[:1, :8])
    clock("raster", f_raster, points)

    el_lo, s_el = jax.jit(functools.partial(
        I._scan_raster_mapping, cam))(points, valid)
    rng_img = jax.jit(functools.partial(
        I.rasterize_scan, cfg, cam))(points, valid, el_lo, s_el)

    @jax.jit
    def f_proj(bpos, bvalid, el_lo, s_el):
        pi, lv = I._block_voxel_grid(bpos, bres)
        lv = lv & bvalid[:, None]
        c0 = I._sph_patch_origin(cfg, cam, bpos)
        c0_l = jnp.broadcast_to(c0[:, None], (A, 512))
        proj = I._sph_proj_pack(cfg, cam, pi, lv, el_lo, s_el, c0_l)
        return jnp.sum(proj[:1, :8])
    clock("proj_pack", f_proj, bpos, bvalid, el_lo, s_el)

    @jax.jit
    def f_pack_rows(pool, bptr, bvalid):
        prow, _ = I._block_rows(bptr, bvalid)
        cast = jax.lax.bitcast_convert_type
        pr = jnp.concatenate(
            [cast(pool.sdf[prow], jnp.int32), cast(pool.sumsq[prow],
                                                   jnp.int32),
             pool.weight[prow], pool.rgbp[prow]], axis=1)
        return jnp.sum(pr[:1, :8])
    clock("pool row gather+concat", f_pack_rows, pool, bptr, bvalid)

    @jax.jit
    def f_full(pool, points, frame):
        p2, aux = I.fused_integrate_points(
            cfg, table, pool, pcam, points, normals, weights, valid, frame,
            window=(slots, bpos, bptr, bres, bvalid))
        return (jnp.sum(p2.sdf[:1, :8]) + jnp.sum(p2.weight[:1, :8])
                + jnp.sum(p2.sumsq[:1, :8]) + aux["unserved_blocks"])
    clock("fused_integrate_points", f_full, pool, points, frame)

    # kernel alone (prebuilt operands)
    cast = jax.lax.bitcast_convert_type
    prow, _ = I._block_rows(bptr, bvalid)
    pool_rows = jnp.concatenate(
        [cast(pool.sdf[prow], jnp.int32), cast(pool.sumsq[prow], jnp.int32),
         pool.weight[prow], pool.rgbp[prow]], axis=1)
    meta = jnp.zeros((A, 128), jnp.int32)
    meta = meta.at[:, :3].set(jnp.where(bvalid[:, None], bpos, 0))
    meta = meta.at[:, 3].set(bvalid.astype(jnp.int32))
    meta = meta.at[:, 5].set(I._sph_patch_origin(cfg, cam, bpos))
    pi, lv = I._block_voxel_grid(bpos, bres)
    lv = lv & bvalid[:, None]
    c0_l = jnp.broadcast_to(meta[:, 5:6], (A, 512))
    proj = jax.jit(functools.partial(I._sph_proj_pack, cfg, cam))(
        pi, lv, el_lo, s_el, c0_l)
    cam_vec = FI.make_cam_vec(
        cam, cfg.virtual_voxel_size, cfg.sdf_truncation,
        cfg.sdf_truncation_scale, cfg.max_integration_distance,
        cfg.integration_weight_sample, cfg.integration_weight_max,
        rng_img.shape[0], rng_img.shape[1])

    @jax.jit
    def f_kernel(rng_img, meta, proj, pool_rows):
        out = FI.fused_integrate_points_pallas(rng_img, cam_vec, meta, proj,
                                               pool_rows)
        return jnp.sum(out[:1, :8])
    clock("kernel alone", f_kernel, rng_img, meta, proj, pool_rows)

    @jax.jit
    def f_writeback(pool, out32):
        rows_w = jnp.where(bvalid, prow, pool.sdf.shape[0])
        p2 = pool.replace(
            sdf=pool.sdf.at[rows_w].set(cast(out32[:, 0:512], jnp.float32),
                                        mode="drop", unique_indices=True),
            sumsq=pool.sumsq.at[rows_w].set(
                cast(out32[:, 512:1024], jnp.float32), mode="drop",
                unique_indices=True),
            weight=pool.weight.at[rows_w].set(out32[:, 1024:1536],
                                              mode="drop",
                                              unique_indices=True))
        return jnp.sum(p2.sdf[:1, :8])
    out32 = jnp.zeros((A, 2176), jnp.int32)
    clock("row writeback", f_writeback, pool, out32)

    @jax.jit
    def f_fallback(pool, frame):
        rng_unp = rng_img[:, I.SPH_PAD:I.SPH_PAD + cam.cols]
        BB = int(cfg.sample_fallback) // 512
        bneed = bvalid
        shift = (frame.astype(jnp.int32) * 4097) % A
        rolled = jnp.roll(bneed, -shift)
        sel_r, bok, _ = H.compact_indices(rolled, BB)
        bsel = (jnp.where(bok, sel_r, 0) + shift) % A
        fb_pos = bpos[bsel]
        fb_res = bres[bsel]
        pi_fb, lv_fb = I._block_voxel_grid(fb_pos, fb_res)
        c0_fb = jnp.broadcast_to(
            I._sph_patch_origin(cfg, cam, fb_pos)[:, None], pi_fb.shape[:2])
        proj_fb = I._sph_proj_pack(cfg, cam, pi_fb, lv_fb, el_lo, s_el,
                                   c0_fb)
        pk = proj_fb[:, :512]
        oop = (((pk >> 18) & 1) != 0) & (((pk >> 17) & 1) == 0)
        p2 = I._points_fallback(cfg, pool, cam, rng_unp, el_lo, s_el,
                                fb_pos, bptr[bsel], fb_res, bok, oop)
        return jnp.sum(p2.flat_sdf[:8])
    clock("fallback (BB blocks)", f_fallback, pool, frame)


if __name__ == "__main__":
    main()
