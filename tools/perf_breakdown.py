"""Stage-by-stage timing of the RGB-D integrate frame on the real device.

Times each pipeline stage in isolation (alloc candidates, dedup+insert,
compact, integrate [by sample mode], GC, starve) by dispatching the jitted
stage K times back-to-back (outputs chained to inputs so the device
serializes them) and fetching one tiny scalar at the end — the axon tunnel's
block_until_ready returns early and big fetches run at ~40MB/s, so a scalar
fetch is the only honest clock.

Usage: python tools/perf_breakdown.py [stage ...]
Stages: full alloc dedup insert compact integrate integrate_nosample gc starve
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
    from mrhash_tpu.ops import hashtable as H

    which = set(sys.argv[1:]) or {"full", "dispatch", "alloc", "dedup",
                                  "lookup", "insert", "compact", "fusedk",
                                  "fused", "gc", "starve"}

    rows, cols = 680, 1200
    sample_mode = "fused" if jax.default_backend() != "cpu" else "gather"
    cfg = MapConfig(
        virtual_voxel_size=0.01, sdf_truncation=0.07,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=30.0, n_frames_invalidate_voxels=100,
        num_blocks=1 << 19, max_active_blocks=1 << 17,
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

    # populate the map with 10 warmup frames at the full window
    step = pipeline.jit_integrate_rgbd(cfg)
    for i in range(10):
        state, stats = step(state, frame_cam(i), depths[i % 4], rgb)
    occ = int(stats["occupied_blocks"])
    bucket = max(-(-int(occ * 1.8) // 4096) * 4096, 4096)
    cfg = dataclasses.replace(cfg, max_active_blocks=bucket)
    print(f"# occupancy {occ}, bucket {bucket}", file=sys.stderr)

    cam = frame_cam(10)
    depth_img = depths[0]
    pc_depth = C.get_depth(cam, C.compute_cloud(cam, depth_img))
    num_steps = cfg.dda_steps(float(cfg.max_integration_distance))
    table = state.table
    pool = state.pool
    frame = state.frame

    K = 10

    def clock(name, fn, *args, n=K):
        """fn: jitted, returns something with a cheap scalar reduce."""
        out = fn(*args)  # compile + warm
        s = jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        # tiny scalar fetch forces the chain
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0][:1].astype(jnp.float32)).block_until_ready()
              if leaves[0].ndim else leaves[0])
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:24s} {dt:8.2f} ms")
        return out

    # --- full frame (non-donating so later stages keep the state) -----------
    if "full" in which:
        stepb = jax.jit(functools.partial(pipeline.integrate_rgbd, cfg))
        s3, st = stepb(state, cam, depth_img, rgb)  # compile + warm
        float(st["occupied_blocks"].block_until_ready())
        t0 = time.perf_counter()
        for _ in range(K):
            s3, st = stepb(state, cam, depth_img, rgb)
        float(st["occupied_blocks"].block_until_ready())
        print(f"{'full_frame':24s} {(time.perf_counter()-t0)/K*1e3:8.2f} ms")

    # --- bare dispatch overhead (trivial chained program) -------------------
    if "dispatch" in which:
        @jax.jit
        def f_nop(x):
            return x + 1.0
        clock("dispatch(nop)", f_nop, jnp.float32(0.0), n=50)

    # --- alloc candidates (DDA scan) ---------------------------------------
    if "alloc" in which:
        @jax.jit
        def f_alloc(pc_depth, frame):
            keys, valid = I.alloc_candidates_depth(cfg, cam, pc_depth,
                                                   num_steps, frame=frame)
            return jnp.sum(jnp.where(valid, keys[:, 0], 0))
        clock("alloc_candidates", f_alloc, pc_depth, frame)

    keys, valid = jax.jit(functools.partial(
        I.alloc_candidates_depth, cfg, cam,
        num_steps=num_steps))(pc_depth, frame=frame)

    # --- dedup --------------------------------------------------------------
    if "dedup" in which:
        @jax.jit
        def f_dedup(keys, valid, frame):
            ukeys, uvalid = I.dedup_candidates(
                keys, valid, frame, cfg.max_alloc_per_frame *
                cfg.dedup_scratch_factor, cfg.max_alloc_per_frame)
            return jnp.sum(jnp.where(uvalid, ukeys[:, 0], 0))
        clock("dedup_candidates", f_dedup, keys, valid, frame)

    # --- lookup only ---------------------------------------------------------
    if "lookup" in which:
        uk, uv = jax.jit(functools.partial(
            I.dedup_candidates, scratch_size=cfg.max_alloc_per_frame *
            cfg.dedup_scratch_factor,
            u_max=cfg.max_alloc_per_frame))(keys, valid, frame)

        @jax.jit
        def f_lookup(table, uk, uv):
            found, slot, ptr, res = H.lookup(table, uk, uv)
            return jnp.sum(jnp.where(found, ptr, 0))
        clock("lookup(8k keys)", f_lookup, table, uk, uv)

    # --- insert -------------------------------------------------------------
    if "insert" in which:
        ukeys, uvalid = jax.jit(functools.partial(
            I.dedup_candidates, scratch_size=cfg.max_alloc_per_frame *
            cfg.dedup_scratch_factor,
            u_max=cfg.max_alloc_per_frame))(keys, valid, frame)
        zero_res = jnp.zeros((cfg.max_alloc_per_frame,), jnp.int32)

        @jax.jit
        def f_insert(table, ukeys, uvalid):
            t2, info = H.insert(table, ukeys, uvalid, zero_res)
            return t2.high_count
        clock("insert(steady)", f_insert, table, ukeys, uvalid)

    # --- compact -------------------------------------------------------------
    if "compact" in which:
        @jax.jit
        def f_compact(table):
            slots, count, bpos, bptr, bres, bvalid = I.compact_active(
                cfg, table, cam)
            return count
        clock("compact_active", f_compact, table)

    cpct = jax.jit(functools.partial(I.compact_active, cfg))
    slots, count, bpos, bptr, bres, bvalid = cpct(table, cam)

    # --- integrate -----------------------------------------------------------
    if "fusedk" in which:
        # kernel only, prebuilt inputs: isolates the XLA glue cost around it
        from mrhash_tpu.ops import fused_integrate as FI
        H_, W_ = pc_depth.shape
        hpad = max(((H_ + 7) // 8) * 8, FI.PATCH_H)
        wpad = max(((W_ + 127) // 128) * 128, FI.PATCH_W)
        packed = (rgb[..., 0].astype(jnp.float32)
                  + rgb[..., 1].astype(jnp.float32) * 256.0
                  + rgb[..., 2].astype(jnp.float32) * 65536.0)
        img_cf = jnp.zeros((2, hpad, wpad), jnp.float32)
        img_cf = img_cf.at[:, :H_, :W_].set(jnp.stack([pc_depth, packed]))
        cam_vec = FI.make_cam_vec(
            cam, cfg.virtual_voxel_size, cfg.sdf_truncation,
            cfg.sdf_truncation_scale, cfg.max_integration_distance,
            cfg.integration_weight_sample, cfg.integration_weight_max,
            hpad, wpad)
        A = bpos.shape[0]
        meta = jnp.zeros((A, 128), jnp.int32)
        meta = meta.at[:, :3].set(jnp.where(bvalid[:, None], bpos, 0))
        meta = meta.at[:, 3].set(bvalid.astype(jnp.int32))
        prow, _ = I._block_rows(bptr, bvalid)
        cast = jax.lax.bitcast_convert_type
        pool_rows = jnp.concatenate(
            [cast(pool.sdf[prow], jnp.int32), cast(pool.sumsq[prow],
                                                   jnp.int32),
             pool.weight[prow], pool.rgbp[prow]], axis=1)
        pool_rows = jax.block_until_ready(pool_rows)
        img_cf = jax.block_until_ready(img_cf)

        @jax.jit
        def f_kernel(img_cf, cam_vec, meta, pool_rows):
            out = FI.fused_integrate_pallas(img_cf, cam_vec, meta, pool_rows)
            return jnp.sum(out[:1, :8])
        clock("fused_kernel_only", f_kernel, img_cf, cam_vec, meta, pool_rows)

    if "fused" in which:
        @jax.jit
        def f_fused(pool, pc_depth, rgb, frame):
            p2, aux = I.fused_integrate_depth(cfg, pool, cam, pc_depth, rgb,
                                              bpos, bptr, bres, bvalid,
                                              frame=frame)
            return jnp.sum(p2.sdf[:1, :8])
        clock("integrate[fused]", f_fused, pool, pc_depth, rgb, frame)

    if "fusedglue" in which:
        from mrhash_tpu.ops import fused_integrate as FI2
        cast = jax.lax.bitcast_convert_type
        H_, W_ = pc_depth.shape
        hpad = max(((H_ + 7) // 8) * 8, FI2.PATCH_H)
        wpad = max(((W_ + 127) // 128) * 128, FI2.PATCH_W)
        A = bpos.shape[0]

        @jax.jit
        def f_pack(pool, pc_depth, rgb):
            packed = (rgb[..., 0].astype(jnp.float32)
                      + rgb[..., 1].astype(jnp.float32) * 256.0
                      + rgb[..., 2].astype(jnp.float32) * 65536.0)
            img_cf = jnp.zeros((2, hpad, wpad), jnp.float32)
            img_cf = img_cf.at[:, :H_, :W_].set(
                jnp.stack([pc_depth, packed]))
            meta = jnp.zeros((A, 128), jnp.int32)
            meta = meta.at[:, :3].set(jnp.where(bvalid[:, None], bpos, 0))
            meta = meta.at[:, 3].set(bvalid.astype(jnp.int32))
            prow, _ = I._block_rows(bptr, bvalid)
            pool_rows = jnp.concatenate(
                [cast(pool.sdf[prow], jnp.int32),
                 cast(pool.sumsq[prow], jnp.int32),
                 pool.weight[prow], pool.rgbp[prow]], axis=1)
            return (jnp.sum(img_cf[:1, :1, :8]) + jnp.sum(meta[:1, :8])
                    + jnp.sum(pool_rows[:1, :8]))
        clock("fused_glue[pack]", f_pack, pool, pc_depth, rgb)

        out_pre = jnp.zeros((A, FI2.OUT_LANES), jnp.int32)

        @jax.jit
        def f_scat(pool, out):
            L = 512
            prow, _ = I._block_rows(bptr, bvalid)
            n_rows = pool.sdf.shape[0]
            row0 = jnp.where(bvalid, prow, n_rows)
            pool = pool.replace(
                sdf=pool.sdf.at[row0].set(cast(out[:, 0:L], jnp.float32),
                                          mode="drop", unique_indices=True),
                sumsq=pool.sumsq.at[row0].set(
                    cast(out[:, L:2 * L], jnp.float32), mode="drop",
                    unique_indices=True),
                weight=pool.weight.at[row0].set(out[:, 2 * L:3 * L],
                                                mode="drop",
                                                unique_indices=True),
                rgbp=pool.rgbp.at[row0].set(out[:, 3 * L:4 * L], mode="drop",
                                            unique_indices=True))
            return jnp.sum(pool.sdf[:1, :8])
        clock("fused_glue[scatter]", f_scat, pool, out_pre)

        @jax.jit
        def f_fallback(pool, pc_depth, rgb, frame, out):
            import dataclasses as dc
            L = 512
            BB = int(cfg.sample_fallback) // L
            bneed = bvalid & (out[:, 4 * L] > 0)
            shift = (frame.astype(jnp.int32) * 4097) % A
            rolled = jnp.roll(bneed, -shift)
            sel_r, ok_r, total_need = H.compact_indices(rolled, BB)
            bsel = (jnp.where(ok_r, sel_r, 0) + shift) % A
            bok = ok_r
            fb_pos = bpos[bsel]
            r0, c0 = I._patch_origins(cam, fb_pos, cfg.virtual_voxel_size,
                                      hpad, wpad, FI2.PATCH_H, FI2.PATCH_W)
            pif, _ = I._block_voxel_grid(fb_pos, jnp.zeros((BB,), jnp.int32))
            pf = pif.astype(jnp.float32) * cfg.virtual_voxel_size
            from mrhash_tpu.ops import camera as C2
            row, col, okp = C2.project_point(cam, C2.world_to_cam(cam, pf))
            lr = row - r0[:, None]
            lc = col - c0[:, None]
            oop = ~((lr >= 0) & (lr < FI2.PATCH_H)
                    & (lc >= 0) & (lc < FI2.PATCH_W))
            fcfg = dc.replace(cfg, sample_mode="gather")
            pool = I.integrate_depth(fcfg, pool, cam, pc_depth, rgb,
                                     fb_pos, bptr[bsel], bres[bsel], bok,
                                     lane_mask=oop)
            return jnp.sum(pool.sdf[:1, :8])
        clock("fused_glue[fallback]", f_fallback, pool, pc_depth, rgb,
              frame, out_pre)

    if "integrate" in which:
        icfg = (dataclasses.replace(cfg, sample_mode="pallas")
                if cfg.sample_mode == "fused" else cfg)

        @jax.jit
        def f_integ(pool, pc_depth, rgb):
            p2 = I.integrate_depth(icfg, pool, cam, pc_depth, rgb,
                                   bpos, bptr, bres, bvalid)
            return jnp.sum(p2.sdf[:1, :8])
        clock(f"integrate[{icfg.sample_mode}]", f_integ, pool, pc_depth, rgb)

    if "integrate_nosample" in which:
        cfgz = dataclasses.replace(cfg, sample_mode="gather")

        @jax.jit
        def f_integ_g(pool, pc_depth, rgb):
            p2 = I.integrate_depth(cfgz, pool, cam, pc_depth, rgb,
                                   bpos, bptr, bres, bvalid)
            return jnp.sum(p2.sdf[:1, :8])
        clock("integrate[gather]", f_integ_g, pool, pc_depth, rgb)

    # --- GC -----------------------------------------------------------------
    if "gc" in which:
        @jax.jit
        def f_gc(table, pool):
            t2, p2 = I.garbage_collect_sweep(cfg, table, pool, cam, slots,
                                             bpos, bptr, bres, bvalid)
            return t2.high_count
        clock("gc_sweep", f_gc, table, pool)

    if "starve" in which:
        @jax.jit
        def f_starve(pool):
            p2 = I.starve_voxels(cfg, pool, cam, bpos, bptr, bres, bvalid)
            return jnp.sum(p2.weight[:1, :8])
        clock("starve_voxels", f_starve, pool)


if __name__ == "__main__":
    main()
