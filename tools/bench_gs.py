"""Online-GS benchmark at reference resolution (VERDICT r1 item 4).

Measures, at 1200x680 on the real device:
- one online-GS frame (qtree seed + kf_iters Adam steps, the runGS path of
  gaussian_data_structures.cpp:138-156) after warmup;
- PSNR on the training view after a short refinement run (the repo tracks
  PSNR; BASELINE.md has no published reference value);
- max_per_tile cap sensitivity (64/128/256 vs a 512 reference render):
  mean-abs image delta (dropped contribution mass) + per-render time.

Writes BENCH_GS.json at the repo root.  Usage: python tools/bench_gs.py
[--rows 680 --cols 1200] [--train-iters 60]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def texture_rgb(pts_w):
    """Multi-view-consistent procedural texture: RGB from world position."""
    x, y, z = pts_w[..., 0], pts_w[..., 1], pts_w[..., 2]
    r = 0.5 + 0.45 * np.sin(2.1 * x) * np.cos(1.3 * y)
    g = 0.5 + 0.45 * np.sin(1.7 * y + 0.8) * np.cos(2.3 * z)
    b = 0.5 + 0.45 * np.sin(1.1 * z + 1.9) * np.cos(1.9 * x)
    return (np.stack([r, g, b], -1) * 255.0).astype(np.uint8)


def scene_frame(rows, cols, cam, rng):
    """Depth + texture-consistent RGB of the 6 m box room."""
    import jax.numpy as jnp

    from bench import synthetic_room_depth
    from mrhash_tpu.ops import camera as C
    depth = synthetic_room_depth(rows, cols, cam, rng)
    r = jnp.arange(rows, dtype=jnp.float32)[:, None]
    c = jnp.arange(cols, dtype=jnp.float32)[None, :]
    pts = C.cam_to_world(cam, C.inverse_projection(
        cam, jnp.broadcast_to(r, (rows, cols)),
        jnp.broadcast_to(c, (rows, cols)), depth))
    rgb = texture_rgb(np.asarray(pts))
    return np.asarray(depth), rgb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=680)
    ap.add_argument("--cols", type=int, default=1200)
    ap.add_argument("--train-iters", type=int, default=60)
    args = ap.parse_args()
    rows, cols = args.rows, args.cols

    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mrhash_tpu.gs import losses
    from mrhash_tpu.gs.container import GaussianContainer, _cam_dict
    from mrhash_tpu.gs.rasterizer import render
    from mrhash_tpu.geowrapper import GeoWrapper
    from mrhash_tpu.ops import camera as C

    fx = 600.0 * cols / 1200.0
    gw = GeoWrapper(sdf_truncation=0.15, sdf_truncation_scale=0.0,
                    integration_weight_sample=1, virtual_voxel_size=0.05,
                    n_frames_invalidate_voxels=0, voxel_extents_scale=1,
                    gs_optimization_param_path="", num_blocks=1 << 15)
    gw.setCamera(fx, fx, cols / 2 - 0.5, rows / 2 - 0.5, rows, cols,
                 0.01, 30.0)
    # preallocate the steady-state parameter bucket (the reference
    # preallocates max capacity, gaussian.cu:104-145): bucket growth between
    # the two frames would otherwise recompile the train step inside the
    # timed region (~10 s over the axon link)
    gc = GaussianContainer("", capacity=1 << 18, initial_size=1 << 14)

    rng = np.random.default_rng(0)
    frames = []
    for i in range(2):
        th = 0.15 * i
        rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.array([0.05 * i, 0.0, 0.0], np.float32)
        cam = C.with_pose(gw.camera, jnp.asarray(rot), jnp.asarray(t))
        depth, rgb = scene_frame(rows, cols, cam, rng)
        frames.append((rot, t, cam, depth, rgb))

    recs = []
    # ---- interleaved integrate -> runGS, the reference's per-frame order
    # (geowrapper.cpp compute(): integrate, then runGS on the SAME frame).
    # Seeding gates on TSDF weight == 1 (once-observed voxels), so running
    # GS only after all frames are integrated would see weight==2 voxels
    # everywhere and seed almost nothing (measured: PSNR 11.7 dB).
    rot, t, cam0, depth0, rgb0 = frames[0]
    gw.setCurrPose(t, _rot_to_quat(rot))
    gw.setDepthImage(depth0)
    gw.setRGBImage(rgb0)
    gw.compute()
    # the fused RGB-D step caches in-frustum pool rows in the resident
    # window (core/resident.py); sync the big pool before check_nodes
    # reads voxel weights, as GeoWrapper.compute() does for its own GS hook
    gw._flush_resident()
    gc.run_gs(gw.cfg, cam0, gw.state, rgb0, depth0)   # warmup + seed
    jax.block_until_ready(gc.model.params["xyz"])
    n0 = gc.model.count
    # prewarm the seed-insert pad ladder (one jit per power-of-4 pad,
    # model.py add_gaussians_device): frame 2's seed count lands on a
    # smaller pad than frame 1's, which would compile inside the timed
    # region.  An all-false mask writes nothing (dest lanes all drop).
    src = gc.qtree_capacity
    z3 = jnp.zeros((src, 3), jnp.float32)
    zc = jnp.zeros((src, 3), jnp.uint8)   # colors are uint8 (check_nodes)
    z1 = jnp.ones((src,), jnp.float32)
    no = jnp.zeros((src,), bool)
    for pad in (256, 1024, 4096, 16384):
        gc.model.params = gc.model._insert_masked_fn(src, pad)(
            gc.model.params, z3, zc, z1, no, jnp.int32(gc.model.count))
    # fast-path programs (run_gs's n-free insert + burst remainder mask):
    # an all-false mask writes nothing and leaves the count unchanged
    gc.model.insert_fast(z3, zc, z1, no, gc.fast_seed_pad)
    gc._rem_mask_jit(no, jnp.int32(0))
    # fence with a scalar fetch (block_until_ready returns early on axon)
    float(jnp.sum(gc.model.params["xyz"][:1]))
    rot, t, cam1, depth1, rgb1 = frames[1]
    gw.setCurrPose(t, _rot_to_quat(rot))
    gw.setDepthImage(depth1)
    gw.setRGBImage(rgb1)
    gw.compute()
    t0 = time.perf_counter()
    gw._flush_resident()   # part of the per-frame GS cost (compute() hook)
    # the compute() hook hands run_gs the DEVICE copies it already uploaded
    # for the TSDF step (geowrapper.compute); passing host arrays here would
    # double-bill the 5.7 MB rgb+depth tunnel upload to the GS frame
    gc.run_gs(gw.cfg, cam1, gw.state, gw._rgb_dev, gw._depth_dev)
    jax.block_until_ready(gc.model.params["xyz"])
    dt = (time.perf_counter() - t0) * 1e3
    print(f"# gs frame: {dt:.1f} ms (seed {gc.model.count - n0} new, "
          f"total {gc.model.count} gaussians, kf_iters {gc.p.kf_iters})",
          file=sys.stderr)
    recs.append({"metric": f"gs_online_frame_ms_{cols}x{rows}",
                 "value": round(dt, 1), "unit": "ms",
                 "vs_baseline": None})

    # ---- short refinement + PSNR on the training view ---------------------
    m = gc.model
    step = gc._train_step_fn(rows, cols)
    cam_d = _cam_dict(cam1)
    gt_u8 = jnp.asarray(rgb1, jnp.uint8)
    gt = jnp.clip(jnp.asarray(rgb1, jnp.float32).transpose(2, 0, 1) / 255.0,
                  0.0, 1.0)
    # strong-typed count matches run_gs's device-scalar signature (a weak
    # Python int would compile a second copy of the train program)
    cnt = jnp.int32(m.count)
    # warm the step OUTSIDE the timed loop: a rasterizer code change
    # invalidates the persistent compile cache, and the ~30 s remote (axon)
    # compile would otherwise land inside the loop and inflate the per-iter
    # mean (the round-4 921.7 ms/iter anomaly — VERDICT r4 weak #3)
    m.params, m.opt_state, _ = step(m.params, m.opt_state, cnt, cam_d, gt_u8)
    jax.block_until_ready(m.params["xyz"])
    t0 = time.perf_counter()
    for _ in range(args.train_iters):
        m.params, m.opt_state, loss = step(m.params, m.opt_state, cnt,
                                           cam_d, gt_u8)
    jax.block_until_ready(m.params["xyz"])
    it_ms = (time.perf_counter() - t0) * 1e3 / args.train_iters
    img = gc.render_view(cam1)
    ps = float(losses.psnr(img, gt))
    print(f"# refinement: {it_ms:.1f} ms/iter, PSNR {ps:.2f} dB after "
          f"{args.train_iters} iters", file=sys.stderr)
    recs.append({"metric": f"gs_adam_iter_ms_{cols}x{rows}",
                 "value": round(it_ms, 1), "unit": "ms",
                 "vs_baseline": None})
    recs.append({"metric": f"gs_psnr_train_view_{cols}x{rows}",
                 "value": round(ps, 2), "unit": "dB", "vs_baseline": None})

    # ---- held-out view + final-opt PSNR (round-3 VERDICT next #7) ----------
    th_h = 0.075  # halfway between the two training poses, never trained
    rot_h = np.array([[np.cos(th_h), 0, np.sin(th_h)], [0, 1, 0],
                      [-np.sin(th_h), 0, np.cos(th_h)]], np.float32)
    t_h = np.array([0.025, 0.0, 0.0], np.float32)
    cam_h = C.with_pose(gw.camera, jnp.asarray(rot_h), jnp.asarray(t_h))
    _, rgb_h = scene_frame(rows, cols, cam_h, rng)
    gt_h = jnp.clip(jnp.asarray(rgb_h, jnp.float32).transpose(2, 0, 1)
                    / 255.0, 0.0, 1.0)

    def view_psnr(cam_v, gt_v):
        return float(losses.psnr(gc.render_view(cam_v), gt_v))

    ps_h = view_psnr(cam_h, gt_h)
    print(f"# holdout view: PSNR {ps_h:.2f} dB", file=sys.stderr)
    recs.append({"metric": f"gs_psnr_holdout_{cols}x{rows}",
                 "value": round(ps_h, 2), "unit": "dB", "vs_baseline": None})

    # optimizeGSFinal (gaussian_data_structures.cpp:158-183): global
    # L1 + lambda*(1-SSIM) passes over the keyframe set
    if not gc.keyframes:
        gc.keyframes = [(_cam_dict(frames[0][2]), jnp.asarray(rgb0)),
                        (cam_d, gt_u8)]
    t0 = time.perf_counter()
    gc.optimize_final()
    jax.block_until_ready(m.params["xyz"])
    dt_fin = time.perf_counter() - t0
    ps_fin = view_psnr(cam1, gt)
    ps_h_fin = view_psnr(cam_h, gt_h)
    print(f"# final opt: {dt_fin:.1f}s ({gc.p.global_iters} passes x "
          f"{len(gc.keyframes)} keyframes), train {ps_fin:.2f} dB, "
          f"holdout {ps_h_fin:.2f} dB", file=sys.stderr)
    recs.append({"metric": f"gs_psnr_after_final_opt_{cols}x{rows}",
                 "value": round(ps_fin, 2), "unit": "dB",
                 "vs_baseline": None})
    recs.append({"metric": f"gs_psnr_holdout_after_final_opt_{cols}x{rows}",
                 "value": round(ps_h_fin, 2), "unit": "dB",
                 "vs_baseline": None})

    # ---- pair-expansion form: compact (exact-count, default) vs dense ----
    active = m.active_mask
    cd = dict(cam_d, W=cols, H=rows)
    for form in ("compact", "dense"):
        f = jax.jit(lambda p, fm=form: render(p, active, cd, m.background,
                                              gc.p.sh_degree, pairs=fm))
        img_f, _ = f(m.params)
        jax.block_until_ready(img_f)
        t0 = time.perf_counter()
        for _ in range(5):
            img_f, _ = f(m.params)
        img_f = jax.block_until_ready(img_f)
        fwd_ms = (time.perf_counter() - t0) * 1e3 / 5
        if form == "dense":
            delta = float(jnp.mean(jnp.abs(img_f - img_compact)))
            print(f"# pairs dense: fwd {fwd_ms:.1f} ms, mean|dC| vs "
                  f"compact = {delta:.2e}", file=sys.stderr)
            recs.append({"metric": "gs_pairs_dense_vs_compact_delta",
                         "value": delta, "unit": "intensity",
                         "vs_baseline": None})
        else:
            img_compact = img_f
            print(f"# pairs compact: fwd {fwd_ms:.1f} ms", file=sys.stderr)
        recs.append({"metric": f"gs_pairs_{form}_forward_ms",
                     "value": round(fwd_ms, 1), "unit": "ms",
                     "vs_baseline": None})

    # ---- max_per_tile cap sensitivity -------------------------------------
    ref_img, _ = jax.jit(lambda p: render(p, active, cd, m.background,
                                          gc.p.sh_degree,
                                          max_per_tile=512))(m.params)
    ref_img = jax.block_until_ready(ref_img)
    for cap in (64, 128, 256):
        f = jax.jit(lambda p: render(p, active, cd, m.background,
                                     gc.p.sh_degree, max_per_tile=cap))
        img_c, _ = f(m.params)
        jax.block_until_ready(img_c)
        t0 = time.perf_counter()
        for _ in range(5):
            img_c, _ = f(m.params)
        img_c = jax.block_until_ready(img_c)
        fwd_ms = (time.perf_counter() - t0) * 1e3 / 5
        delta = float(jnp.mean(jnp.abs(img_c - ref_img)))
        print(f"# cap {cap}: fwd {fwd_ms:.1f} ms, mean|dC| vs 512 = "
              f"{delta:.2e}", file=sys.stderr)
        recs.append({"metric": f"gs_cap{cap}_mean_abs_delta_vs_512",
                     "value": delta, "unit": "intensity",
                     "vs_baseline": None})
        recs.append({"metric": f"gs_cap{cap}_forward_ms",
                     "value": round(fwd_ms, 1), "unit": "ms",
                     "vs_baseline": None})

    for r in recs:
        print(json.dumps(r))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BENCH_GS.json"), "w") as f:
        json.dump(recs, f, indent=1)


def _rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:
        x, y, z = 1.0, 0.0, 0.0
    return np.array([x, y, z, w], np.float64)


if __name__ == "__main__":
    main()
