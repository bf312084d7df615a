"""Starve-spike artifact (round-2 VERDICT weak #3 / item 3).

Runs the exact bench.py headline protocol (Replica-like 1200x680, 1 cm
voxels, GC every 100 frames, banded starve) through TWO full starve cycles
and times EVERY frame individually, so the committed artifact shows the
per-frame cost of the starve z-buffer after banding (one exact image-row
band on each of the `starve_bands` frames following a
n_frames_invalidate_voxels boundary), next to the median frame.

Reference comparison: the reference's starve is two cheap kernels inside
the same frame (voxel_data_structures.cu:1582-1671); the round-2 one-shot
TPU event measured 235 ms (12.9x the median frame).  Done criterion: max
frame (starve band frames included) <= ~2x the median frame.

Each frame is fenced by fetching a tiny scalar (axon's block_until_ready
returns early); the fetch RTT adds equally to every frame, so the reported
ratio is conservative.

Writes BENCH_STARVE.json at the repo root.
Usage: python tools/perf_starve.py [--cycles 2]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=2)
    args = ap.parse_args()

    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bench import synthetic_room_depth
    from mrhash_tpu.core import pipeline
    from mrhash_tpu.core.state import MapConfig, make_resident, make_state
    from mrhash_tpu.ops import camera as C

    rows, cols = 680, 1200
    sample_mode = "fused" if jax.default_backend() != "cpu" else "gather"
    cfg = MapConfig(
        virtual_voxel_size=0.01, sdf_truncation=0.07,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=30.0, n_frames_invalidate_voxels=100,
        num_blocks=1 << 19, max_active_blocks=1 << 17, num_buckets=1 << 15,
        max_alloc_per_frame=1 << 13, sample_mode=sample_mode, alloc_tile=4,
        starve_bands=8,
        resident_rows=(1 << 17) if sample_mode == "fused" else 0)
    cam0 = C.make_camera(fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                         rows=rows, cols=cols, min_depth=0.01, max_depth=30.0)
    rng = np.random.default_rng(0)
    state = make_state(cfg.num_blocks, cfg.num_buckets or None,
                       cfg.resident_rows)
    orbit = 40
    rgb = jnp.asarray(rng.integers(0, 255, (rows, cols, 3)), jnp.uint8)

    def frame_cam(i):
        th = 2.0 * np.pi * (i % orbit) / orbit
        rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.array([0.05 * np.sin(th), 0.02 * np.cos(th), 0.0], np.float32)
        return C.with_pose(cam0, jnp.asarray(rot), jnp.asarray(t))

    depths = [synthetic_room_depth(rows, cols, frame_cam(i), rng)
              for i in range(orbit)]

    # warmup revolution at full window, then bucket refit — exactly bench.py
    step = pipeline.jit_integrate_rgbd(cfg)
    occ_max = occt_max = 0
    for i in range(orbit):
        state, stats = step(state, frame_cam(i), depths[i % orbit], rgb)
        occ_max = max(occ_max, int(stats["occupied_blocks"]))
        occt_max = max(occt_max, int(stats["occupied_total"]))
    bucket = max(-(-int(occ_max * 1.2) // 4096) * 4096, 4096)
    bucket = min(bucket, cfg.max_active_blocks)
    from mrhash_tpu import params as MP
    ob = min(max(-(-int(occt_max * 1.25) // 4096) * 4096, bucket),
             (cfg.num_buckets or cfg.num_blocks) * MP.HASH_BUCKET_SIZE)
    cfg_run = dataclasses.replace(cfg, max_active_blocks=bucket,
                                  occupied_bucket=ob)
    if cfg.resident_rows:
        state = state.replace(
            resident=make_resident(cfg.num_blocks, cfg.resident_rows))
    step = pipeline.jit_integrate_rgbd(cfg_run)
    n_adopt = (occ_max + cfg.resident_churn - 1) // cfg.resident_churn + 2
    i = orbit
    for _ in range(n_adopt):
        state, stats = step(state, frame_cam(i), depths[i % orbit], rgb)
        i += 1
    # advance (compiled, per-frame fenced) to just before the next starve
    # boundary so the timed run covers warm band frames, not first-fire
    while int(state.frame) % cfg.n_frames_invalidate_voxels != \
            cfg.n_frames_invalidate_voxels - 4:
        state, stats = step(state, frame_cam(i), depths[i % orbit], rgb)
        int(stats["occupied_blocks"])
        i += 1
    print(f"# bucket {bucket}, timed run starts at map frame "
          f"{int(state.frame)}", file=sys.stderr)

    n_timed = args.cycles * cfg.n_frames_invalidate_voxels + 8
    times, frames = [], []
    for _ in range(n_timed):
        fno = int(state.frame)
        t0 = time.perf_counter()
        state, stats = step(state, frame_cam(i), depths[i % orbit], rgb)
        int(stats["occupied_blocks"])   # tiny-scalar fence (axon)
        times.append((time.perf_counter() - t0) * 1e3)
        frames.append(fno)
        i += 1

    times = np.asarray(times)
    frames = np.asarray(frames)
    n, k = cfg.n_frames_invalidate_voxels, int(cfg.starve_bands)
    is_band = (frames >= n) & (frames % n < k)
    med = float(np.median(times))
    mx = float(times.max())
    band_mean = float(times[is_band].mean()) if is_band.any() else 0.0
    print(f"# {n_timed} frames: median {med:.2f} ms, max {mx:.2f} ms "
          f"(frame {int(frames[times.argmax()])}), "
          f"starve-band frames ({int(is_band.sum())}): mean {band_mean:.2f} "
          f"ms, max {float(times[is_band].max()):.2f} ms", file=sys.stderr)
    per_band = " ".join(f"{frames[j] % n}:{times[j]:.1f}"
                        for j in np.flatnonzero(is_band))
    print(f"# band frames (offset:ms): {per_band}", file=sys.stderr)

    recs = [
        {"metric": "frame_ms_median_replica_like", "value": round(med, 2),
         "unit": "ms", "vs_baseline": None},
        {"metric": "frame_ms_max_incl_starve_bands", "value": round(mx, 2),
         "unit": "ms", "vs_baseline": None},
        {"metric": "starve_band_frame_ms_mean",
         "value": round(band_mean, 2), "unit": "ms", "vs_baseline": None},
        {"metric": "starve_max_over_median_frame",
         "value": round(mx / med, 2), "unit": "x", "vs_baseline": None},
    ]
    for r in recs:
        print(json.dumps(r))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BENCH_STARVE.json"), "w") as f:
        json.dump(recs, f, indent=1)


if __name__ == "__main__":
    main()
