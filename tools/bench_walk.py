"""Streaming-ACTIVE bench row (round-3 VERDICT next #6): a corridor walk
sized so the high heap crosses the 15% stream threshold repeatedly, so the
published FPS finally includes online stream-out/in passes on the hot path
(the reference streams inside compute() whenever heapFree <= 0.15*blocks,
geowrapper.cpp:137-138 + params.h:28; every prior bench row ran with
streaming never triggered).

Scene: the camera walks forward through an infinite square tube (half-width
1.5 m) at 8 cm/frame.  New wall surface allocates ~continuously; once the
map exceeds capacity the GeoWrapper trigger streams blocks behind the
camera out to the host chunk grid.  Steady-state frames are timed INCLUDING
the stream passes.

Writes/merges rows into BENCH_EXTRA.json:
  tsdf_streaming_walk_fps       steady-state FPS incl. streaming
  tsdf_streaming_walk_triggers  stream events during the timed window

Usage: PYTHONPATH=.:/root/.axon_site python tools/bench_walk.py
       [--frames 120] [--warm 60]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROWS, COLS = 680, 1200
HALF = 1.5          # tube half-width, m
STEP = 0.08         # walk speed, m/frame
MAXD = 4.0


def tube_depth(cx, cy, fx, fy, off_x, off_y):
    """z-depth image of a square tube |x|=HALF, |y|=HALF seen from
    (off_x, off_y, z) looking +z."""
    u = (np.arange(COLS, dtype=np.float32)[None, :] - cx) / fx
    v = (np.arange(ROWS, dtype=np.float32)[:, None] - cy) / fy
    big = np.float32(1e9)

    def t_plane(d, o, w):
        tp = np.where(d > 1e-6, (w - o) / np.maximum(d, 1e-6), big)
        tm = np.where(d < -1e-6, (-w - o) / np.minimum(d, -1e-6), big)
        return np.minimum(tp, tm)

    t = np.minimum(t_plane(np.broadcast_to(u, (ROWS, COLS)), off_x, HALF),
                   t_plane(np.broadcast_to(v, (ROWS, COLS)), off_y, HALF))
    z = t  # ray dir z-component is 1 -> z-depth = t
    return np.where(z < MAXD, z, 0.0).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    # first trigger lands ~frame 140 at 1<<16 capacity (~300 new
    # blocks/frame after the initial 14k-block visible tube): warm must
    # cover it so the timed window is steady-state streaming
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--warm", type=int, default=150)
    args = ap.parse_args()

    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from mrhash_tpu.geowrapper import GeoWrapper

    # capacity must hold the PROTECTED set (frustum-corner radius ~6.6 m
    # of tube ~= 26k blocks) UNDER the stream watermark (0.35), or no
    # eviction budget can ever recover the heap and the trigger fires
    # every frame (measured: 107 triggers / 120 frames, 0.46 FPS at
    # 1<<15).  1<<16 puts the watermark at 43k occupied vs the 26k
    # working set — the same sizing rule the reference implies by keeping
    # its stream radius inside device capacity (streamer.cpp:168-247).
    num_blocks = 1 << 16
    gw = GeoWrapper(sdf_truncation=0.07, sdf_truncation_scale=0.0,
                    integration_weight_sample=1, virtual_voxel_size=0.01,
                    n_frames_invalidate_voxels=100, voxel_extents_scale=1,
                    gs_optimization_param_path="",
                    num_blocks=num_blocks, max_active_blocks=1 << 15,
                    max_alloc_per_frame=1 << 13, profiling=False)
    gw.setHashNumBuckets(1 << 14)   # load <= 0.4 at full occupancy
    gw.cfg = dataclasses.replace(gw.cfg, alloc_tile=4, starve_bands=8)
    gw.setCamera(600.0, 600.0, 599.5, 339.5, ROWS, COLS, 0.01, MAXD)

    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    # pre-staged device frames, like bench.py's protocol: the scene cycles
    # 8 canned depth variants, and re-uploading 5.7 MB of depth+rgb per
    # frame over the ~40 MB/s axon tunnel measured ~140 ms/frame of pure
    # wire time that exists on no production host (PCIe/DMA feeds the
    # reference at GB/s)
    rgb = jnp.asarray(rng.integers(0, 255, (ROWS, COLS, 3)).astype(np.uint8))
    offsets = [(0.1 * np.sin(k), 0.05 * np.cos(k))
               for k in np.linspace(0, 2 * np.pi, 8, endpoint=False)]
    depths = [jnp.asarray(tube_depth(599.5, 339.5, 600.0, 600.0, ox, oy))
              for ox, oy in offsets]

    thresh = 0.15 * num_blocks
    total = args.warm + args.frames
    triggers_timed = 0
    t_timed = 0.0
    t0 = time.time()
    for i in range(total):
        ox, oy = offsets[i % 8]
        gw.setCurrPose([ox, oy, STEP * i], [0, 0, 0, 1])
        gw.setDepthImage(depths[i % 8])
        gw.setRGBImage(rgb)
        will_stream = gw._high_free <= thresh
        tf = time.perf_counter()
        gw.compute()
        dt = time.perf_counter() - tf
        if i >= args.warm:
            t_timed += dt
            triggers_timed += int(will_stream)
        if i % 20 == 0:
            print(f"# frame {i}: {dt*1e3:.1f} ms, high_free {gw._high_free}, "
                  f"RAM blocks {gw.streamer.grid.num_blocks()} "
                  f"@ {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    fps = args.frames / t_timed
    dev = jax.devices()[0].device_kind
    print(f"# timed window: {args.frames} frames, {triggers_timed} stream "
          f"events, {fps:.2f} FPS on {dev}", file=sys.stderr)

    rows = [
        # vs_baseline None: the corridor scene exists in no reference table
        # (the 48.9 FPS Replica row is a different workload — round-4
        # VERDICT weak #8), so the ratio would be non-comparable
        {"metric": "tsdf_streaming_walk_fps", "value": round(fps, 2),
         "unit": "frames/s", "vs_baseline": None},
        {"metric": "tsdf_streaming_walk_triggers", "value": triggers_timed,
         "unit": "events", "vs_baseline": None},
    ]
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_EXTRA.json")
    try:
        with open(path) as f:
            recs = json.load(f)
    except Exception:
        recs = []
    recs = [r for r in recs if r["metric"] not in
            {x["metric"] for x in rows}] + rows
    with open(path, "w") as f:
        json.dump(recs, f, indent=1)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
