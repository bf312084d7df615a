"""extractMesh wall-time benchmark (round-2 VERDICT weak #4 / item 4).

Builds the Replica-scale synthetic room through the public GeoWrapper API
(same scene/settings as bench.py: 1200x680, 1 cm voxels, 7 cm truncation,
full 40-frame orbit), then times the REAL chunk-sweep `extractMesh`
(geowrapper.cpp:150-230 protocol: streamAllOut -> per-chunk streamIn ->
extract -> streamOut -> PLY).  Appends/updates extract-metric rows in
BENCH_STREAMING.json.

NOTE on absolute numbers: like bench_streaming.py, the chunk sweep is
transfer-bound under the axon development tunnel (~40 MB/s device<->host);
the committed number is an honest wall-time artifact of the whole offline
path including the PLY write.

Usage: python tools/bench_extract.py [--frames 40]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--out", default="/tmp/bench_extract_mesh.ply")
    args = ap.parse_args()

    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp

    from bench import synthetic_room_depth
    from mrhash_tpu.geowrapper import GeoWrapper
    from mrhash_tpu.ops import camera as C

    rows, cols = 680, 1200
    gw = GeoWrapper(sdf_truncation=0.07, sdf_truncation_scale=0.0,
                    integration_weight_sample=1, virtual_voxel_size=0.01,
                    n_frames_invalidate_voxels=100, voxel_extents_scale=1,
                    gs_optimization_param_path="",
                    num_blocks=1 << 19, max_active_blocks=1 << 17,
                    max_alloc_per_frame=1 << 13)
    # bench-scale bucket sizing (occupancy <= ~45k): the O(capacity)
    # frustum compact dominates at the GeoWrapper default buckets=blocks
    gw.setHashNumBuckets(1 << 15)
    gw.setCamera(600.0, 600.0, 599.5, 339.5, rows, cols, 0.01, 30.0)

    rng = np.random.default_rng(0)
    rgb = np.asarray(rng.integers(0, 255, (rows, cols, 3)), np.uint8)
    orbit = 40

    cam0 = C.make_camera(fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                         rows=rows, cols=cols, min_depth=0.01, max_depth=30.0)

    t0 = time.time()
    for i in range(args.frames):
        th = 2.0 * np.pi * (i % orbit) / orbit
        rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.array([0.05 * np.sin(th), 0.02 * np.cos(th), 0.0], np.float32)
        # quaternion for setCurrPose: rotation about +y by th -> (x,y,z,w)
        q = np.array([0.0, np.sin(th / 2), 0.0, np.cos(th / 2)], np.float32)
        cam_i = C.with_pose(cam0, jnp.asarray(rot), jnp.asarray(t))
        depth = np.asarray(synthetic_room_depth(rows, cols, cam_i, rng))
        gw.setCurrPose(t, q)
        gw.setDepthImage(depth)
        gw.setRGBImage(rgb)
        gw.compute()
        if i % 10 == 0:
            print(f"# frame {i} @ {time.time()-t0:.0f}s", file=sys.stderr)
    occ = int(np.sum(np.asarray(gw.state.table.ptr) >= 0))
    print(f"# map built: {occ} blocks @ {time.time()-t0:.0f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    gw.extractMesh(args.out)
    dt = time.perf_counter() - t0
    n_vert = gw.mesh.vertices.shape[0]

    recs = [
        {"metric": "extract_mesh_s_replica_scale", "value": round(dt, 2),
         "unit": "s", "vs_baseline": None},
        {"metric": "extract_mesh_vertices_replica_scale", "value": n_vert,
         "unit": "vertices", "vs_baseline": None},
        {"metric": "extract_mesh_blocks_replica_scale", "value": occ,
         "unit": "blocks", "vs_baseline": None},
    ]
    for r in recs:
        print(json.dumps(r))

    path = os.path.join(os.path.dirname(__file__), "..",
                        "BENCH_STREAMING.json")
    try:
        with open(path) as f:
            cur = json.load(f)
    except (OSError, json.JSONDecodeError):
        cur = []
    cur = [r for r in cur if not r["metric"].startswith("extract_mesh")]
    cur.extend(recs)
    with open(path, "w") as f:
        json.dump(cur, f, indent=1)


if __name__ == "__main__":
    main()
