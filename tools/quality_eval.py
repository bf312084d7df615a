"""End-to-end reconstruction quality on a synthetic textured room at
Replica intrinsics (VERDICT r1 weak #5): runner-equivalent frame loop ->
extractMesh -> eval_reconstruction metrics vs the analytic room surface.

The scene is the bench's pose-consistent 6 m box room (bench.py) observed
over a full orbit at 1200x680 / 1 cm voxels / 7 cm truncation — the Replica
protocol settings.  Ground truth is an analytic uniform sampling of the box
walls.  Prints the metric rows and writes QUALITY.json at the repo root
(Chamfer-L1 / F-score / accuracy / completeness, ref protocol
apps/utils/eval_utils.py:8-139).

`run_quality` is importable (tests/test_quality.py runs the small protocol
in-suite with asserted thresholds).

Usage: python tools/quality_eval.py [--frames N] [--res small|replica]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

P_BLOCK = 8  # SDF_BLOCK_SIZE (virtual voxels per block side)

PRESETS = dict(
    # rows, cols, fx, voxel, truncation, num_blocks
    replica=(680, 1200, 600.0, 0.01, 0.07, 1 << 19),
    small=(120, 160, 80.0, 0.05, 0.15, 1 << 14),
)


def gt_box_points(half=3.0, n=2_000_000, seed=0):
    """Uniform samples of the box surface [-half, half]^3 (6 faces)."""
    rng = np.random.default_rng(seed)
    face = rng.integers(0, 6, n)
    u = rng.uniform(-half, half, n)
    v = rng.uniform(-half, half, n)
    s = np.where(face % 2 == 0, -half, half)
    pts = np.empty((n, 3), np.float64)
    ax = face // 2
    for a in range(3):
        m = ax == a
        o1, o2 = (a + 1) % 3, (a + 2) % 3
        pts[m, a] = s[m]
        pts[m, o1] = u[m]
        pts[m, o2] = v[m]
    return pts


# --------------------------------------------------------------------------
# cluttered procedural scene (round-2 VERDICT missing #1 / next-round #5):
# the 6 m room plus oblique boxes, spheres and a ramp — depth discontinuities
# exercise the two-band tile allocation, and the flat-wall/object seams
# exercise the multi-res boundary meshing (D1/D5/D6) when variance
# coarsening is on.  All surfaces are analytic: depth images AND ground
# truth come from the same closed-form geometry.
# --------------------------------------------------------------------------

def _rot_xyz(ax, ay, az):
    cx_, sx = np.cos(ax), np.sin(ax)
    cy_, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    Rx = np.array([[1, 0, 0], [0, cx_, -sx], [0, sx, cx_]])
    Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (Ry @ Rx @ Rz).astype(np.float64)


# (kind, center, param, rotation): param = half-extents for "obb",
# radius for "sphere".  Placed strictly inside the room, pairwise disjoint.
CLUTTER_OBJECTS = (
    ("obb", np.array([1.5, -1.8, 0.8]), np.array([0.6, 0.8, 0.45]),
     _rot_xyz(np.deg2rad(20), np.deg2rad(30), 0.0)),           # oblique crate
    ("obb", np.array([-1.4, -2.0, -0.9]), np.array([1.1, 0.35, 0.8]),
     _rot_xyz(0.0, 0.0, np.deg2rad(15))),                      # tilted ramp
    ("sphere", np.array([0.6, -1.2, -2.0]), 0.9, None),
    ("sphere", np.array([-2.0, 0.6, 1.6]), 0.6, None),
)


def _ray_hits(org, d_w):
    """Nearest positive hit distance against the clutter objects for rays
    org + t*d_w (org [3], d_w [...,3] unit).  Returns t (inf = miss)."""
    t_best = np.full(d_w.shape[:-1], np.inf)
    for kind, c, p, R in CLUTTER_OBJECTS:
        if kind == "sphere":
            oc = org - c
            b = 2.0 * (d_w @ oc)
            cq = float(oc @ oc) - p * p
            disc = b * b - 4.0 * cq
            ok = disc > 0
            sq = np.sqrt(np.maximum(disc, 0.0))
            t0 = (-b - sq) / 2.0
            t = np.where(ok & (t0 > 0), t0, np.inf)
        else:
            o = (org - c) @ R            # into box frame (R world<-box cols)
            d = d_w @ R
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = np.where(np.abs(d) > 1e-9, 1.0 / d, np.inf)
            t1 = (-p - o) * inv
            t2 = (p - o) * inv
            tn = np.max(np.minimum(t1, t2), axis=-1)
            tf = np.min(np.maximum(t1, t2), axis=-1)
            t = np.where((tn <= tf) & (tn > 0), tn, np.inf)
        t_best = np.minimum(t_best, t)
    return t_best


def clutter_scene_depth(rows, cols, cam, rng=None):
    """Analytic depth of the cluttered room for the camera pose (same ray
    construction as bench.synthetic_room_depth; objects occlude walls)."""
    import jax.numpy as jnp

    from mrhash_tpu.ops import camera as C
    r = jnp.arange(rows, dtype=jnp.float32)[:, None]
    c = jnp.arange(cols, dtype=jnp.float32)[None, :]
    rays = C.inverse_projection(cam, jnp.broadcast_to(r, (rows, cols)),
                                jnp.broadcast_to(c, (rows, cols)),
                                jnp.ones((rows, cols), jnp.float32))
    d_cam = np.asarray(rays / jnp.linalg.norm(rays, axis=-1, keepdims=True),
                       np.float64)
    rot = np.asarray(cam.rot, np.float64)
    d_w = d_cam @ rot.T
    org = np.asarray(cam.trans, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(d_w) > 1e-9, 1.0 / d_w, np.inf)
    t1 = (-3.0 - org) * inv
    t2 = (3.0 - org) * inv
    t_room = np.min(np.maximum(t1, t2), axis=-1)
    t_obj = _ray_hits(org, d_w)
    t = np.minimum(t_room, t_obj)
    depth = t * d_cam[..., 2]
    if rng is not None:
        depth = depth + rng.normal(0, 0.003, depth.shape) * (depth > 0)
    return np.clip(depth, 0.0, 29.0).astype(np.float32)


def _inside_any_object(pts, margin=0.0):
    inside = np.zeros(pts.shape[0], bool)
    for kind, c, p, R in CLUTTER_OBJECTS:
        if kind == "sphere":
            inside |= np.linalg.norm(pts - c, axis=1) < p + margin
        else:
            local = np.abs((pts - c) @ R)
            inside |= np.all(local < p + margin, axis=1)
    return inside


def gt_clutter_points(n=2_000_000, seed=0):
    """Uniform GT samples over the cluttered scene's surfaces: room walls
    (minus points inside objects) + object surfaces, area-weighted."""
    rng = np.random.default_rng(seed)
    areas = [6 * 6.0 ** 2]   # room walls
    for kind, c, p, R in CLUTTER_OBJECTS:
        if kind == "sphere":
            areas.append(4 * np.pi * p * p)
        else:
            areas.append(8 * (p[0] * p[1] + p[1] * p[2] + p[0] * p[2]))
    counts = (np.asarray(areas) / sum(areas) * n).astype(int)

    parts = [gt_box_points(3.0, counts[0], seed)]
    for (kind, c, p, R), m in zip(CLUTTER_OBJECTS, counts[1:]):
        if kind == "sphere":
            v = rng.normal(size=(m, 3))
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            parts.append(c + p * v)
        else:
            face = rng.integers(0, 6, m)
            u = rng.uniform(-1, 1, m)
            w = rng.uniform(-1, 1, m)
            s = np.where(face % 2 == 0, -1.0, 1.0)
            loc = np.empty((m, 3))
            ax = face // 2
            for a in range(3):
                msk = ax == a
                o1, o2 = (a + 1) % 3, (a + 2) % 3
                loc[msk, a] = s[msk]
                loc[msk, o1] = u[msk]
                loc[msk, o2] = w[msk]
            parts.append(c + (loc * p) @ R.T)
    pts = np.concatenate(parts)
    # objects are placed strictly inside the room and pairwise disjoint, so
    # surface samples are all real surface; the strict-interior filter
    # (negative margin keeps each object's own surface) is a guard against
    # future placement edits
    return pts[~_inside_any_object(pts, margin=-1e-4)]


def cull_to_visible(gt, poses, cam0, rows, cols, tol=0.03):
    """Occlusion-aware GT culling for the cluttered scene: a point counts
    as observed only if some frame actually SEES it (its projected depth
    matches the analytic depth image at its pixel within tol) — position-
    only frustum culling would count object backsides and wall patches
    hidden behind furniture as 'missing' reconstruction."""
    import jax.numpy as jnp

    from mrhash_tpu.ops import camera as C
    fx = float(cam0.fx)
    cx = float(cam0.cx)
    cy = float(cam0.cy)
    seen = np.zeros(gt.shape[0], bool)
    for rot, t in poses:
        cam = C.with_pose(cam0, jnp.asarray(rot), jnp.asarray(t))
        dimg = clutter_scene_depth(rows, cols, cam)
        pc = (gt - t) @ rot
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            col = np.round(fx * pc[:, 0] / z + cx).astype(np.int64)
            row = np.round(fx * pc[:, 1] / z + cy).astype(np.int64)
        inb = (z > 0.01) & (row >= 0) & (col >= 0) & (row < rows) & (
            col < cols)
        rs = np.where(inb, row, 0)
        cs = np.where(inb, col, 0)
        seen |= inb & (np.abs(dimg[rs, cs] - z) < tol)
    return gt[seen]


def cull_to_observed(gt, poses, fx, cx, cy, rows, cols, max_depth):
    """Keep GT points that land inside at least one frame's frustum: the
    orbit trajectory never looks at the floor/ceiling, and completeness
    against unobserved surface is a protocol artifact, not a
    reconstruction error (the reference's datasets observe ~everything)."""
    seen = np.zeros(gt.shape[0], bool)
    for rot, t in poses:
        pc = (gt - t) @ rot  # world -> cam (rot is cam-to-world)
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            col = fx * pc[:, 0] / z + cx
            row = fx * pc[:, 1] / z + cy
        seen |= ((z > 0.01) & (z < max_depth) & (row >= 0) & (col >= 0)
                 & (row < rows) & (col < cols))
    return gt[seen]


def run_quality(frames=40, res="replica", n_eval_points=2_000_000,
                mesh_path="/tmp/quality_mesh.ply", write_json=True,
                scene="box", multires=False, extract_mode="sweep",
                var_threshold=1.0, min_weight=2):
    """Integrate a full orbit of the scene ("box" = empty 6 m room,
    "clutter" = room + oblique boxes/spheres/ramp), extract the mesh,
    evaluate vs analytic GT.  multires=True turns variance coarsening on
    (exercises the mixed-resolution boundary meshing, D1/D5/D6).  Returns
    the metric rows."""
    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from bench import synthetic_room_depth
    from mrhash_tpu.apps import eval_utils
    from mrhash_tpu.apps.eval_reconstruction import read_mesh_ply
    from mrhash_tpu.geowrapper import GeoWrapper
    from mrhash_tpu.ops import camera as C

    rows, cols, fx, vvs, trunc, num_blocks = PRESETS[res]

    gw = GeoWrapper(sdf_truncation=trunc, sdf_truncation_scale=0.0,
                    integration_weight_sample=1, virtual_voxel_size=vvs,
                    n_frames_invalidate_voxels=0, voxel_extents_scale=1,
                    gs_optimization_param_path="", num_blocks=num_blocks,
                    sdf_var_threshold=var_threshold if multires else 0.0,
                    min_weight_threshold=min_weight)
    if res == "replica":
        # bench-scale bucket sizing (occupancy <= ~60k; the O(capacity)
        # frustum compact dominates at the default buckets=blocks)
        gw.setHashNumBuckets(1 << 15)
    gw.setCamera(fx, fx, cols / 2 - 0.5, rows / 2 - 0.5, rows, cols,
                 0.01, 30.0)

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (rows, cols, 3)).astype(np.uint8)
    n = frames
    t0 = time.perf_counter()
    poses = []
    for i in range(n):
        th = 2.0 * np.pi * i / n
        rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.array([0.05 * np.sin(th), 0.02 * np.cos(th), 0.0], np.float32)
        poses.append((rot, t))
        q = _rot_to_quat(rot)
        gw.setCurrPose(t, q)
        cam = C.with_pose(gw.camera, rot, t)
        if scene == "clutter":
            depth = clutter_scene_depth(rows, cols, cam, rng)
        else:
            depth = np.asarray(synthetic_room_depth(rows, cols, cam, rng))
        gw.setDepthImage(depth)
        gw.setRGBImage(rgb)
        gw.compute()
    print(f"# integrated {n} frames in {time.perf_counter()-t0:.1f}s, "
          f"occupied {gw._last_occupied}", file=sys.stderr)

    t0 = time.perf_counter()
    if extract_mode == "resident":
        # everything is resident in this protocol (no streaming happened):
        # extract straight from the device map, skipping the chunk-sweep
        # stream-out/in passes (covered by the box-scene sweep test; ~9 min
        # on the CPU small preset)
        from mrhash_tpu.core import mesh_post
        from mrhash_tpu.utils import plyio
        gw._flush_resident()
        tri_pos, tri_col = gw._extract_resident()
        m = mesh_post.MeshAccumulator()
        if tri_pos.shape[0]:
            m.add_triangles(tri_pos, tri_col)
        plyio.write_mesh_ply(mesh_path, m.vertices, m.faces, m.colors)
    else:
        gw.extractMesh(mesh_path)
    print(f"# extract[{extract_mode}] took {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    verts, faces = read_mesh_ply(mesh_path)
    est = eval_utils.sample_mesh_points(verts, faces, n_eval_points)
    if scene == "clutter":
        gt = gt_clutter_points(n_eval_points)
        gt = cull_to_visible(gt, poses, gw.camera, rows, cols)
    else:
        gt = gt_box_points(3.0, n_eval_points)
        gt = cull_to_observed(gt, poses, fx, cols / 2 - 0.5, rows / 2 - 0.5,
                              rows, cols, 30.0)
    print(f"# observed GT points: {gt.shape[0]}/{n_eval_points}",
          file=sys.stderr)
    rows_m = eval_utils.evaluate_reconstruction(est, gt)
    for r in rows_m:
        print(json.dumps(r))

    recall_miss_diag = None
    if multires:
        # recall-miss diagnosis (round-3 VERDICT next #4): bucket GT points
        # with no mesh within 5 cm by the RESOLUTION of the block that owns
        # them in the final map (host chunk grid), separating "coarse
        # region meshed poorly" from "region never allocated".
        d_gt = eval_utils.nn_distances(gt, est)
        missed = gt[d_gt > 0.05]
        grid = gw.streamer.grid
        pos_all, res_all = [], []
        for g in grid.chunks.values():
            pos_all.append(g["pos"])
            res_all.append(g["res"])
        if pos_all:
            pos_all = np.concatenate(pos_all)
            res_all = np.concatenate(res_all)
            res_of = {tuple(p): int(r) for p, r in zip(pos_all, res_all)}
            bs = P_BLOCK * vvs
            keys = np.floor(missed / bs).astype(np.int64)
            buckets = {0: 0, 1: 0, -1: 0}
            boundary0 = 0   # res-0 owners with a res-1 face neighbor:
            #                 cross-resolution cell rejection territory
            nbrs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                    (0, 0, 1), (0, 0, -1)]
            for k in keys:
                r = res_of.get(tuple(k), -1)
                buckets[r] += 1
                if r == 0 and any(
                        res_of.get((k[0] + dx, k[1] + dy, k[2] + dz), 0) == 1
                        for dx, dy, dz in nbrs):
                    boundary0 += 1
            n_res1 = int((res_all == 1).sum())
            print(f"# recall-miss diagnosis: {missed.shape[0]} GT points "
                  f">5cm from mesh; owner res0={buckets[0]} "
                  f"(of which res1-adjacent {boundary0}) "
                  f"res1={buckets[1]} unallocated={buckets[-1]}; map has "
                  f"{n_res1}/{res_all.shape[0]} res-1 blocks",
                  file=sys.stderr)
            # published next to the metrics (round-4 VERDICT next #5)
            recall_miss_diag = dict(
                missed_gt_points=int(missed.shape[0]),
                owner_res0=int(buckets[0]),
                owner_res0_res1_adjacent=int(boundary0),
                owner_res1=int(buckets[1]),
                unallocated=int(buckets[-1]),
                res1_blocks=n_res1, total_blocks=int(res_all.shape[0]))
    if write_json and res != "replica":
        print("# small preset: not writing QUALITY.json (committed artifact "
              "is replica-res only)", file=sys.stderr)
        write_json = False
    if write_json:
        name = ("box_room_6m" if scene == "box" else "clutter_room_6m")
        entry = dict(scene=name, multires=bool(multires),
                     resolution=f"{cols}x{rows}", voxel=vvs, frames=n,
                     vertices=int(verts.shape[0]), metrics=rows_m)
        if recall_miss_diag is not None:
            entry["recall_miss_diag"] = recall_miss_diag
        path = os.path.join(os.path.dirname(__file__), "..", "QUALITY.json")
        try:
            with open(path) as f:
                cur = json.load(f)
        except (OSError, json.JSONDecodeError):
            cur = {}
        scenes = cur.get("scenes", [])
        if not scenes and "metrics" in cur:   # migrate the old single-scene
            cur.setdefault("scene", "box_room_6m")
            cur["multires"] = cur.get("multires", False)
            scenes = [cur]
        scenes = [s for s in scenes
                  if not (s.get("scene") == name
                          and s.get("multires", False) == bool(multires))]
        scenes.append(entry)
        with open(path, "w") as f:
            json.dump({"scenes": scenes}, f, indent=1)
    return rows_m


def _rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:
        x, y, z = 1.0, 0.0, 0.0
    return np.array([x, y, z, w], np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--res", default="replica", choices=list(PRESETS))
    ap.add_argument("--n-eval-points", type=int, default=2_000_000)
    ap.add_argument("--scene", default="box", choices=("box", "clutter"))
    ap.add_argument("--multires", action="store_true")
    ap.add_argument("--var-threshold", type=float, default=1.0)
    ap.add_argument("--min-weight", type=int, default=2)
    ap.add_argument("--no-json", action="store_true")
    args = ap.parse_args()
    run_quality(args.frames, args.res, args.n_eval_points,
                scene=args.scene, multires=args.multires,
                var_threshold=args.var_threshold, min_weight=args.min_weight,
                write_json=not args.no_json)


if __name__ == "__main__":
    main()
