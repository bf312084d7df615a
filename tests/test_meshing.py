"""Marching-cubes extraction quality: integrate a synthetic wall, extract,
check the mesh is the right plane (the RMSE-style check BASELINE.md targets).
Also unit tests for the host dedup/merge (tests/test_marching_cubes.cpp)."""
import jax.numpy as jnp
import numpy as np

from mrhash_tpu.core import mesh_post, pipeline
from mrhash_tpu.core.state import MapConfig, make_state
from mrhash_tpu.ops import camera as C
from mrhash_tpu.ops import integrate as I
from mrhash_tpu.ops import meshing as M

ROWS, COLS = 48, 64


def cfg_cam():
    cfg = MapConfig(virtual_voxel_size=0.05, sdf_truncation=0.15,
                    max_integration_distance=5.0, num_blocks=4096,
                    max_active_blocks=4096, max_alloc_per_frame=2048,
                    min_weight_threshold=1, marching_cubes_threshold=1.5)
    cam = C.make_camera(fx=40.0, fy=40.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.01, max_depth=5.0)
    return cfg, cam


def test_wall_mesh_plane():
    cfg, cam = cfg_cam()
    state = make_state(cfg.num_blocks)
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)
    for _ in range(3):
        state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)

    slots, count, bpos, bptr, bres, bvalid = I.compact_active(
        cfg, state.table)
    tri_pos, tri_col, n_tri = M.extract_iso_surface(
        cfg, state.table, state.pool, bpos, bptr, bres, bvalid,
        max_cells=1 << 15, max_triangles=1 << 15)
    n = int(n_tri)
    assert n > 50

    verts = np.asarray(tri_pos)[:n].reshape(-1, 3)
    # all triangle vertices lie on the z=2 wall (within ~half a voxel; the
    # projective SDF ray obliquity adds a little slack at the image borders)
    z = verts[:, 2]
    assert abs(np.median(z) - 2.0) < 0.5 * cfg.virtual_voxel_size
    rmse = np.sqrt(np.mean((z - 2.0) ** 2))
    assert rmse < cfg.virtual_voxel_size, rmse

    # colors interpolate around the constant input color
    cols = np.asarray(tri_col)[:n].reshape(-1, 3)
    assert np.all(cols >= 0) and np.all(cols <= 255)
    assert abs(np.median(cols) - 128) < 16

    # the wall spans a reasonable extent of the frustum
    assert np.ptp(verts[:, 0]) > 1.0 and np.ptp(verts[:, 1]) > 0.8


def test_ring_extraction_matches_legacy_on_multires():
    """The 27-ring lookup cache (M.build_ring) must reproduce the per-point
    probe-lookup extraction BIT-FOR-BIT on a mixed-resolution map — the
    hard case: coarse neighbors, cross-resolution trilinear blends, and
    checkVertexVoxels shrinks all resolve through the ring."""
    import dataclasses

    cfg, cam = cfg_cam()
    cfg = dataclasses.replace(cfg, sdf_var_threshold=0.5)
    state = make_state(cfg.num_blocks)
    rng = np.random.default_rng(7)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)
    for f in range(4):
        depth = jnp.asarray(2.0 + rng.normal(0, 0.004, (ROWS, COLS)),
                            jnp.float32)
        state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)

    slots, count, bpos, bptr, bres, bvalid = I.compact_active(
        cfg, state.table)
    assert bool((np.asarray(bres)[np.asarray(bvalid)] == 1).any()), \
        "no coarse blocks; fixture broken"

    pf, gate, total, ring = M.gate_cells(cfg, state.table, state.pool,
                                         bpos, bptr, bres, bvalid)
    pf0, gate0 = M.cell_gate(cfg, state.table, state.pool, bpos, bptr,
                             bres, bvalid, ring=None)
    assert np.array_equal(np.asarray(gate), np.asarray(gate0))
    assert np.allclose(np.asarray(pf), np.asarray(pf0))

    args = (cfg, state.table, state.pool, pf, gate, None, 1 << 14, 1 << 15)
    p1, c1, n1 = M.extract_cell_batch(*args, ring=ring, bpos=bpos)
    p0, c0, n0 = M.extract_cell_batch(*args)
    assert int(n1) == int(n0) and int(n0) > 0
    assert np.array_equal(np.asarray(p1), np.asarray(p0))
    assert np.array_equal(np.asarray(c1), np.asarray(c0))


def test_trilinear_on_wall():
    cfg, cam = cfg_cam()
    state = make_state(cfg.num_blocks)
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)
    state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)

    # sample SDF along the central ray: positive before the wall, ~0 at it
    pts = jnp.asarray([[0.0, 0.0, 1.93], [0.0, 0.0, 2.0]], jnp.float32)
    dist, ok = M.trilinear_interpolation(cfg, state.table, state.pool, pts)
    assert bool(ok.all())
    assert float(dist[0]) > 0.0
    assert abs(float(dist[1])) < 0.55 * cfg.virtual_voxel_size


def test_native_host_extract_matches_device():
    """The native host Transvoxel sweep (native/mrhash_mesh.cpp) must
    reproduce the device sweep's triangle set on a mixed-resolution map —
    same cell gate, checkVertexVoxels shrinks, cross-resolution trilinear
    blends, and vertexInterp, in host C++ over the streamed payload."""
    import dataclasses

    import pytest

    from mrhash_tpu import native
    if native.load() is None:
        pytest.skip("native toolchain unavailable")
    from mrhash_tpu.core.streaming import ChunkGrid, Streamer

    cfg, cam = cfg_cam()
    cfg = dataclasses.replace(cfg, sdf_var_threshold=0.5)
    state = make_state(cfg.num_blocks)
    rng = np.random.default_rng(7)
    rgb_vals = np.clip(128 + rng.normal(0, 30, (ROWS, COLS, 3)), 0, 255)
    rgb = jnp.asarray(rgb_vals, jnp.uint8)
    for f in range(4):
        depth = jnp.asarray(2.0 + rng.normal(0, 0.004, (ROWS, COLS)),
                            jnp.float32)
        state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)

    # ---- device sweep (all gated cells, batched)
    slots, count, bpos, bptr, bres, bvalid = I.compact_active(
        cfg, state.table)
    assert bool((np.asarray(bres)[np.asarray(bvalid)] == 1).any())
    pf, gate, total, ring = M.gate_cells(cfg, state.table, state.pool,
                                         bpos, bptr, bres, bvalid)
    total = int(total)
    max_cells = 1 << 14
    dev_pos, dev_col = [], []
    for coff in range(0, total, max_cells):
        p, c, n = M.extract_cell_batch(cfg, state.table, state.pool, pf,
                                       gate, jnp.int32(coff), max_cells,
                                       1 << 15, ring=ring, bpos=bpos)
        n = int(n)
        dev_pos.append(np.asarray(p)[:n])
        dev_col.append(np.asarray(c)[:n])
    dev_pos = np.concatenate(dev_pos)
    dev_col = np.concatenate(dev_col)
    assert dev_pos.shape[0] > 0

    # ---- host sweep over the read-only snapshot
    st = Streamer(cfg, staging_size=1024)
    grid = ChunkGrid(np.asarray(cfg.voxel_extents, np.float32))
    st.snapshot_into(state, grid)
    groups = list(grid.chunks.values())
    blocks = {k: np.concatenate([g[k] for g in groups])
              for k in ("pos", "res", "sdf", "w", "rgb")}
    host_pos, host_col = native.extract_mesh_host(
        blocks["pos"], blocks["res"], blocks["sdf"], blocks["w"],
        blocks["rgb"], cfg.virtual_voxel_size, cfg.voxel_extents,
        cfg.marching_cubes_threshold, cfg.min_weight_threshold)

    assert host_pos.shape[0] == dev_pos.shape[0], (
        host_pos.shape, dev_pos.shape)
    # triangle multiset parity: nearest 9-dim match (vertex order within a
    # triangle is deterministic in both paths; block order is not)
    from scipy.spatial import cKDTree
    tree = cKDTree(host_pos.reshape(-1, 9).astype(np.float64))
    dist, idx = tree.query(dev_pos.reshape(-1, 9).astype(np.float64))
    assert np.max(dist) < 1e-3, np.max(dist)
    assert np.unique(idx).size == idx.size  # a bijection, not a collapse
    col_err = np.max(np.abs(dev_col.reshape(-1, 9)
                            - host_col.reshape(-1, 9)[idx]))
    assert col_err < 0.5, col_err


def test_mesh_accumulator_dedup():
    acc = mesh_post.MeshAccumulator(0.0)
    # two triangles sharing an edge -> 4 unique vertices
    t1 = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float64)
    t2 = np.array([[[1, 0, 0], [1, 1, 0], [0, 1, 0]]], np.float64)
    c = np.full((1, 3, 3), 10.0)
    acc.add_triangles(np.concatenate([t1, t2]), np.concatenate([c, c]))
    assert acc.vertices.shape[0] == 4
    assert acc.faces.shape[0] == 2
    # re-adding the same triangles changes nothing (duplicate faces removed)
    acc.add_triangles(t1, c)
    assert acc.vertices.shape[0] == 4
    assert acc.faces.shape[0] == 2


def test_mesh_accumulator_epsilon_merge():
    acc = mesh_post.MeshAccumulator(0.1)
    t1 = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float64)
    # vertex jittered by < eps merges; triangle becomes degenerate duplicate
    t2 = np.array([[[0.001, 0.001, 0.0], [1.001, 0.0, 0.0], [0, 1, 0]]],
                  np.float64)
    c = np.full((1, 3, 3), 10.0)
    acc.add_triangles(np.concatenate([t1, t2]),
                      np.concatenate([c, c]))
    assert acc.vertices.shape[0] == 3
    assert acc.faces.shape[0] == 1


def test_mesh_accumulator_degenerate_filter():
    acc = mesh_post.MeshAccumulator(0.0)
    t = np.array([[[0, 0, 0], [0, 0, 0], [0, 1, 0]]], np.float64)  # collapsed
    acc.add_triangles(t, np.zeros((1, 3, 3)))
    assert acc.faces.shape[0] == 0
