"""Streaming + checkpoint tests, mirroring tests/test_streamer.cu:40-117
(circular trajectory, duplicate-ratio audit) and
tests/test_grid_serializer.cu:34-156 (exact serialize round trip)."""
import os

import jax.numpy as jnp
import numpy as np

from mrhash_tpu import params as P
from mrhash_tpu.core import pipeline
from mrhash_tpu.core.state import MapConfig, make_state
from mrhash_tpu.core.streaming import Streamer
from mrhash_tpu.ops import camera as C

ROWS, COLS = 32, 48


def make_setup():
    cfg = MapConfig(virtual_voxel_size=0.05, sdf_truncation=0.15,
                    max_integration_distance=6.0, num_blocks=8192,
                    max_active_blocks=8192, max_alloc_per_frame=2048,
                    voxel_extents=(1.0, 1.0, 1.0))
    cam = C.make_camera(fx=30.0, fy=30.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.01, max_depth=4.0)
    return cfg, cam


def circular_pose(step, n_steps, r=2.0):
    """test_utils.cuh:20-32 — camera on a circle looking outward."""
    th = 2 * np.pi * step / n_steps
    fwd = np.array([np.cos(th), np.sin(th), 0.0])
    t = r * fwd
    z = fwd
    x = np.array([-np.sin(th), np.cos(th), 0.0])
    y = np.cross(z, x)
    rot = np.stack([x, y, z], axis=1)
    return jnp.asarray(rot, jnp.float32), jnp.asarray(t, jnp.float32)


def run_trajectory(cfg, cam, state, streamer, n_steps=12, radius=3.0):
    depth = jnp.full((ROWS, COLS), 2.5, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 100, jnp.uint8)
    for i in range(n_steps):
        rot, t = circular_pose(i, n_steps)
        cam_i = C.with_pose(cam, rot, t)
        state = streamer.stream(state, np.asarray(t), radius)
        state, stats = pipeline.integrate_rgbd(cfg, state, cam_i, depth, rgb)
    return state


def test_stream_cycle_duplicate_audit():
    cfg, cam = make_setup()
    state = make_state(cfg.num_blocks)
    streamer = Streamer(cfg, staging_size=4096)
    state = run_trajectory(cfg, cam, state, streamer)
    # device-vs-RAM duplicates are inherent to the sphere-based reload policy
    # (a re-allocated frustum block may still have a stale RAM copy); the
    # reference audits this at <0.15 (test_streamer.cu:115)
    assert streamer.duplicate_ratio(state) < 0.15

    # streaming everything out empties the device; fresh copies supersede
    # stale RAM copies, so the grid ends duplicate-free
    state = streamer.stream_all_out(state)
    assert int((state.table.ptr != P.FREE_ENTRY).sum()) == 0
    assert int(state.table.high_count) == cfg.num_blocks
    assert streamer.duplicate_ratio(state) == 0.0
    # no intra-chunk duplicate keys either
    for g in streamer.grid.chunks.values():
        assert np.unique(g["pos"], axis=0).shape[0] == g["pos"].shape[0]


def test_budgeted_eviction_takes_farthest():
    """plan_evictions budget mode: a trigger must recover the heap in ONE
    event by evicting the `budget` FARTHEST blocks beyond the protect
    radius, keeping every nearer candidate resident (the fixed-radius
    shell policy thrashes at seconds-per-trigger link costs — deviation
    documented in plan_evictions)."""
    cfg, cam = make_setup()
    state = make_state(cfg.num_blocks)
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)
    # build a map at several forward offsets: blocks spread 0..6 m in z
    for k in range(4):
        rot = jnp.eye(3, dtype=jnp.float32)
        t = jnp.asarray([0.0, 0.0, 1.5 * k], jnp.float32)
        state, _ = pipeline.integrate_rgbd(cfg, state, C.with_pose(cam, rot,
                                                                   t),
                                           depth, rgb)
    occ0 = int((np.asarray(state.table.ptr) != P.FREE_ENTRY).sum())
    cam_pos = np.asarray([0.0, 0.0, 6.0])  # camera at the far end
    protect = 1.0
    st = Streamer(cfg, 1024)
    # distances of all occupied blocks before eviction
    from mrhash_tpu.ops import coords as X
    pos = np.asarray(state.table.pos)
    occm = np.asarray(state.table.ptr) != P.FREE_ENTRY
    pw = np.asarray(X.sdf_block_to_world_point(
        cfg.virtual_voxel_size, jnp.asarray(pos)))
    dist = np.linalg.norm(pw - cam_pos, axis=-1)
    cand = occm & (dist >= protect)
    budget = int(cand.sum()) // 3
    assert budget > 10

    state2 = st.stream_out(state, cam_pos, protect, budget=budget)
    occ_after = np.asarray(state2.table.ptr) != P.FREE_ENTRY
    evicted = occm & ~occ_after
    n_ev = int(evicted.sum())
    # took ~budget blocks (ties may admit a few extra)
    assert budget <= n_ev <= budget + 32, (budget, n_ev)
    # they are the farthest: every evicted block is at least as far as
    # every surviving candidate (up to float ties)
    if (cand & ~evicted).any():
        min_ev = dist[evicted].min()
        max_keep = dist[cand & ~evicted].max()
        assert min_ev >= max_keep - 1e-5, (min_ev, max_keep)
    # nothing inside the protect radius was touched
    assert not (evicted & (dist < protect)).any()
    # evicted blocks landed in the host grid
    assert st.grid.num_blocks() == n_ev
    # conservation: heap free + occupied == capacity
    assert (int(state2.table.high_count)
            + int(occ_after.sum())) == cfg.num_blocks
    assert occ0 - n_ev == int(occ_after.sum())


def test_stream_out_in_roundtrip_preserves_voxels():
    cfg, cam = make_setup()
    state = make_state(cfg.num_blocks)
    streamer = Streamer(cfg, staging_size=512)  # force multi-pass staging
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 50, jnp.uint8)
    state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)

    occ = np.asarray(state.table.ptr) != P.FREE_ENTRY
    pos0 = np.asarray(state.table.pos)[occ]
    # record voxel content keyed by block position
    def snapshot(state):
        occ = np.asarray(state.table.ptr) != P.FREE_ENTRY
        pos = np.asarray(state.table.pos)[occ]
        ptr = np.asarray(state.table.ptr)[occ]
        lanes = np.arange(P.TOTAL_SDF_BLOCK_SIZE)
        sdf = np.asarray(state.pool.sdf).reshape(-1)[ptr[:, None] + lanes]
        w = np.asarray(state.pool.weight).reshape(-1)[ptr[:, None] + lanes]
        order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
        return pos[order], sdf[order], w[order]

    p0, s0, w0 = snapshot(state)
    state = streamer.stream_all_out(state)
    state = streamer.stream_in(state, np.zeros(3), 1e6)
    p1, s1, w1 = snapshot(state)
    assert np.array_equal(p0, p1)
    assert np.array_equal(s0, s1)
    assert np.array_equal(w0, w1)


def test_grid_serializer_roundtrip(tmp_path):
    cfg, cam = make_setup()
    state = make_state(cfg.num_blocks)
    streamer = Streamer(cfg, staging_size=4096)
    state = run_trajectory(cfg, cam, state, streamer, n_steps=6)
    state = streamer.stream_all_out(state)

    path = os.path.join(tmp_path, "grid.npz")
    streamer.serialize_grid(path)

    streamer2 = Streamer(cfg, staging_size=4096)
    streamer2.deserialize_grid(path)
    assert set(streamer2.grid.chunks) == set(streamer.grid.chunks)
    for key in streamer.grid.chunks:
        a, b = streamer.grid.chunks[key], streamer2.grid.chunks[key]
        # exact per-voxel equality of the whole grid
        # (test_grid_serializer.cu:124-155)
        order_a = np.lexsort(tuple(a["pos"].T))
        order_b = np.lexsort(tuple(b["pos"].T))
        for k in a:
            assert np.array_equal(a[k][order_a], b[k][order_b]), (key, k)


def test_serialize_data_ply(tmp_path):
    cfg, cam = make_setup()
    state = make_state(cfg.num_blocks)
    streamer = Streamer(cfg, staging_size=4096)
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 50, jnp.uint8)
    state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)
    state = streamer.stream_all_out(state)

    fh = os.path.join(tmp_path, "hash.ply")
    fv = os.path.join(tmp_path, "voxel.ply")
    streamer.serialize_data(fh, fv)
    from mrhash_tpu.utils.plyio import read_points_ply
    hp, _ = read_points_ply(fh)
    vp, props = read_points_ply(fv)
    assert hp.shape[0] == streamer.grid.num_blocks()
    assert vp.shape[0] > 0
    assert "weight" in props and "sdf" in props
    # voxel points sit near the wall depth
    assert abs(np.median(vp[:, 2]) - 2.0) < 0.5


def test_multires_deserialize_into_fresh_map(tmp_path):
    """Coarse (res-1) blocks must survive a checkpoint -> fresh-container ->
    stream-in cycle: the fresh map's low heap starts empty (low_count=0), so
    insert_blocks must refill it by splitting high blocks (allocateMemoryLow
    semantics) instead of silently dropping every res-1 block."""
    import dataclasses
    cfg, cam = make_setup()
    cfg = dataclasses.replace(cfg, sdf_var_threshold=10.0)  # coarsen a lot
    state = make_state(cfg.num_blocks)
    streamer = Streamer(cfg, staging_size=4096)
    rng = np.random.default_rng(3)
    rgb = jnp.full((ROWS, COLS, 3), 100, jnp.uint8)
    rot, t = circular_pose(0, 12)
    cam0 = C.with_pose(cam, rot, t)
    for _ in range(4):  # frame>0 triggers coarsening; tiny noise -> 0<var<thr
        depth = jnp.asarray(2.5 + rng.normal(0, 0.002, (ROWS, COLS)),
                            jnp.float32)
        state, _ = pipeline.integrate_rgbd(cfg, state, cam0, depth, rgb)
    res_before = int(np.sum((np.asarray(state.table.res) == 1)
                            & (np.asarray(state.table.ptr) != P.FREE_ENTRY)))
    assert res_before > 0, "scene did not coarsen; test setup broken"

    state = streamer.stream_all_out(state)
    path = str(tmp_path / "grid.npz")
    streamer.serialize_grid(path)

    # fresh container + streamer (low heap empty)
    state2 = make_state(cfg.num_blocks)
    streamer2 = Streamer(cfg, staging_size=4096)
    streamer2.deserialize_grid(path)
    n_ram = streamer2.grid.num_blocks()
    state2 = streamer2.stream_in(state2, np.asarray(t), 100.0)

    occ = np.asarray(state2.table.ptr) != P.FREE_ENTRY
    res1 = int(np.sum((np.asarray(state2.table.res) == 1) & occ))
    assert res1 == res_before, (res1, res_before)
    # nothing lost: resident + still-in-RAM == checkpointed
    assert int(occ.sum()) + streamer2.grid.num_blocks() == n_ram


def test_packed_transfer_extreme_values_roundtrip():
    """pack_evicted_pass's single-buffer encoding (sdf/sumsq bit-cast,
    weight riding rgb's spare byte) must be exact at the extremes:
    weight == 255 (the u8 cap), rgb == 0xFFFFFF, negative/denormal sdf."""
    import jax
    from mrhash_tpu.core import streaming as S
    from mrhash_tpu.ops import hashtable as H

    cfg, cam = make_setup()
    state = make_state(cfg.num_blocks)
    n = 17
    pos = np.stack([np.arange(n), np.zeros(n), -np.arange(n)],
                   1).astype(np.int32)
    table, info = H.insert(state.table, jnp.asarray(pos),
                           jnp.ones((n,), bool), jnp.zeros((n,), jnp.int32))
    rows = np.asarray(info["ptr"]) // P.TOTAL_SDF_BLOCK_SIZE
    sdf = np.full((cfg.num_blocks, 512), -1e-38, np.float32)
    sdf[:, 0] = -0.07
    ssq = np.full((cfg.num_blocks, 512), 3.402e38, np.float32)
    w = np.full((cfg.num_blocks, 512), 255, np.int32)
    rgbp = np.full((cfg.num_blocks, 512), 0xFFFFFF, np.int32)
    pool = state.pool.replace(sdf=jnp.asarray(sdf), sumsq=jnp.asarray(ssq),
                              weight=jnp.asarray(w), rgbp=jnp.asarray(rgbp))

    staging = 8  # force multiple passes incl. a partial last one
    t2, n_evict, pos_all, res_all, ptr_all = S.plan_evictions(
        cfg, table, jnp.zeros(3, jnp.float32), jnp.float32(0.0),
        jnp.asarray(True))
    assert int(n_evict) == n
    got = {}
    p = pool
    for off in range(0, n, staging):
        p, buf = S.pack_evicted_pass(cfg, staging, p, pos_all, res_all,
                                     ptr_all, n_evict, jnp.int32(off))
        k = min(staging, n - off)
        ph, rh, sh, qh, wh, ch = S.unpack_transfer(np.asarray(buf[:k]))
        for i in range(k):
            got[tuple(ph[i])] = (sh[i], qh[i], wh[i], ch[i])
    assert len(got) == n
    for i in range(n):
        s_i, q_i, w_i, c_i = got[tuple(pos[i])]
        r = rows[i]
        np.testing.assert_array_equal(s_i, sdf[r])
        np.testing.assert_array_equal(q_i, ssq[r])
        np.testing.assert_array_equal(w_i, np.full(512, 255))
        np.testing.assert_array_equal(c_i, np.full(512, 0xFFFFFF))
    # the gathered rows were zero-cleared on the way out
    assert float(jnp.sum(jnp.abs(p.sdf[jnp.asarray(rows)]))) == 0.0
