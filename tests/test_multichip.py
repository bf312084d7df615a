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
