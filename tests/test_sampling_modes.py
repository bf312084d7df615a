"""The three image-sampling paths must agree: gather (default), patch
(one-hot einsum), pallas (interpreter on CPU)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from mrhash_tpu.core import pipeline
from mrhash_tpu.core.state import MapConfig, make_state
from mrhash_tpu.ops import camera as C

ROWS, COLS = 48, 64


def run(sample_mode, interpret=False):
    cfg = MapConfig(virtual_voxel_size=0.05, sdf_truncation=0.15,
                    max_integration_distance=5.0, num_blocks=4096,
                    max_active_blocks=4096, max_alloc_per_frame=2048,
                    sample_mode=sample_mode, pallas_interpret=interpret)
    cam = C.make_camera(fx=40.0, fy=40.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.01, max_depth=5.0)
    rng = np.random.default_rng(0)
    state = make_state(cfg.num_blocks)
    depth = jnp.asarray(2.0 + rng.normal(0, 0.01, (ROWS, COLS)), jnp.float32)
    rgb = jnp.asarray(rng.integers(0, 255, (ROWS, COLS, 3)), jnp.uint8)
    for _ in range(2):
        state, stats = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)
    return state


def _content(state):
    from mrhash_tpu import params as P
    occ = np.asarray(state.table.ptr) != P.FREE_ENTRY
    pos = np.asarray(state.table.pos)[occ]
    ptr = np.asarray(state.table.ptr)[occ]
    order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    lanes = np.arange(P.TOTAL_SDF_BLOCK_SIZE)
    sdf = np.asarray(state.pool.sdf).reshape(-1)[ptr[:, None] + lanes]
    w = np.asarray(state.pool.weight).reshape(-1)[ptr[:, None] + lanes]
    rgb = np.asarray(state.pool.rgbp).reshape(-1)[ptr[:, None] + lanes]
    return pos[order], sdf[order], w[order], rgb[order]


def test_patch_matches_gather():
    pg, sg, wg, cg = _content(run("gather"))
    pp, sp, wp, cp = _content(run("patch"))
    assert np.array_equal(pg, pp)
    assert np.array_equal(wg, wp)
    assert np.allclose(sg, sp, atol=1e-6)
    assert np.array_equal(cg, cp)


def test_pallas_matches_gather():
    """The production TPU default (sample_mode='pallas', geowrapper.py) run
    through the kernel interpreter must bit-match the gather path."""
    pg, sg, wg, cg = _content(run("gather"))
    pp, sp, wp, cp = _content(run("pallas", interpret=True))
    assert np.array_equal(pg, pp)
    assert np.array_equal(wg, wp)
    assert np.allclose(sg, sp, atol=1e-6)
    assert np.array_equal(cg, cp)
