"""Raycast depth rendering against a known synthetic wall."""
import jax.numpy as jnp
import numpy as np

from mrhash_tpu.core import pipeline
from mrhash_tpu.core.state import MapConfig, make_state
from mrhash_tpu.ops import camera as C
from mrhash_tpu.ops import raycast as R

ROWS, COLS = 24, 32


import pytest

pytestmark = pytest.mark.fast


def test_raycast_wall_depth():
    cfg = MapConfig(virtual_voxel_size=0.05, sdf_truncation=0.15,
                    max_integration_distance=5.0, num_blocks=4096,
                    max_active_blocks=4096, max_alloc_per_frame=2048)
    cam = C.make_camera(fx=30.0, fy=30.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.1, max_depth=5.0)
    state = make_state(cfg.num_blocks)
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)
    for _ in range(2):
        state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)

    d, hit = R.raycast_depth(cfg, state.table, state.pool, cam,
                             step_scale=0.4, max_steps=64)
    h = np.asarray(hit)
    dd = np.asarray(d)
    # central region hits the wall at ~2m
    c = dd[ROWS // 4: -ROWS // 4, COLS // 4: -COLS // 4]
    hc = h[ROWS // 4: -ROWS // 4, COLS // 4: -COLS // 4]
    assert hc.mean() > 0.9
    err = np.abs(c[hc] - 2.0)
    assert np.median(err) < 0.05, np.median(err)
