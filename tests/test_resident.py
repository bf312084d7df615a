"""Resident window cache (core/resident.py) correctness.

The resident mode changes only HOW pool rows are addressed (contiguous
slice reads/writes of a sticky cache instead of row gathers/scatters), so
the fused pipeline with residency must produce a bit-identical map to the
fused pipeline without it — including across GC frees, fallback-served
near blocks, and the flush back to the big pool.  Also checks the churn
cap's staggered-entry semantics and the backing/res_index invariants.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrhash_tpu.core import pipeline, resident as R
from mrhash_tpu.core.state import MapConfig, make_state
from mrhash_tpu.ops import camera as C

ROWS, COLS = 64, 256


def _cfg(**kw):
    return MapConfig(
        virtual_voxel_size=0.02, sdf_truncation=0.06,
        sdf_truncation_scale=0.0, integration_weight_sample=1,
        max_integration_distance=5.0, n_frames_invalidate_voxels=2,
        num_blocks=1 << 11, max_active_blocks=1 << 10,
        max_alloc_per_frame=1 << 10, alloc_pixel_stride=1,
        sample_mode="fused", pallas_interpret=True, **kw)


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    cam = C.make_camera(fx=80.0, fy=80.0, cx=127.5, cy=31.5,
                        rows=ROWS, cols=COLS, min_depth=0.01, max_depth=5.0)
    r = np.arange(ROWS, dtype=np.float32)[:, None]
    c = np.arange(COLS, dtype=np.float32)[None, :]
    depth = 1.6 + 0.3 * np.sin(c / 37.0) + 0.2 * np.cos(r / 17.0)
    depth += rng.normal(0, 0.01, depth.shape)
    depth = np.round(depth * 2048.0) / 2048.0
    rgb = rng.integers(0, 255, (ROWS, COLS, 3)).astype(np.uint8)
    return cam, jnp.asarray(depth, jnp.float32), jnp.asarray(rgb)


def _run(cfg, n_frames=5, move=0.0):
    cam0, depth, rgb = _scene()
    state = make_state(cfg.num_blocks, cfg.num_buckets or None,
                       cfg.resident_rows)
    step = jax.jit(lambda s, c: pipeline.integrate_rgbd(cfg, s, c, depth,
                                                        rgb)[0])
    for i in range(n_frames):
        cam = C.with_pose(cam0, jnp.eye(3),
                          jnp.asarray([move * i, 0.0, 0.0], jnp.float32))
        state = step(state, cam)
    if state.resident is not None:
        state = state.replace(pool=R.flush(state.resident, state.pool))
    return jax.device_get(state)


def test_resident_matches_plain_fused():
    """Bit-identical big pool + table after flush (GC on, 5 frames).

    Bit-equality with the plain path requires the churn budget to cover
    first-frame occupancy (the documented contract: smaller budgets only
    stagger WHEN a block first integrates — covered by the stagger test
    below)."""
    ref = _run(_cfg())
    got = _run(_cfg(resident_rows=1 << 10, resident_churn=1 << 10))
    assert got.resident is not None, "residency did not engage"

    np.testing.assert_array_equal(got.table.ptr, ref.table.ptr)
    np.testing.assert_array_equal(got.table.pos, ref.table.pos)
    np.testing.assert_array_equal(got.pool.weight, ref.pool.weight)
    assert int(np.sum(ref.pool.weight)) > 1000, "scene integrated nothing"
    np.testing.assert_array_equal(got.pool.sdf, ref.pool.sdf)
    np.testing.assert_array_equal(got.pool.sumsq, ref.pool.sumsq)
    np.testing.assert_array_equal(got.pool.rgbp, ref.pool.rgbp)


def test_resident_maps_consistent():
    """backing / res_index stay mutually inverse across frames with GC
    frees and camera motion (eviction + re-entry)."""
    st = _run(_cfg(resident_rows=1 << 10), n_frames=6, move=0.05)
    backing = st.resident.backing
    res_index = st.resident.res_index[:-1]
    backed = np.flatnonzero(backing >= 0)
    np.testing.assert_array_equal(res_index[backing[backed]], backed)
    present = np.flatnonzero(res_index >= 0)
    np.testing.assert_array_equal(backing[res_index[present]], present)
    assert backed.size > 0


def test_resident_churn_cap_staggers():
    """With a tiny churn budget, entry staggers over frames instead of
    dropping blocks: the same map state is eventually reached."""
    ref = _run(_cfg(), n_frames=8)
    # churn * n_frames must cover the occupancy (~700 blocks here), with
    # slack for the frames spent before a block's first integration
    got = _run(_cfg(resident_rows=1 << 10, resident_churn=256), n_frames=12)

    def keyed_weights(st):
        """block key -> max voxel weight (row ids differ between runs:
        staggered GC timing permutes heap assignment)."""
        ptr = np.asarray(st.table.ptr)
        pos = np.asarray(st.table.pos)
        occ = np.flatnonzero(ptr >= 0)
        w = np.max(np.asarray(st.pool.weight)[ptr[occ] // 512], axis=1)
        return {tuple(pos[s]): int(w[i]) for i, s in enumerate(occ)}

    wref = keyed_weights(ref)
    wgot = keyed_weights(got)
    # staggered entrants integrate on later frames, so weight HISTORY
    # differs, but every block the reference integrated repeatedly must end
    # up allocated + integrated under the churn cap too
    starved = [k for k, v in wref.items() if v >= 3
               and wgot.get(k, 0) == 0]
    assert not starved, f"churn cap permanently starved {len(starved)} blocks"


def test_resident_multires_matches_plain_fused():
    """Multi-res (variance coarsening) resident row-slot cache vs the
    non-resident packed fused path: bit-identical big pool + table after
    flush, across coarsen (res-0 rows freed, carve rows allocated), GC
    frees of carves with live siblings, starvation, and fallback-served
    near blocks.  Regions + churn sized so nothing staggers (stagger
    semantics are covered by the single-res churn test)."""
    # regions must cover the scene (~700 res-0 blocks at frame 0, ~90
    # carve rows after coarsening): a smaller plain region staggers the
    # overflow — correct but not bit-equal to the always-served reference
    mkw = dict(sdf_var_threshold=1.0, max_coarsen_per_frame=256,
               max_gc_free_per_frame=256)
    ref = _run(dataclasses.replace(_cfg(**mkw),
                                   max_active_blocks=1 << 11),
               n_frames=6, move=0.02)
    got = _run(dataclasses.replace(_cfg(resident_rows=1 << 11,
                                        resident_churn=1 << 11,
                                        resident_plain_rows=1 << 10, **mkw),
                                   max_active_blocks=1 << 11),
               n_frames=6, move=0.02)
    assert got.resident is not None, "residency did not engage"

    np.testing.assert_array_equal(got.table.ptr, ref.table.ptr)
    np.testing.assert_array_equal(got.table.pos, ref.table.pos)
    np.testing.assert_array_equal(got.table.res, ref.table.res)
    assert int(np.sum(np.asarray(ref.table.res) == 1)) > 0, \
        "scene never coarsened — the multi-res path was not exercised"
    np.testing.assert_array_equal(got.pool.weight, ref.pool.weight)
    assert int(np.sum(ref.pool.weight)) > 1000, "scene integrated nothing"
    np.testing.assert_array_equal(got.pool.sdf, ref.pool.sdf)
    np.testing.assert_array_equal(got.pool.sumsq, ref.pool.sumsq)
    np.testing.assert_array_equal(got.pool.rgbp, ref.pool.rgbp)
