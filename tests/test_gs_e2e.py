"""Online GS end-to-end: TSDF mapping + quad-tree seeding + optimization on
a synthetic scene; rendered PSNR must improve over iterations
(the runGS loop of gaussian_data_structures.cpp:70-156)."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from mrhash_tpu.core import pipeline
from mrhash_tpu.core.state import MapConfig, make_state
from mrhash_tpu.gs import losses
from mrhash_tpu.gs.container import GaussianContainer
from mrhash_tpu.ops import camera as C

ROWS, COLS = 48, 64


@pytest.fixture(scope="module")
def gs_params_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("gs") / "params.json"
    p.write_text(json.dumps(dict(
        sh_degree=1, position_lr=0.002, feature_lr=0.02, opacity_lr=0.05,
        scaling_lr=0.005, rotation_lr=0.001, lambda_dssim=0.2,
        qtree_thresh=0.5, qtree_min_pixel_size=2, kf_thresh=20,
        kf_iters=6, non_kf_iters=3, random_kf_num=1, global_iters=2,
        keep_all_frames=False)))
    return str(p)


def test_gs_container_end_to_end(gs_params_file, tmp_path):
    cfg = MapConfig(virtual_voxel_size=0.05, sdf_truncation=0.15,
                    max_integration_distance=5.0, num_blocks=4096,
                    max_active_blocks=4096, max_alloc_per_frame=2048)
    cam = C.make_camera(fx=40.0, fy=40.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.01, max_depth=5.0)
    state = make_state(cfg.num_blocks)
    rng = np.random.default_rng(0)
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    # textured wall so the quad tree subdivides
    rgb = np.full((ROWS, COLS, 3), 60, np.uint8)
    rgb[:, COLS // 2:, 0] = 220
    rgb[ROWS // 2:, :, 2] = 200
    rgb = jnp.asarray(rgb)

    gs = GaussianContainer(gs_params_file, capacity=1 << 12,
                           qtree_capacity=1 << 12)
    state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)
    gs.run_gs(cfg, cam, state, np.asarray(rgb), np.asarray(depth))
    assert gs.model.count > 0, "quad-tree seeding produced no gaussians"
    n_first = gs.model.count

    img0 = gs.render_view(cam)
    gt = jnp.asarray(rgb, jnp.float32).transpose(2, 0, 1) / 255.0
    psnr0 = float(losses.psnr(img0, gt))

    # more frames: voxels now have weight 2 -> few/no new seeds (weight==1
    # gate), but optimization keeps improving render quality
    for _ in range(4):
        state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)
        gs.run_gs(cfg, cam, state, np.asarray(rgb), np.asarray(depth))
    img1 = gs.render_view(cam)
    psnr1 = float(losses.psnr(img1, gt))
    assert psnr1 > psnr0, (psnr0, psnr1)
    assert psnr1 > 10.0

    gs.optimize_final()
    img2 = gs.render_view(cam)
    psnr2 = float(losses.psnr(img2, gt))
    assert np.isfinite(psnr2)

    out = gs.save_ply(str(tmp_path), 5, blocking=True)
    assert b"element vertex" in open(out, "rb").read(200)


def test_check_nodes_weight_gate(gs_params_file):
    """Seeds appear only where the TSDF voxel was observed exactly once
    (processNodesKernel weight==1 gate, gaussian_data_structures.cu:40-42).
    """
    from mrhash_tpu.gs.container import check_nodes
    cfg = MapConfig(virtual_voxel_size=0.05, sdf_truncation=0.15,
                    max_integration_distance=5.0, num_blocks=2048,
                    max_active_blocks=2048, max_alloc_per_frame=1024)
    cam = C.make_camera(fx=40.0, fy=40.0, cx=COLS / 2 - 0.5,
                        cy=ROWS / 2 - 0.5, rows=ROWS, cols=COLS,
                        min_depth=0.01, max_depth=5.0)
    state = make_state(cfg.num_blocks)
    depth = jnp.full((ROWS, COLS), 2.0, jnp.float32)
    rgb = jnp.full((ROWS, COLS, 3), 128, jnp.uint8)

    leaves = jnp.asarray([[COLS / 2 - 4, ROWS / 2 - 4, 8, 8]], jnp.float32)
    lv = jnp.ones((1,), bool)

    # before any integration: voxel weight 0 -> rejected
    c, col, s, ok = check_nodes(cfg, state.table, state.pool, cam, leaves,
                                lv, depth, rgb)
    assert not bool(ok[0])

    state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)
    c, col, s, ok = check_nodes(cfg, state.table, state.pool, cam, leaves,
                                lv, depth, rgb)
    assert bool(ok[0])          # weight == 1 now
    assert abs(float(c[0, 2]) - 2.0) < 0.1
    assert float(s[0]) > 0

    state, _ = pipeline.integrate_rgbd(cfg, state, cam, depth, rgb)
    c, col, s, ok = check_nodes(cfg, state.table, state.pool, cam, leaves,
                                lv, depth, rgb)
    assert not bool(ok[0])      # weight == 2 -> gate closes
