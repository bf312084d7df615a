"""Projection round trips, mirroring tests/test_projections.cu:41-226."""
import jax.numpy as jnp
import numpy as np

from mrhash_tpu.ops import camera as C


import pytest

pytestmark = pytest.mark.fast


def make_pinhole():
    return C.make_camera(fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                         rows=680, cols=1200, min_depth=0.01, max_depth=30.0)


def make_spherical(rows=64, cols=1024):
    fx = cols / (2 * np.pi)
    fy = rows / (np.pi / 4)  # 45 deg vertical fov
    return C.make_camera(fx=fx, fy=fy, cx=cols / 2.0, cy=rows / 2.0,
                         rows=rows, cols=cols, min_depth=0.2, max_depth=100.0,
                         model=C.SPHERICAL)


def assert_roundtrip(r, c, rr, cc, exact_frac=0.80):
    """Pixel-center round trips sit exactly on the (int)(v+0.5) boundary, so
    fp32 rounding may move a pixel by one (the reference's CUDA build has the
    same boundary sensitivity).  Require never-worse-than-one and mostly-exact.
    """
    dr = np.abs(np.asarray(rr) - np.asarray(r))
    dc = np.abs(np.asarray(cc) - np.asarray(c))
    assert dr.max() <= 1 and dc.max() <= 1
    assert ((dr == 0) & (dc == 0)).mean() >= exact_frac


def test_pinhole_roundtrip_fixed_depth():
    cam = make_pinhole()
    rows = jnp.arange(0, cam.rows, 7)
    cols = jnp.arange(0, cam.cols, 13)
    r, c = jnp.meshgrid(rows, cols, indexing="ij")
    pc = C.inverse_projection(cam, r, c, jnp.full(r.shape, 2.5, jnp.float32))
    rr, cc, ok = C.project_point(cam, pc)
    assert bool(ok.all())
    assert_roundtrip(r, c, rr, cc)


def test_pinhole_roundtrip_random_depth():
    cam = make_pinhole()
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.integers(0, cam.rows, 4096))
    c = jnp.asarray(rng.integers(0, cam.cols, 4096))
    d = jnp.asarray(rng.uniform(0.1, 29.0, 4096), jnp.float32)
    pc = C.inverse_projection(cam, r, c, d)
    rr, cc, ok = C.project_point(cam, pc)
    assert bool(ok.all())
    assert_roundtrip(r, c, rr, cc)


def test_spherical_roundtrip():
    cam = make_spherical()
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.integers(1, cam.rows - 1, 4096))
    c = jnp.asarray(rng.integers(1, cam.cols - 1, 4096))
    d = jnp.asarray(rng.uniform(1.0, 90.0, 4096), jnp.float32)
    pc = C.inverse_projection(cam, r, c, d)
    rr, cc, ok = C.project_point(cam, pc)
    assert float(ok.mean()) > 0.99
    m = np.asarray(ok)
    assert_roundtrip(np.asarray(r)[m], np.asarray(c)[m],
                     np.asarray(rr)[m], np.asarray(cc)[m])


def test_depth_limits():
    cam = make_pinhole()
    pc = jnp.asarray([[0.0, 0.0, 0.001], [0.0, 0.0, 31.0], [0.0, 0.0, 5.0]],
                     jnp.float32)
    _, _, ok = C.project_point(cam, pc)
    assert np.array_equal(np.asarray(ok), [False, False, True])


def test_frustum_approx_slack():
    cam = make_pinhole()
    # a point projecting just outside the image is accepted by approx test
    pc = C.inverse_projection(cam, jnp.float32(-0.3 * cam.rows),
                              jnp.float32(cam.cols / 2), jnp.float32(3.0))
    _, _, exact = C.project_point(cam, pc)
    _, _, approx = C.project_point_approx(cam, pc)
    assert not bool(exact)
    assert bool(approx)


def test_compute_cloud_and_pose():
    cam = make_pinhole()
    depth = jnp.full((cam.rows, cam.cols), 2.0, jnp.float32)
    depth = depth.at[0, 0].set(0.0)  # invalid
    cloud = C.compute_cloud(cam, depth)
    assert cloud.shape == (cam.rows, cam.cols, 3)
    assert np.allclose(np.asarray(cloud[0, 0]), 0.0)
    assert np.allclose(np.asarray(cloud[:, :, 2])[1:, 1:], 2.0)

    # world transform: 90deg yaw + translation round-trips
    th = np.pi / 2
    rot = jnp.asarray([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0],
                       [0, 0, 1]], jnp.float32)
    cam2 = C.with_pose(cam, rot, jnp.asarray([1.0, 2.0, 3.0], jnp.float32))
    pts = jnp.asarray(np.random.default_rng(2).uniform(-5, 5, (128, 3)),
                      jnp.float32)
    back = C.world_to_cam(cam2, C.cam_to_world(cam2, pts))
    assert np.allclose(np.asarray(back), np.asarray(pts), atol=1e-4)
