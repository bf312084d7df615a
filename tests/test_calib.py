"""VBR calibration parsing (mrhash/apps/utils/parse_calib_file.py:1-101)."""
import numpy as np
import pytest

from mrhash_tpu.apps.utils import parse_calib_file as PC

CALIB_YAML = """
cam_r:
  T_b:
    - [0.0, 0.0, 1.0, 0.1]
    - [-1.0, 0.0, 0.0, 0.02]
    - [0.0, -1.0, 0.0, -0.05]
    - [0.0, 0.0, 0.0, 1.0]
sensor:
  intrinsics: [610.5, 611.2, 640.0, 360.0]
  resolution: [1280, 720]
"""

CALIB_TXT = """S_rect_00 1.408000e+03 3.760000e+02
D_00 -3.7e-01 1.7e-01 3.0e-04 2.0e-04 -6.7e-02
P_rect_00 7.188560e+02 0.000000e+00 6.071928e+02 0.000000e+00 0.000000e+00 7.188560e+02 1.852157e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
"""


pytestmark = pytest.mark.fast


@pytest.fixture
def calib_yaml(tmp_path):
    p = tmp_path / "calib.yaml"
    p.write_text(CALIB_YAML)
    return str(p)


@pytest.fixture
def calib_txt(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TXT)
    return str(p)


def _rodrigues_to_matrix(rvec):
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3)
    a = rvec / theta
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K


def test_read_extrinsics_roundtrip(calib_yaml):
    rvec_cTl, t_cTl, rvec_lTc, t_lTc = PC.read_extrinsics(calib_yaml)
    lTc = PC.read_lidar_T_camera(calib_yaml)
    assert lTc.shape == (4, 4)
    # Rodrigues vectors reconstruct the rotation blocks
    np.testing.assert_allclose(_rodrigues_to_matrix(rvec_lTc), lTc[:3, :3],
                               atol=1e-6)
    cTl = np.linalg.inv(lTc)
    np.testing.assert_allclose(_rodrigues_to_matrix(rvec_cTl), cTl[:3, :3],
                               atol=1e-6)
    np.testing.assert_allclose(t_lTc, lTc[:3, 3], atol=1e-6)
    np.testing.assert_allclose(t_cTl, cTl[:3, 3], atol=1e-5)


def test_rodrigues_near_identity_and_pi():
    np.testing.assert_allclose(PC.rodrigues_from_matrix(np.eye(3)),
                               np.zeros(3), atol=1e-9)
    # 180 deg about z
    Rz = np.diag([-1.0, -1.0, 1.0])
    rv = PC.rodrigues_from_matrix(Rz)
    np.testing.assert_allclose(_rodrigues_to_matrix(rv), Rz, atol=1e-6)
    # generic rotation round trip
    rng = np.random.default_rng(3)
    for _ in range(5):
        v = rng.normal(size=3)
        R = _rodrigues_to_matrix(v)
        np.testing.assert_allclose(
            _rodrigues_to_matrix(PC.rodrigues_from_matrix(R)), R, atol=1e-6)


def test_read_intrinsics_and_size(calib_yaml):
    K = PC.read_intrinsics(calib_yaml)
    assert K[0, 0] == pytest.approx(610.5)
    assert K[1, 1] == pytest.approx(611.2)
    assert K[0, 2] == pytest.approx(640.0)
    assert K[1, 2] == pytest.approx(360.0)
    assert K[2, 2] == 1.0
    rows, cols = PC.read_img_size(calib_yaml)
    assert (rows, cols) == (720, 1280)


def test_read_txt_variants(calib_txt):
    K, dist = PC.read_intrinsics_txt(calib_txt)
    assert K[0, 0] == pytest.approx(718.856)
    assert K[1, 2] == pytest.approx(185.2157)
    assert len(dist) == 5
    w, h = PC.read_img_size_txt(calib_txt)
    assert (w, h) == (1408, 376)


def test_wired_into_geowrapper(calib_yaml):
    """setCameraInLidar stores the parsed matrix (geowrapper.cpp:94-96)."""
    from mrhash_tpu.geowrapper import GeoWrapper
    gw = GeoWrapper(sdf_truncation=0.1, sdf_truncation_scale=0.0,
                    integration_weight_sample=1, virtual_voxel_size=0.05,
                    n_frames_invalidate_voxels=0, voxel_extents_scale=1,
                    gs_optimization_param_path="", num_blocks=512,
                    max_active_blocks=256, max_alloc_per_frame=128)
    gw.setCameraInLidar(PC.read_lidar_T_camera(calib_yaml))
    np.testing.assert_allclose(gw.camera_in_lidar,
                               PC.read_lidar_T_camera(calib_yaml))
