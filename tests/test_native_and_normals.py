"""Native host library vs numpy fallback equivalence + MADtree behavior."""
import numpy as np
import pytest

from mrhash_tpu import native
from mrhash_tpu.core import mesh_post
from mrhash_tpu.ops.normals import estimate_normals


pytestmark = pytest.mark.fast


def test_native_dedup_matches_numpy():
    rng = np.random.default_rng(0)
    v = rng.random((500, 3))
    v = np.concatenate([v, v[::3]])
    nat = native.dedup_vertices(v, 0.0)
    if nat is None:
        pytest.skip("native lib unavailable")
    remap, nu = nat
    # same grouping as numpy unique
    _, _, inv = np.unique(v, axis=0, return_index=True, return_inverse=True)
    assert nu == int(inv.max()) + 1
    # two rows equal iff same remap id
    for a, b in [(0, 500), (3, 501), (1, 2)]:
        same = np.allclose(v[a], v[b])
        assert (remap[a] == remap[b]) == same


def test_accumulator_same_result_with_or_without_native(monkeypatch):
    rng = np.random.default_rng(1)
    tri = rng.random((50, 3, 3))
    tri = np.concatenate([tri, tri[:20]])  # duplicated triangles
    col = np.full_like(tri, 100.0)

    acc1 = mesh_post.MeshAccumulator(0.0)
    acc1.add_triangles(tri, col)

    monkeypatch.setattr(native, "dedup_vertices", lambda *a: None)
    monkeypatch.setattr(native, "dedup_faces", lambda *a: None)
    acc2 = mesh_post.MeshAccumulator(0.0)
    acc2.add_triangles(tri, col)

    assert acc1.vertices.shape == acc2.vertices.shape
    assert acc1.faces.shape == acc2.faces.shape
    # same geometry as sets
    s1 = {tuple(np.round(r, 9)) for r in acc1.vertices}
    s2 = {tuple(np.round(r, 9)) for r in acc2.vertices}
    assert s1 == s2
    t1 = {tuple(sorted(map(tuple, acc1.vertices[f]))) for f in acc1.faces}
    t2 = {tuple(sorted(map(tuple, acc2.vertices[f]))) for f in acc2.faces}
    assert t1 == t2


def test_madtree_wall_normals_numpy():
    rng = np.random.default_rng(2)
    pts = np.stack([np.full(3000, 4.0), rng.uniform(-2, 2, 3000),
                    rng.uniform(-1, 1, 3000)], 1)
    normals, eig, w = estimate_normals(pts, b_max=0.4, b_min=0.4)
    # wall at x=4 seen from origin: normals point back toward the sensor
    assert np.mean(normals[:, 0]) < -0.95
    assert np.all(w >= 0) and np.all(w <= 1)
    # planar surface: high measurement confidence
    assert np.mean(w) > 0.8


def test_madtree_native_agrees_with_numpy():
    nat = native.load()
    if nat is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    pts = np.stack([rng.uniform(3, 3.02, 2000), rng.uniform(-2, 2, 2000),
                    rng.uniform(-1, 1, 2000)], 1)
    n1, w1 = native.estimate_normals(pts)
    n2, _, w2 = estimate_normals(pts)
    # same dominant normal direction (sign-aligned toward sensor)
    assert abs(np.mean(n1[:, 0]) - np.mean(n2[:, 0])) < 0.1
    assert abs(np.mean(w1) - np.mean(w2)) < 0.15


def test_semantic_labels():
    from mrhash_tpu.apps.utils.semantic_segmentation import (
        ade20k2kitti360, class_color_mapping_kitti360, kitti360_lookup)
    assert kitti360_lookup["car"] == 26
    assert kitti360_lookup["tree"] == kitti360_lookup["vegetation"]
    assert ade20k2kitti360(999) == 255
    m = class_color_mapping_kitti360()
    assert any(name == "car" for _, name, _ in m)
