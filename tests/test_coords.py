"""Coordinate-transform round trips, mirroring tests/test_hash_utils.cu:40-163."""
import jax.numpy as jnp
import numpy as np
import pytest

from mrhash_tpu import params as P
from mrhash_tpu.ops import coords

VVS = 0.05
EXTENTS = jnp.ones(3, jnp.float32)


pytestmark = pytest.mark.fast


def rand_points(n, scale=50.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, size=(n, 3)), jnp.float32)


def test_world_voxel_roundtrip():
    pts = rand_points(2048)
    pi = coords.world_point_to_virtual_voxel_pos(VVS, pts)
    back = coords.virtual_voxel_pos_to_world(VVS, pi)
    # voxel centers are within half a voxel of the source point
    assert np.max(np.abs(np.asarray(back - pts))) <= VVS * 0.5 + 1e-4


def test_block_owns_its_voxels():
    # every voxel of a block must map back to that block, for signed coords
    rng = np.random.default_rng(1)
    blocks = jnp.asarray(rng.integers(-100, 100, size=(64, 3)), jnp.int32)
    base = coords.sdf_block_to_virtual_voxel_pos(blocks)  # [64,3]
    offs = coords.delinearize_voxel_pos(jnp.arange(512))  # [512,3]
    voxels = base[:, None, :] + offs[None, :, :]
    owner = coords.virtual_voxel_pos_to_sdf_block(voxels, VVS, EXTENTS)
    assert np.array_equal(np.asarray(owner),
                          np.broadcast_to(np.asarray(blocks)[:, None, :], owner.shape))


@pytest.mark.parametrize("block_size", [8, 4, 2])
def test_linearize_roundtrip(block_size):
    n = block_size ** 3
    idx = jnp.arange(n)
    pos = coords.delinearize_voxel_pos(idx, block_size)
    back = coords.linearize_voxel_pos(pos, block_size)
    assert np.array_equal(np.asarray(back), np.asarray(idx))
    assert int(pos.max()) == block_size - 1


@pytest.mark.parametrize("block_size", [8, 4])
def test_block_index_dense(block_size):
    """Local indices are dense in [0, block_size^3) including negative coords."""
    rng = np.random.default_rng(2)
    pi = jnp.asarray(rng.integers(-1000, 1000, size=(4096, 3)), jnp.int32)
    idx = coords.virtual_voxel_pos_to_block_index(pi, block_size)
    assert int(idx.min()) >= 0 and int(idx.max()) < block_size ** 3
    # all indices hit for a full block sweep
    base = jnp.array([[-8, -8, -8]], jnp.int32) * 3
    offs = coords.delinearize_voxel_pos(jnp.arange(512))
    scaling = P.SDF_BLOCK_SIZE // block_size
    sweep = coords.virtual_voxel_pos_to_block_index(base + offs, block_size)
    assert set(np.asarray(sweep).tolist()) == set(range(block_size ** 3))


def test_world_block_roundtrip():
    pts = rand_points(2048, scale=20.0, seed=3)
    blk = coords.world_point_to_sdf_block(VVS, EXTENTS, pts)
    corner = coords.sdf_block_to_world_point(VVS, blk)
    metric_block = P.SDF_BLOCK_SIZE * VVS
    d = np.asarray(pts - corner)
    # point lies within the block extent of its block corner (+half-voxel slack
    # from the nearest-voxel rounding in world->voxel)
    assert np.all(d >= -VVS * 0.51 - 1e-4)
    assert np.all(d <= metric_block + VVS * 0.51 + 1e-4)


def test_truncation():
    assert float(coords.get_truncation(2.0, 0.07, 0.01)) == pytest.approx(0.09)


def test_world_to_chunks_sign():
    ext = jnp.asarray([4.0, 4.0, 4.0], jnp.float32)
    p = jnp.asarray([[1.9, -1.9, 0.0], [2.1, -2.1, 6.1]], jnp.float32)
    c = coords.world_to_chunks(p, ext)
    assert np.array_equal(np.asarray(c), [[0, 0, 0], [1, -1, 2]])


def test_combine_voxel():
    sdf, w, rgb = coords.combine_voxel(
        jnp.float32(0.1), jnp.int32(3), jnp.asarray([10, 20, 30], jnp.uint8),
        jnp.float32(-0.1), jnp.int32(1), jnp.asarray([50, 20, 10], jnp.uint8))
    assert float(sdf) == pytest.approx((0.1 * 3 - 0.1 * 1) / 4)
    assert int(w) == 4
    assert np.array_equal(np.asarray(rgb), [30, 20, 20])
    # weight cap
    _, w2, _ = coords.combine_voxel(
        jnp.float32(0.0), jnp.int32(250), jnp.zeros(3, jnp.uint8),
        jnp.float32(0.0), jnp.int32(10), jnp.zeros(3, jnp.uint8))
    assert int(w2) == 255
