"""Image quad-tree seeding (gs/quad_tree.{cuh,cu}) — level-synchronous.

The reference subdivides with per-node shared-memory MSE reductions
(quad_tree.cu:6-100); here each level's per-node luminance-weighted MSE is an
O(1) integral-image (2-D cumsum) lookup, and subdivision is a cumsum
compaction — the whole tree builds in ~log2(max(H,W)) fused device steps.

Node error: luma-weighted per-channel variance * (W*H)/9e7, leaf when
error <= threshold or a child side would drop below min_pixel_size
(quad_tree.cu:85-150).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LUMA = (0.2989, 0.5870, 0.1140)


def _integral(img):
    """Zero-padded 2-D inclusive prefix sums: S[y, x] = sum img[:y, :x]."""
    s = jnp.cumsum(jnp.cumsum(img.astype(jnp.float32), axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)) + ((0, 0),) * (img.ndim - 2))


def _rect_sum(S, x, y, w, h):
    return (S[y + h, x + w] - S[y, x + w] - S[y + h, x] + S[y, x])


def build_qtree(rgb_img, threshold, min_pixel_size, max_leaves,
                max_levels=None):
    """rgb_img u8[H,W,3] -> (leaves f32[max_leaves,4] as (x, y, w, h),
    leaf_valid bool[max_leaves], n_leaves, n_overflow)."""
    H, W = rgb_img.shape[:2]
    if max_levels is None:
        max_levels = max(H, W).bit_length() + 1
    img = rgb_img.astype(jnp.float32)
    S1 = _integral(img)
    S2 = _integral(img * img)
    norm = (H * W) / 90_000_000.0
    luma = jnp.asarray(LUMA, jnp.float32)

    cap = max_leaves

    def node_error(x, y, w, h):
        cnt = (w * h).astype(jnp.float32)
        cnt = jnp.where(cnt == 0, 1.0, cnt)
        s1 = jax.vmap(lambda a, b, c, d: _rect_sum(S1, a, b, c, d))(x, y, w, h)
        s2 = jax.vmap(lambda a, b, c, d: _rect_sum(S2, a, b, c, d))(x, y, w, h)
        mse = s2 / cnt[:, None] - (s1 / cnt[:, None]) ** 2
        return (mse @ luma) * norm

    # node buffers: (x, y, w, h) int32
    nodes = jnp.zeros((cap, 4), jnp.int32).at[0].set(
        jnp.asarray([0, 0, W, H], jnp.int32))
    node_valid = jnp.zeros((cap,), bool).at[0].set(True)
    leaves = jnp.zeros((cap, 4), jnp.int32)
    leaf_valid = jnp.zeros((cap,), bool)
    n_leaves = jnp.int32(0)
    n_overflow = jnp.int32(0)

    def level(carry, _):
        nodes, node_valid, leaves, leaf_valid, n_leaves, n_overflow = carry
        x, y, w, h = nodes[:, 0], nodes[:, 1], nodes[:, 2], nodes[:, 3]
        err = node_error(x, y, jnp.maximum(w, 0), jnp.maximum(h, 0))
        w1 = w // 2
        h1 = h // 2
        too_small = (w1 <= min_pixel_size) | (h1 <= min_pixel_size)
        is_leaf = node_valid & ((err <= threshold) | too_small)
        subdiv = node_valid & ~is_leaf

        # append leaves (capacity-bounded, overflow counted)
        rank = jnp.cumsum(is_leaf.astype(jnp.int32)) - 1
        dest = jnp.where(is_leaf & (n_leaves + rank < cap),
                         n_leaves + rank, cap)
        leaves = leaves.at[dest].set(nodes, mode="drop")
        leaf_valid = leaf_valid.at[dest].set(True, mode="drop")
        produced = jnp.sum(is_leaf.astype(jnp.int32))
        kept = jnp.minimum(produced, cap - n_leaves)
        n_overflow = n_overflow + (produced - kept)
        n_leaves = n_leaves + kept

        # children of subdivided nodes (4 per node, cumsum-packed)
        srank = jnp.cumsum(subdiv.astype(jnp.int32)) - 1
        base = srank * 4
        w2 = w - w1
        h2 = h - h1
        kids = jnp.stack([
            jnp.stack([x, y, w1, h1], -1),
            jnp.stack([x, y + h1, w1, h2], -1),
            jnp.stack([x + w1, y, w2, h1], -1),
            jnp.stack([x + w1, y + h1, w2, h2], -1)], axis=1)  # [cap,4,4]
        kdest = jnp.where((subdiv & (base < cap - 3))[:, None],
                          base[:, None] + jnp.arange(4), cap)
        new_nodes = jnp.zeros((cap, 4), jnp.int32).at[
            kdest.reshape(-1)].set(kids.reshape(-1, 4), mode="drop")
        new_valid = jnp.zeros((cap,), bool).at[kdest.reshape(-1)].set(
            True, mode="drop")
        n_overflow = n_overflow + 4 * jnp.sum(
            (subdiv & (base >= cap - 3)).astype(jnp.int32))
        return (new_nodes, new_valid, leaves, leaf_valid, n_leaves,
                n_overflow), None

    (_, _, leaves, leaf_valid, n_leaves, n_overflow), _ = jax.lax.scan(
        level, (nodes, node_valid, leaves, leaf_valid, n_leaves, n_overflow),
        None, length=max_levels)
    return leaves.astype(jnp.float32), leaf_valid, n_leaves, n_overflow
