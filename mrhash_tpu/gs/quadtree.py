"""Image quad-tree seeding (gs/quad_tree.{cuh,cu}) — level-synchronous.

The reference subdivides with per-node shared-memory MSE reductions
(quad_tree.cu:6-100); here each level's per-node luminance-weighted MSE is an
O(1) integral-image (2-D cumsum) lookup, and subdivision is a cumsum
compaction — the whole tree builds in ~log2(max(H,W)) fused device steps.

Node error: luma-weighted per-channel variance * (W*H)/9e7, leaf when
error <= threshold or a child side would drop below min_pixel_size
(quad_tree.cu:85-150).

Corner lookups are ELEMENT gathers on the integral image, the slowest
indexed form on TPU (~6-8 ms per million, DESIGN.md scatter/gather rules),
so the layout minimises them two ways:
- ONE combined 4-lane integral (r, g, b, luma-dotted square sum): the
  error needs per-channel first moments but only the luma projection of
  the second moment, so 4 corner gathers per node replace the naive 8
  (two 3-channel integrals);
- level-RAMPED node buffers: level l holds at most min(4^l, cap) nodes,
  so the early levels cost 1+4+16+... gathers instead of cap each — the
  full build touches ~2.5x fewer nodes than a flat cap-sized scan
  (measured 112 -> ~35 ms at cap 32768, 1200x680, 12 levels on v5e).
"""
from __future__ import annotations

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
    luma = jnp.asarray(LUMA, jnp.float32)
    # lanes: r, g, b first moments + luma-projected second moment
    quad = jnp.concatenate([img, ((img * img) @ luma)[..., None]], axis=-1)
    S = _integral(quad)
    norm = (H * W) / 90_000_000.0

    cap = max_leaves

    def node_error(x, y, w, h):
        cnt = (w * h).astype(jnp.float32)
        cnt = jnp.where(cnt == 0, 1.0, cnt)
        s = jax.vmap(lambda a, b, c, d: _rect_sum(S, a, b, c, d))(x, y, w, h)
        m2l = s[:, 3] / cnt                       # E[luma . c^2]
        m1 = s[:, :3] / cnt[:, None]              # E[c] per channel
        return (m2l - (m1 * m1) @ luma) * norm

    leaves = jnp.zeros((cap, 4), jnp.int32)
    leaf_valid = jnp.zeros((cap,), bool)
    n_leaves = jnp.int32(0)
    n_overflow = jnp.int32(0)
    nodes = jnp.asarray([[0, 0, W, H]], jnp.int32)
    node_valid = jnp.ones((1,), bool)

    for _ in range(max_levels):
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

        # children of subdivided nodes (4 per node, cumsum-packed) into the
        # next level's ramped buffer: while 4*n <= cap every child fits
        # (base <= 4(n-1) < n_next - 3), so the overflow accounting below
        # matches the flat cap-sized buffer exactly
        n_next = min(4 * nodes.shape[0], cap)
        srank = jnp.cumsum(subdiv.astype(jnp.int32)) - 1
        base = srank * 4
        w2 = w - w1
        h2 = h - h1
        kids = jnp.stack([
            jnp.stack([x, y, w1, h1], -1),
            jnp.stack([x, y + h1, w1, h2], -1),
            jnp.stack([x + w1, y, w2, h1], -1),
            jnp.stack([x + w1, y + h1, w2, h2], -1)], axis=1)  # [n,4,4]
        kdest = jnp.where((subdiv & (base < n_next - 3))[:, None],
                          base[:, None] + jnp.arange(4), n_next)
        nodes = jnp.zeros((n_next, 4), jnp.int32).at[
            kdest.reshape(-1)].set(kids.reshape(-1, 4), mode="drop")
        node_valid = jnp.zeros((n_next,), bool).at[kdest.reshape(-1)].set(
            True, mode="drop")
        n_overflow = n_overflow + 4 * jnp.sum(
            (subdiv & (base >= n_next - 3)).astype(jnp.int32))

    return leaves.astype(jnp.float32), leaf_valid, n_leaves, n_overflow
