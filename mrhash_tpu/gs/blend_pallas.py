"""Pallas tile-blend kernels for the Gaussian rasterizer.

The XLA formulation of the front-to-back compositing loop (gs/rasterizer.py
_blend_forward / _blend_bwd) runs as a K-step lax.scan whose per-step
dispatch dominates: at 1200x680 / K=128 the forward measured 14.9 ms but
each step's real math on [T,256] pixels is ~20 us (round-2 BENCH_GS cap
sweep: 64->11.5 ms, 128->14.9 ms, 256->21.8 ms — near-affine in K, i.e.
step-overhead-bound, not FLOP-bound).  Here the whole loop runs inside ONE
Pallas grid pass over tile batches, all K steps on VMEM-resident slabs:

  forward  (renderCUDA, mrhash/src/gs/cuda_rasterizer/src/forward.cu:
            249-356): per batch of B tiles, the K-step sequential composite
            on [B,256] registers, each step recomputing its alpha from the
            step's 16-lane attr rows (pl.ds ref reads; Mosaic cannot
            dynamic_slice precomputed vector slabs, and [K*B,256] slabs
            would spill anyway); emits final transmittance T, color C, and
            the per-step blended bitmask the backward needs.
  backward (renderBackwardsCUDA, backward.cu:386-594): re-walks the list
            back-to-front recovering each step's transmittance by dividing
            the saved final T by (1 - alpha_k) exactly where the blended bit
            is set (same O(1)-state trick as the XLA _blend_bwd),
            accumulating per-(tile,k) gradients with in-kernel 256-pixel
            reductions.

Row layout: per batch, the (tile, k) attribute rows are stored K-MAJOR
(row = k * B + t_local) so each composite step slices one contiguous
[B, 256] sublane slab.  Semantics are bit-compatible with the XLA path
(same ALPHA_THRESHOLD / ALPHA_MIN gates, same contribution order);
tests/test_gs.py compares both in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

PIX = 256                 # BLOCK * BLOCK pixels per tile
ALPHA_THRESHOLD = 1.0 / 255.0
ALPHA_MIN = 1e-4
TILE_BATCH = 16           # tiles per grid step: [b,256] composite ops are
                          # issue-latency-bound at b=8 (measured 31.3 ms
                          # Adam iter vs the XLA scan's 23.4); b=32 blew
                          # the 16M scoped-vmem stack (24M) on the fwd
UNROLL = 8                # composite steps unrolled per fori iteration


def _alpha_step(attr_ref, px, py, k, b):
    """Alpha math for ONE composite step: [b, PIX] registers only.

    The first cut computed all-(k, pixel) slabs ([K*b, PIX] power/expp/
    alpha/dx/dy VALUES) upfront and dynamic_slice'd them per step — Mosaic
    has no dynamic_slice lowering for vector values (the real-TPU compile
    failed), and six 1 MB slabs live as spilled vector registers anyway.
    Recomputing per step from the attr REF (pl.ds dynamic-start row reads
    ARE supported) keeps the working set at [b, PIX] and costs the same
    total VPU math.  attr row layout: [x, y, con_a, con_b, con_c, opac,
    r, g, b, valid] padded to 16 lanes."""
    at = attr_ref[pl.ds(k * b, b), :]              # [b, 16]
    dx = at[:, 0:1] - px
    dy = at[:, 1:2] - py
    power = (-0.5 * at[:, 2:3] * dx * dx - 0.5 * at[:, 4:5] * dy * dy
             - at[:, 3:4] * dx * dy)
    expp = jnp.exp(power)
    alpha = jnp.minimum(0.99, at[:, 5:6] * expp)
    return power, expp, alpha, at, dx, dy


def _fwd_kernel(K, attr_ref, pixf_ref, tout_ref, cout_ref, mask_ref):
    b = tout_ref.shape[0]
    pixf = pixf_ref[...]                           # [b, 2*PIX] (x | y)
    px = pixf[:, :PIX]                             # [b, PIX]
    py = pixf[:, PIX:]

    T = jnp.ones((b, PIX), jnp.float32)
    Cr = jnp.zeros((b, PIX), jnp.float32)
    Cg = jnp.zeros((b, PIX), jnp.float32)
    Cb = jnp.zeros((b, PIX), jnp.float32)

    def one(k, T, Cr, Cg, Cb):
        power, _, a, at, _, _ = _alpha_step(attr_ref, px, py, k, b)
        p = ((at[:, 9:10] > 0) & (power <= 0.0)
             & (a >= ALPHA_THRESHOLD))
        test_T = T * (1.0 - a)
        blended = p & (T >= ALPHA_MIN) & (test_T >= ALPHA_MIN)
        w = jnp.where(blended, a * T, 0.0)
        Cr = Cr + w * at[:, 6:7]
        Cg = Cg + w * at[:, 7:8]
        Cb = Cb + w * at[:, 8:9]
        T = jnp.where(blended, test_T, T)
        mask_ref[pl.ds(k * b, b), :] = blended.astype(jnp.int8)
        return T, Cr, Cg, Cb

    def chunk(c, carry):
        T, Cr, Cg, Cb = carry
        for j in range(UNROLL):
            T, Cr, Cg, Cb = one(c * UNROLL + j, T, Cr, Cg, Cb)
        return T, Cr, Cg, Cb

    assert K % UNROLL == 0, K
    T, Cr, Cg, Cb = jax.lax.fori_loop(0, K // UNROLL, chunk,
                                      (T, Cr, Cg, Cb))
    tout_ref[...] = T
    cout_ref[:, 0:PIX] = Cr
    cout_ref[:, PIX:2 * PIX] = Cg
    cout_ref[:, 2 * PIX:] = Cb


def _bwd_kernel(K, attr_ref, pixf_ref, tfin_ref, mask_ref, gt_ref, gc_ref,
                gout_ref):
    b = tfin_ref.shape[0]
    pixf = pixf_ref[...]                            # [b, 2*PIX] (x | y)
    px = pixf[:, :PIX]
    py = pixf[:, PIX:]

    gT = gt_ref[...]                                # [b, PIX]
    gCr = gc_ref[:, 0:PIX]
    gCg = gc_ref[:, PIX:2 * PIX]
    gCb = gc_ref[:, 2 * PIX:]
    Tfin = tfin_ref[...]

    def one(k, T_after, Sr, Sg, Sb):
        _, e, a, at, dx, dy = _alpha_step(attr_ref, px, py, k, b)
        # i8 vector compares don't lower on v5e ("Target does not support
        # this comparison"); widen the packed mask before testing
        bl = mask_ref[pl.ds(k * b, b), :].astype(jnp.int32) > 0
        one_m = jnp.where(bl, 1.0 - a, 1.0)
        T_before = T_after / one_m
        w = jnp.where(bl, a * T_before, 0.0)

        d_rgb_r = jnp.sum(gCr * w, axis=1)          # [b]
        d_rgb_g = jnp.sum(gCg * w, axis=1)
        d_rgb_b = jnp.sum(gCb * w, axis=1)

        gdot_rgb = gCr * at[:, 6:7] + gCg * at[:, 7:8] + gCb * at[:, 8:9]
        gdot_S = gCr * Sr + gCg * Sg + gCb * Sb
        d_alpha = jnp.where(
            bl, gdot_rgb * T_before - (gdot_S + gT * Tfin) / one_m, 0.0)

        live = (at[:, 5:6] * e) < 0.99
        d_op_pix = jnp.where(live, d_alpha * e, 0.0)
        d_power = jnp.where(live, d_alpha * a, 0.0)

        d_op = jnp.sum(d_op_pix, axis=1)
        d_con0 = jnp.sum(d_power * (-0.5 * dx * dx), axis=1)
        d_con1 = jnp.sum(d_power * (-dx * dy), axis=1)
        d_con2 = jnp.sum(d_power * (-0.5 * dy * dy), axis=1)
        d_xy0 = jnp.sum(d_power * (-at[:, 2:3] * dx - at[:, 3:4] * dy),
                        axis=1)
        d_xy1 = jnp.sum(d_power * (-at[:, 4:5] * dy - at[:, 3:4] * dx),
                        axis=1)

        Sr = Sr + w * at[:, 6:7]
        Sg = Sg + w * at[:, 7:8]
        Sb = Sb + w * at[:, 8:9]

        # [b, 16] gradient row (9 used lanes)
        g9 = jnp.concatenate(
            [d_xy0[:, None], d_xy1[:, None], d_con0[:, None],
             d_con1[:, None], d_con2[:, None], d_op[:, None],
             d_rgb_r[:, None], d_rgb_g[:, None], d_rgb_b[:, None],
             jnp.zeros((b, 7), jnp.float32)], axis=1)
        gout_ref[pl.ds(k * b, b), :] = g9
        return T_before, Sr, Sg, Sb

    def chunk(c, carry):
        T_after, Sr, Sg, Sb = carry
        for j in range(UNROLL):
            k = K - 1 - (c * UNROLL + j)
            T_after, Sr, Sg, Sb = one(k, T_after, Sr, Sg, Sb)
        return T_after, Sr, Sg, Sb

    assert K % UNROLL == 0, K
    S0 = jnp.zeros((b, PIX), jnp.float32)
    jax.lax.fori_loop(0, K // UNROLL, chunk, (Tfin, S0, S0, S0))


def _pack_attr_kmajor(txy, tconic, topac, trgb, lvalid, nb, b):
    """[T,K,*] attrs -> [nb * K * b, 16] rows, K-major within each batch
    (row of (batch i, k, t_local) = i*K*b + k*b + t_local), zero-padded to
    nb*b tiles."""
    Tn, K = topac.shape
    attr = jnp.concatenate(
        [txy, tconic, topac[..., None], trgb, lvalid[..., None],
         jnp.zeros((Tn, K, 6), jnp.float32)], axis=-1)     # [T, K, 16]
    attr = _pad_tiles(attr, nb * b)
    return attr.reshape(nb, b, K, 16).transpose(0, 2, 1, 3).reshape(
        nb * K * b, 16)


def _pad_tiles(x, n):
    Tn = x.shape[0]
    if Tn == n:
        return x
    pad = jnp.zeros((n - Tn,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def blend_forward_pallas(txy, tconic, topac, trgb, lvalid, pixf,
                         interpret=False):
    """Returns (Tfin [T,256], Cfin [T,256,3], blended i8 [T,K,256])."""
    Tn, K = topac.shape
    b = TILE_BATCH
    nb = -(-Tn // b)
    attr = _pack_attr_kmajor(txy, tconic, topac, trgb, lvalid, nb, b)
    pixf2 = _pad_tiles(
        jnp.concatenate([pixf[..., 0], pixf[..., 1]], axis=-1), nb * b)

    Tfin, Cfin, mask = pl.pallas_call(
        functools.partial(_fwd_kernel, K),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((K * b, 16), lambda i: (i, 0)),
            pl.BlockSpec((b, 2 * PIX), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, PIX), lambda i: (i, 0)),
            pl.BlockSpec((b, 3 * PIX), lambda i: (i, 0)),
            pl.BlockSpec((K * b, PIX), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * b, PIX), jnp.float32),
            jax.ShapeDtypeStruct((nb * b, 3 * PIX), jnp.float32),
            jax.ShapeDtypeStruct((nb * K * b, PIX), jnp.int8),
        ],
        interpret=interpret,
    )(attr, pixf2)

    Tfin = Tfin[:Tn]
    Cfin = Cfin.reshape(nb * b, 3, PIX).transpose(0, 2, 1)[:Tn]
    mask = mask.reshape(nb, K, b, PIX).transpose(0, 2, 1, 3).reshape(
        nb * b, K, PIX)[:Tn]
    return Tfin, Cfin, mask


def blend_backward_pallas(txy, tconic, topac, trgb, lvalid, pixf, Tfin,
                          mask, gT, gC, interpret=False):
    """Gradients (g_xy [T,K,2], g_con [T,K,3], g_op [T,K], g_rgb [T,K,3])."""
    Tn, K = topac.shape
    b = TILE_BATCH
    nb = -(-Tn // b)
    attr = _pack_attr_kmajor(txy, tconic, topac, trgb, lvalid, nb, b)
    pixf2 = _pad_tiles(
        jnp.concatenate([pixf[..., 0], pixf[..., 1]], axis=-1), nb * b)
    mask_km = _pad_tiles(mask, nb * b).reshape(
        nb, b, K, PIX).transpose(0, 2, 1, 3).reshape(nb * K * b, PIX)
    gC2 = _pad_tiles(
        jnp.concatenate([gC[..., 0], gC[..., 1], gC[..., 2]], axis=-1),
        nb * b)
    gT2 = _pad_tiles(gT, nb * b)
    # padded tiles carry Tfin=0 -> T_before = 0/1 = 0, all-zero grads
    Tfin2 = _pad_tiles(Tfin, nb * b)

    g = pl.pallas_call(
        functools.partial(_bwd_kernel, K),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((K * b, 16), lambda i: (i, 0)),
            pl.BlockSpec((b, 2 * PIX), lambda i: (i, 0)),
            pl.BlockSpec((b, PIX), lambda i: (i, 0)),
            pl.BlockSpec((K * b, PIX), lambda i: (i, 0)),
            pl.BlockSpec((b, PIX), lambda i: (i, 0)),
            pl.BlockSpec((b, 3 * PIX), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((K * b, 16), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * K * b, 16), jnp.float32),
        interpret=interpret,
    )(attr, pixf2, Tfin2, mask_km, gT2, gC2)

    g = g.reshape(nb, K, b, 16).transpose(0, 2, 1, 3).reshape(
        nb * b, K, 16)[:Tn]
    return g[..., 0:2], g[..., 2:5], g[..., 5], g[..., 6:9]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def blend_tiles(interpret, txy, tconic, topac, trgb, lvalid, pixf):
    """Drop-in replacement for rasterizer.blend_tiles running both passes
    as Pallas kernels (interpret leads: custom_vjp nondiff_argnums must be
    the leading arguments).  Same residual discipline: final T + the i8
    blended mask, O(1) state through the K steps."""
    Tfin, Cfin, _ = blend_forward_pallas(txy, tconic, topac, trgb, lvalid,
                                         pixf, interpret=interpret)
    return Tfin, Cfin


def _blend_tiles_fwd(interpret, txy, tconic, topac, trgb, lvalid, pixf):
    Tfin, Cfin, mask = blend_forward_pallas(txy, tconic, topac, trgb,
                                            lvalid, pixf,
                                            interpret=interpret)
    return (Tfin, Cfin), (txy, tconic, topac, trgb, lvalid, pixf, Tfin,
                          mask)


def _blend_tiles_bwd(interpret, res, cts):
    txy, tconic, topac, trgb, lvalid, pixf, Tfin, mask = res
    gT, gC = cts
    g_xy, g_con, g_op, g_rgb = blend_backward_pallas(
        txy, tconic, topac, trgb, lvalid, pixf, Tfin, mask, gT, gC,
        interpret=interpret)
    return (g_xy, g_con, g_op, g_rgb,
            jnp.zeros_like(lvalid), jnp.zeros_like(pixf))


blend_tiles.defvjp(_blend_tiles_fwd, _blend_tiles_bwd)
