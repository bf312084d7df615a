"""Pallas TPU kernels for the hot sampling path.

`sample_image_pallas`: per-voxel image sampling for TSDF integration.  The
2-channel image (depth + bit-packed rgb, channel-first) is pinned whole in
VMEM; each grid step handles 8 voxel blocks, slices each block's aligned
24x256 patch out of VMEM (free address arithmetic; Mosaic requires
8-sublane / 128-lane aligned starts) and resolves every lane's pixel in two
stages: a row one-hot matmul on the MXU ([512,24] @ [24,256]) followed by a
column one-hot select-reduce on the VPU.  Replaces two ~115M-elem/s
element-wise image gathers.

Lanes whose pixel falls outside their block's patch (near, large-footprint
blocks) return 0 and are served by the caller's compacted element-wise
fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_H = 24         # 8-aligned row origin + 16 rows of coverage
PATCH_W = 256        # 128-aligned col origin + 128 cols of coverage
# unrolled per-step blocks (dim -2 must be %8).  Measured: b=16 is a wash
# (112.0 vs 111.1 ms at A=2^15), b=32 OOMs scoped VMEM — per-block cost
# (~3.9us) is the meta-read -> dynamic-slice -> dot dependency chain, not
# grid overhead, so the remaining win is a fused-integrate formulation.
BLOCKS_PER_STEP = 8

# v2 kernel (EXPERIMENT, NOT USED): 5 bf16-exact channels (depth hi/lo
# split + r/g/b), one single-pass bf16 MXU matmul per block with the
# contraction on the 256-lane column axis.  Measured SLOWER than v1
# (183ms vs 114ms at A=2^15): the per-iteration VMEM stack forces a
# fori_loop body, whose loop overhead exceeds the MXU savings (an
# unrolled body OOMs scoped VMEM at 18.7M > 16M).  Kept for reference;
# v1 below remains the production kernel.
PATCH_H2 = 32        # 8-aligned origin + 24 rows of coverage
N_CH = 5


def _sample_kernel_v2(img_hbm, meta_ref, lr_ref, lc_ref, out_ref,
                      img_ref, copy_sem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(img_hbm, img_ref, copy_sem).start()
        pltpu.make_async_copy(img_hbm, img_ref, copy_sem).wait()

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, PATCH_W), 1)
    iota160 = jax.lax.broadcasted_iota(jnp.int32, (1, N_CH * PATCH_H2),
                                       1) % PATCH_H2

    # fori_loop (not unroll): the per-iteration VMEM stack (~1.3MB of
    # one-hots/temps) must be reused, or 8 unrolled copies blow the 16MB
    # scoped-vmem limit.  The loop overhead is what makes v2 lose to v1.
    def body(k, _):
        r0 = pl.multiple_of(meta_ref[k, 0], 8)
        c0 = pl.multiple_of(meta_ref[k, 1], 128)
        patch = img_ref[:, pl.ds(r0, PATCH_H2), pl.ds(c0, PATCH_W)]
        patch2 = patch.reshape(N_CH * PATCH_H2, PATCH_W)       # [160,256]
        lr = lr_ref[k]
        lc = lc_ref[k]
        oh_c = (lc[:, None] == iota_c).astype(jnp.bfloat16)    # [512,256]
        tmp = jax.lax.dot_general(
            oh_c, patch2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [512,160]
        # Mosaic can't split the lane dim (reshape [512,160]->[512,5,32]);
        # select rows with a tiled mask + static per-channel lane slices
        oh_r = (lr[:, None] == iota160).astype(jnp.float32)    # [512,160]
        masked = tmp * oh_r
        for ch in range(N_CH):
            out_ref[k, ch, :] = jnp.sum(
                masked[:, ch * PATCH_H2:(ch + 1) * PATCH_H2], axis=1)
        return 0

    jax.lax.fori_loop(0, BLOCKS_PER_STEP, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_image_pallas_v2(img5, r0, c0, lr, lc, interpret=False):
    """img5 bf16[5,H,W] channel-first (d_hi, d_lo, r, g, b — all exactly
    representable in bf16); r0 i32[A] 8-aligned row origins; c0 i32[A]
    128-aligned col origins; lr/lc i32[A,512] patch-local coords.
    Returns f32[A,8,512] with channels 0..4 used."""
    A, L = lr.shape
    B = BLOCKS_PER_STEP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(A // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # image
            pl.BlockSpec((B, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # meta r0/c0
            pl.BlockSpec((B, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # lr
            pl.BlockSpec((B, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # lc
        ],
        out_specs=pl.BlockSpec((B, 8, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(img5.shape, jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        _sample_kernel_v2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, 8, L), jnp.float32),
        interpret=interpret,
    )
    meta = jnp.zeros((A, 128), jnp.int32)
    meta = meta.at[:, 0].set(r0).at[:, 1].set(c0)
    return call(img5, meta, lr, lc)


def _sample_kernel(b, img_hbm, meta_ref, lr_ref, lc_ref, out_ref,
                   img_vmem, copy_sem):
    i = pl.program_id(0)

    # image: one HBM->VMEM DMA at step 0; the scratch persists across the
    # (sequential) grid, avoiding pallas double-buffering a 7MB input
    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(img_hbm, img_vmem, copy_sem).start()
        pltpu.make_async_copy(img_hbm, img_vmem, copy_sem).wait()

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, PATCH_H), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, PATCH_W), 1)

    # integrate's compacted window is padded to a static bucket with the
    # real blocks first; the dots dominate per-block cost (~4us), so steps
    # whose b blocks are all inactive skip the MXU work.  One branch per
    # STEP, not per block: a per-block gate measured ~0.7us/block of branch
    # overhead (134ms vs 111ms ungated at full activity).
    step_active = jnp.max(meta_ref[:, 2])

    @pl.when(step_active != 0)
    def _():
        for k in range(b):
            r0 = pl.multiple_of(meta_ref[k, 0], 8)
            c0 = pl.multiple_of(meta_ref[k, 1], 128)
            patch = img_vmem[:, pl.ds(r0, PATCH_H), pl.ds(c0, PATCH_W)]
            lr = lr_ref[k]                                       # [512]
            lc = lc_ref[k]
            oh_r = (lr[:, None] == iota_r).astype(jnp.float32)   # [512,24]
            oh_c = (lc[:, None] == iota_c).astype(jnp.float32)   # [512,256]
            for ch in range(2):
                # HIGHEST: single-pass bf16 would quantize depths by ~0.4%
                rows = jnp.dot(oh_r, patch[ch],
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                out_ref[k, ch, :] = jnp.sum(rows * oh_c, axis=1)

    @pl.when(step_active == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=("interpret", "b"))
def sample_image_pallas(img_cf, r0, c0, lr, lc, bactive=None,
                        interpret=False, b=BLOCKS_PER_STEP):
    """img_cf f32[2,H,W] channel-first (depth, packed-rgb); r0 i32[A]
    8-aligned row origins; c0 i32[A] 128-aligned col origins; lr/lc
    i32[A,512] patch-local coordinates (out-of-patch lanes may carry any
    in-range value; caller overrides their result).  bactive i32[A]
    (optional): grid steps whose b consecutive blocks are all 0 skip the
    MXU work and return zeros — pass it (real blocks compacted first) so
    window-padding blocks cost ~nothing.  Inactive blocks sharing a step
    with active ones still compute; callers must mask inactive results
    either way.  A % b == 0.
    Returns f32[A,2,512] (channel-middle: a trailing 2 would lane-pad 64x)."""
    A, L = lr.shape
    B = b
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(A // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # image (HBM)
            pl.BlockSpec((B, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # meta r0/c0
            pl.BlockSpec((B, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # lr rows
            pl.BlockSpec((B, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # lc rows
        ],
        out_specs=pl.BlockSpec((B, 2, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(img_cf.shape, jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_sample_kernel, B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, 2, L), jnp.float32),
        interpret=interpret,
    )
    meta = jnp.zeros((A, 128), jnp.int32)
    meta = meta.at[:, 0].set(r0).at[:, 1].set(c0)
    if bactive is None:
        meta = meta.at[:, 2].set(1)
    else:
        meta = meta.at[:, 2].set(bactive.astype(jnp.int32))
    return call(img_cf, meta, lr, lc)
