"""Fused Pallas TSDF-integrate kernel: projection + image sampling + SDF
fuse + Welford variance + row writeback in ONE VMEM-resident pass.

TPU-native re-derivation of the reference's integrateDepthMapKernel
(mrhash/src/sdf/voxel_data_structures.cu:1094-1181).  Replaces the split
sampler-kernel + XLA projection/fuse/scatter stages of ops/integrate.py
(round-1 profile: the split pipeline cost ~4.2us per compacted-window slot;
the separate stages re-streamed [A,512] f32 tensors through HBM ~10 times).

Per grid step (BLOCKS_PER_STEP=b res-0 blocks):
  1. batched [b,512] voxel lattice -> world -> camera -> pixel projection
     (VPU, all in VMEM; the XLA version materialized these in HBM);
  2. per block: slice the 2-channel f32 image patch (depth + rgb bit-packed
     exactly into f32) from a VMEM-resident copy of the frame; split into 5
     bf16-EXACT channels (depth quantized to 2^-11 m and split hi/lo, r, g,
     b) stacked along sublanes [5*24, 256];
  3. ONE bf16 MXU contraction per block samples all 5 channels for all 512
     voxels: [120,256] @ [256,512] -> [120,512] f32 (the column one-hot
     [256,512] is built lane-major so no relayout is ever needed — the
     round-1 kernel's [512,P] one-hots forced sublane<->lane transposes);
  4. row-select = masked sublane reduce of [24,512] slices (VPU, cheap);
  5. batched [b,512] TSDF fuse: truncation, combineVoxel, Welford sum_squared
     (voxel_data_structures.cu:1162-1180), masked writeback.

Pool rows ride as ONE packed i32[A, 2176] operand (sdf|sumsq bitcast, weight,
packed rgb, + per-block flag lanes) so each grid step issues 3 blocked DMAs
(meta, pool in, pool out) — per-step DMA issue overhead measured ~6us/step
with 5 operands in round 1.

Out-of-patch lanes (near, large-footprint blocks) return depth 0 and are
served by the caller's bounded element-wise fallback; per-block unserved
counts are reported in flag lane 2048.  Flag lanes 2049/2050 carry the GC
inputs (min |sdf| over weighted voxels, max weight) so the single-res GC
sweep needs no extra row gathers (garbageCollectIdentifyKernel,
voxel_data_structures.cu:1673-1713).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_H = 24          # 8-aligned row origin + 16 rows of coverage
PATCH_W = 256         # 128-aligned col origin + 128 cols of coverage
N_CH = 5              # d_hi, d_lo, r, g, b — all exactly representable in bf16
LANES = 512           # voxels per res-0 block
POOL_LANES = 4 * LANES          # sdf | sumsq | weight | rgbp
OUT_LANES = POOL_LANES + 128    # + flag lanes (2048: unserved count)
# measured on v5e at A=2^15 (tools/kernel_bench.py): b=16 -> 10.4ms
# (0.32us/slot), b=32 -> 10.7ms, b=8 -> a 7.5s Mosaic scheduling pathology
# with fully-active windows.  16 leaves VMEM headroom; never use 8.
BLOCKS_PER_STEP = 16

# cam vector layout (f32[1,128]):
# 0:fx 1:fy 2:cx 3:cy 4:min_depth 5:max_depth 6..14:rot(row-major cam->world)
# 15..17:trans 18:vvs 19:trunc0 20:trunc1 21:max_integration_distance
# 22:w_sample 23:w_max 24:rows 25:cols 26:Hpad 27:Wpad
CAM_VEC_LEN = 128
DEPTH_Q = 2048.0      # depth quantization 1/2048 m ~ 0.5 mm (exact bf16 split)


def _bitcast(x, dtype):
    return jax.lax.bitcast_convert_type(x, dtype)


def _kernel(b, emit_delta, img_hbm, cam_ref, meta_ref, pool_ref, out_ref,
            img_vmem, sampd_ref, sampp_ref, inp_ref, copy_sem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(img_hbm, img_vmem, copy_sem)
        cp.start()
        cp.wait()

    step_active = jnp.max(meta_ref[:, 3])

    @pl.when(step_active == 0)
    def _():
        if emit_delta:
            out_ref[...] = jnp.zeros((b, OUT_LANES), jnp.int32)
        else:
            out_ref[:, :POOL_LANES] = pool_ref[...]
            out_ref[:, POOL_LANES:] = jnp.zeros((b, 128), jnp.int32)

    @pl.when(step_active != 0)
    def _():
        fx = cam_ref[0, 0]
        fy = cam_ref[0, 1]
        cx = cam_ref[0, 2]
        cy = cam_ref[0, 3]
        min_d = cam_ref[0, 4]
        max_d = cam_ref[0, 5]
        r00, r01, r02 = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        r10, r11, r12 = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        r20, r21, r22 = cam_ref[0, 12], cam_ref[0, 13], cam_ref[0, 14]
        tx, ty, tz = cam_ref[0, 15], cam_ref[0, 16], cam_ref[0, 17]
        vvs = cam_ref[0, 18]
        t0 = cam_ref[0, 19]
        t1 = cam_ref[0, 20]
        max_int = cam_ref[0, 21]
        w_samp = cam_ref[0, 22]
        w_max = cam_ref[0, 23]
        rows_f = cam_ref[0, 24]
        cols_f = cam_ref[0, 25]
        hpad = cam_ref[0, 26]
        wpad = cam_ref[0, 27]

        # ---- batched [b,512] lattice -> pixel projection -------------------
        # meta lane 4 = block resolution (0: 8^3 dense row; 1: 4^3 carved
        # 64-lane window at lane0 = meta lane 5); local lane -> voxel offset
        # mirrors _block_voxel_grid (dense res-1 indexing fix, ops/coords.py)
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, LANES), 1)
        res1 = meta_ref[:, 4:5] == 1                          # [b,1]
        lane0 = meta_ref[:, 5:6]                              # [b,1]
        local = lane - lane0
        in_win = (local >= 0) & (local < jnp.where(res1, 64, LANES))
        lsafe = jnp.clip(local, 0, LANES - 1)
        off0x = (lsafe % 8).astype(jnp.float32)
        off0y = ((lsafe // 8) % 8).astype(jnp.float32)
        off0z = (lsafe // 64).astype(jnp.float32)
        l4 = jnp.clip(local, 0, 63)
        off1x = ((l4 % 4) * 2).astype(jnp.float32)
        off1y = (((l4 // 4) % 4) * 2).astype(jnp.float32)
        off1z = ((l4 // 16) * 2).astype(jnp.float32)
        offx = jnp.where(res1, off1x, off0x)
        offy = jnp.where(res1, off1y, off0y)
        offz = jnp.where(res1, off1z, off0z)
        bx = meta_ref[:, 0:1].astype(jnp.float32)             # [b,1]
        by = meta_ref[:, 1:2].astype(jnp.float32)
        bz = meta_ref[:, 2:3].astype(jnp.float32)
        bvalid = (meta_ref[:, 3:4] != 0) & in_win             # [b,512]

        pwx = (bx * 8.0 + offx) * vvs - tx
        pwy = (by * 8.0 + offy) * vvs - ty
        pwz = (bz * 8.0 + offz) * vvs - tz
        # world_to_cam: (pw - t) @ rot  (rot is cam->world, row-major)
        pcx = pwx * r00 + pwy * r10 + pwz * r20
        pcy = pwx * r01 + pwy * r11 + pwz * r21
        pcz = pwx * r02 + pwy * r12 + pwz * r22

        depth_ok = (pcz > min_d) & (pcz <= max_d)
        zsafe = jnp.where(pcz == 0.0, 1.0, pcz)
        # C truncation toward zero (camera.cuh projectPoint)
        rowf = fy * pcy / zsafe + cy + 0.5
        colf = fx * pcx / zsafe + cx + 0.5
        row = rowf.astype(jnp.int32)
        col = colf.astype(jnp.int32)
        # C truncation toward zero maps (-1,0) to 0, which then passes the
        # row >= 0 test — the reference's exact quirk (camera.cuh:131-165)
        ok = (bvalid & depth_ok & (row >= 0) & (col >= 0)
              & (row.astype(jnp.float32) < rows_f)
              & (col.astype(jnp.float32) < cols_f))

        iota_c = jax.lax.broadcasted_iota(jnp.int32, (PATCH_W, LANES), 0)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, LANES), 0)

        # ---- per-block patch sampling (scalar core + MXU) ------------------
        for k in range(b):
            # patch origin from the block-center projection (scalar math,
            # mirrors _sample_depth_rgb's r0/c0)
            bxk = meta_ref[k, 0].astype(jnp.float32)
            byk = meta_ref[k, 1].astype(jnp.float32)
            bzk = meta_ref[k, 2].astype(jnp.float32)
            cwx = (bxk * 8.0 + 3.5) * vvs - tx
            cwy = (byk * 8.0 + 3.5) * vvs - ty
            cwz = (bzk * 8.0 + 3.5) * vvs - tz
            ccx = cwx * r00 + cwy * r10 + cwz * r20
            ccy = cwx * r01 + cwy * r11 + cwz * r21
            ccz = cwx * r02 + cwy * r12 + cwz * r22
            czs = jnp.where(ccz == 0.0, 1.0, ccz)
            crow = (fy * ccy / czs + cy + 0.5).astype(jnp.int32)
            ccol = (fx * ccx / czs + cx + 0.5).astype(jnp.int32)
            hpi = hpad.astype(jnp.int32)
            wpi = wpad.astype(jnp.int32)
            # floor-div alignment (crow may be negative for off-image
            # centers; python-style floor division keeps origins in range)
            r0 = jnp.clip(((crow - PATCH_H // 2) // 8) * 8,
                          0, hpi - PATCH_H)
            c0 = jnp.clip(((ccol - PATCH_W // 2) // 128) * 128,
                          0, wpi - PATCH_W)
            r0 = pl.multiple_of(r0, 8)
            c0 = pl.multiple_of(c0, 128)

            dpatch = img_vmem[0, pl.ds(r0, PATCH_H), pl.ds(c0, PATCH_W)]
            ppatch = img_vmem[1, pl.ds(r0, PATCH_H), pl.ds(c0, PATCH_W)]

            # 5 bf16-exact channels stacked along sublanes [120,256]
            dq = jnp.floor(dpatch * DEPTH_Q + 0.5)        # integer-valued f32
            d_hi = jnp.floor(dq * (1.0 / 256.0))
            d_lo = dq - d_hi * 256.0
            pg = jnp.floor(ppatch * (1.0 / 256.0))
            pb = jnp.floor(pg * (1.0 / 256.0))
            cr_ = ppatch - pg * 256.0
            cg_ = pg - pb * 256.0
            patch5 = jnp.concatenate(
                [d_hi, d_lo, cr_, cg_, pb], axis=0).astype(jnp.bfloat16)

            lrk = row[k:k + 1, :] - r0                    # [1,512]
            lck = col[k:k + 1, :] - c0
            in_p = (ok[k:k + 1, :] & (lrk >= 0) & (lrk < PATCH_H)
                    & (lck >= 0) & (lck < PATCH_W))
            lrs = jnp.where(in_p, lrk, 0)
            lcs = jnp.where(in_p, lck, 0)

            # column-select-first: ohc lane-major [256,512] -> ONE dot
            ohc = (iota_c == lcs).astype(jnp.bfloat16)    # [256,512]
            tmp = jax.lax.dot_general(
                patch5, ohc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [120,512]

            # row-select: masked sublane reduce (in_p zeroes unserved lanes)
            ohr = ((iota_r == lrs) & in_p).astype(jnp.float32)  # [24,512]
            s_dhi = jnp.sum(tmp[0:PATCH_H] * ohr, axis=0, keepdims=True)
            s_dlo = jnp.sum(tmp[PATCH_H:2 * PATCH_H] * ohr, axis=0,
                            keepdims=True)
            s_r = jnp.sum(tmp[2 * PATCH_H:3 * PATCH_H] * ohr, axis=0,
                          keepdims=True)
            s_g = jnp.sum(tmp[3 * PATCH_H:4 * PATCH_H] * ohr, axis=0,
                          keepdims=True)
            s_b = jnp.sum(tmp[4 * PATCH_H:5 * PATCH_H] * ohr, axis=0,
                          keepdims=True)

            sampd_ref[k:k + 1, :] = (s_dhi * 256.0 + s_dlo) * (1.0 / DEPTH_Q)
            sampp_ref[k:k + 1, :] = s_r + s_g * 256.0 + s_b * 65536.0
            inp_ref[k:k + 1, :] = in_p.astype(jnp.int32)

        # ---- batched TSDF fuse + Welford variance --------------------------
        depth = sampd_ref[...]                            # [b,512]
        pk = sampp_ref[...].astype(jnp.int32)
        in_patch = inp_ref[...] != 0

        sdf0 = _bitcast(pool_ref[:, 0:LANES], jnp.float32)
        ssq0 = _bitcast(pool_ref[:, LANES:2 * LANES], jnp.float32)
        w0 = pool_ref[:, 2 * LANES:3 * LANES]
        rgbp0 = pool_ref[:, 3 * LANES:4 * LANES]

        depth_ok2 = ok & (depth != 0.0) & (depth <= max_int)
        sdf = depth - pcz
        trunc = t0 + t1 * depth
        inside = sdf > -trunc
        sdf = jnp.clip(sdf, -trunc, trunc)
        update = bvalid & depth_ok2 & inside

        w0f = w0.astype(jnp.float32)
        half = vvs * 0.5
        curr_mean = jnp.where(w0 > 0, sdf0, sdf)
        delta = (sdf - curr_mean) / half

        # combineVoxel (voxel_hash_utils.cuh:167-181): weighted SDF merge,
        # 50/50 color blend; first observation takes the new color outright
        r_old = (rgbp0 & 255).astype(jnp.float32)
        g_old = ((rgbp0 >> 8) & 255).astype(jnp.float32)
        b_old = ((rgbp0 >> 16) & 255).astype(jnp.float32)
        r_new = (pk & 255).astype(jnp.float32)
        g_new = ((pk >> 8) & 255).astype(jnp.float32)
        b_new = ((pk >> 16) & 255).astype(jnp.float32)
        first = w0 == 0
        r_old = jnp.where(first, r_new, r_old)
        g_old = jnp.where(first, g_new, g_old)
        b_old = jnp.where(first, b_new, b_old)
        r_m = jnp.floor(0.5 * r_old + 0.5 * r_new + 0.5)
        g_m = jnp.floor(0.5 * g_old + 0.5 * g_new + 0.5)
        b_m = jnp.floor(0.5 * b_old + 0.5 * b_new + 0.5)
        rgbp_m = (r_m + g_m * 256.0 + b_m * 65536.0).astype(jnp.int32)

        m_sdf = (sdf0 * w0f + sdf * w_samp) / (w0f + w_samp)
        m_w = jnp.minimum(w_max, w0f + w_samp).astype(jnp.int32)
        delta2 = (sdf - m_sdf) / half
        m_ssq = ssq0 + delta * delta2

        out_sdf = jnp.where(update, m_sdf, sdf0)
        out_ssq = jnp.where(update, m_ssq, ssq0)
        out_w = jnp.where(update, m_w, w0)
        out_rgbp = jnp.where(update, rgbp_m, rgbp0)

        if emit_delta:
            # delta emission for the multi-res add-writeback: sibling
            # res-1 blocks share pool rows, so the caller accumulates
            # `new - old` row deltas; emitting them in-kernel saves the
            # XLA-side old-row gathers + subtractions entirely
            upd = update
            zf = jnp.float32(0.0)
            zi = jnp.int32(0)
            out_ref[:, 0:LANES] = _bitcast(
                jnp.where(upd, out_sdf - sdf0, zf), jnp.int32)
            out_ref[:, LANES:2 * LANES] = _bitcast(
                jnp.where(upd, out_ssq - ssq0, zf), jnp.int32)
            out_ref[:, 2 * LANES:3 * LANES] = jnp.where(upd, out_w - w0, zi)
            out_ref[:, 3 * LANES:4 * LANES] = jnp.where(
                upd, out_rgbp - rgbp0, zi)
        else:
            out_ref[:, 0:LANES] = _bitcast(out_sdf, jnp.int32)
            out_ref[:, LANES:2 * LANES] = _bitcast(out_ssq, jnp.int32)
            out_ref[:, 2 * LANES:3 * LANES] = out_w
            out_ref[:, 3 * LANES:4 * LANES] = out_rgbp

        # flag lanes: 2048 unserved count; 2049/2050 GC inputs
        n_uns = jnp.sum((ok & ~in_patch).astype(jnp.int32), axis=1,
                        keepdims=True)                               # [b,1]
        abs_s = jnp.where(out_w > 0, jnp.abs(out_sdf), jnp.float32(3e38))
        min_s = jnp.min(abs_s, axis=1, keepdims=True)                # [b,1]
        max_w = jnp.max(out_w, axis=1, keepdims=True)                # [b,1]
        out_ref[:, POOL_LANES:] = jnp.concatenate(
            [n_uns, _bitcast(min_s, jnp.int32), max_w,
             jnp.zeros((b, 125), jnp.int32)], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "b", "emit_delta"))
def fused_integrate_pallas(img_cf, cam_vec, meta, pool_rows,
                           interpret=False, b=BLOCKS_PER_STEP,
                           emit_delta=False):
    """img_cf f32[2,Hpad,Wpad] (depth, rgb packed exactly into f32);
    cam_vec f32[1,128] (layout above); meta i32[A,128] (0..2 block pos,
    3 valid); pool_rows i32[A,2048] (sdf|sumsq bitcast, weight, rgbp).
    A % b == 0.  Returns i32[A,2176]: updated pool rows (or, with
    emit_delta, zero-masked `new - old` row deltas for an add-writeback)
    + flag lanes (2048 = count of in-image voxels whose pixel fell
    outside the patch)."""
    A = meta.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(A // b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # image
            pl.BlockSpec(memory_space=pltpu.VMEM),              # cam vec
            pl.BlockSpec((b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # meta
            pl.BlockSpec((b, POOL_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # pool rows
        ],
        out_specs=pl.BlockSpec((b, OUT_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(img_cf.shape, jnp.float32),
            pltpu.VMEM((b, LANES), jnp.float32),   # sampled depth
            pltpu.VMEM((b, LANES), jnp.float32),   # sampled packed rgb
            pltpu.VMEM((b, LANES), jnp.int32),     # in-patch mask
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_kernel, b, emit_delta),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, OUT_LANES), jnp.int32),
        interpret=interpret,
    )
    return call(img_cf, cam_vec, meta, pool_rows)


def make_cam_vec(cam, vvs, trunc0, trunc1, max_int, w_sample, w_max,
                 hpad, wpad):
    """Pack camera + integration constants into the kernel's f32[1,128]."""
    v = jnp.zeros((CAM_VEC_LEN,), jnp.float32)
    v = v.at[0].set(cam.fx).at[1].set(cam.fy)
    v = v.at[2].set(cam.cx).at[3].set(cam.cy)
    v = v.at[4].set(cam.min_depth).at[5].set(cam.max_depth)
    v = v.at[6:15].set(cam.rot.reshape(-1))
    v = v.at[15:18].set(cam.trans)
    v = v.at[18].set(vvs).at[19].set(trunc0).at[20].set(trunc1)
    v = v.at[21].set(max_int).at[22].set(float(w_sample))
    v = v.at[23].set(float(w_max))
    v = v.at[24].set(float(cam.rows)).at[25].set(float(cam.cols))
    v = v.at[26].set(float(hpad)).at[27].set(float(wpad))
    return v.reshape(1, CAM_VEC_LEN)
