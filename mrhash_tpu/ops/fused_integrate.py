"""Fused Pallas TSDF-integrate kernel: projection + image sampling + SDF
fuse + Welford variance + row writeback in ONE VMEM-resident pass.

TPU-native re-derivation of the reference's integrateDepthMapKernel
(mrhash/src/sdf/voxel_data_structures.cu:1094-1181).  Replaces the split
sampler-kernel + XLA projection/fuse/scatter stages of ops/integrate.py
(round-1 profile: the split pipeline cost ~4.2us per compacted-window slot;
the separate stages re-streamed [A,512] f32 tensors through HBM ~10 times).

Per grid step (BLOCKS_PER_STEP=b row slots):
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

Multi-res mode (multires=True) packs sibling res-1 blocks — 64-lane carves
of a SHARED pool row (hashtable carve layout, voxel_data_structures.cu:
859-871) — into ONE row slot with per-group meta, instead of giving each
carve its own 87.5%-padded slot.  Each slot's pool row is then unique, so
the writeback is a plain row scatter-set and the slot count shrinks by the
sibling density.  Group sampling runs as 4 PAIR dots per packed slot: the
two groups' [120,256] patches stack along the contraction dim ([120,512] @
[512,128] -> [120,128], output lanes = the pair's 128 slot lanes in order),
costing 4x120x512x128 = 31.5M MACs — 4x less MXU work than the 8
single-carve slots it replaces.

The slot stream is SEGREGATED by kind (ops/integrate.pack_window_rows):
res-0 slots first, packed res-1 slots after, starting on a step-aligned
boundary.  Every grid step is therefore single-kind and the kernel branches
ONCE per step on the kind lane — per-slot `pl.when` branches measured
1.28us/slot vs 0.32us/slot for branch-free steps (v5e, A=36864).  The
plain/packed branches only project + sample into scratch; the TSDF fuse and
flag emission run once, shared, reading the scratch.

Pool rows ride as ONE packed i32[A, 2176] operand (sdf|sumsq bitcast, weight,
packed rgb, + flag lanes) so each grid step issues 3 blocked DMAs
(meta, pool in, pool out) — per-step DMA issue overhead measured ~6us/step
with 5 operands in round 1.

Flag lanes (POOL_LANES + j):
  0 unserved-lane count (in-image voxels whose pixel fell outside the patch)
  1 min |sdf| over weighted lanes (GC identify input, full row)
  2 max weight (full row)
  3 weight total (coarsen decide input, checkVarSDFKernel)
  4 sum of sum_squared over weighted lanes (f32 bitcast)
  8+g / 16+g / 24+g: per-group unserved / min|sdf| / max-weight for packed
  rows (g = lane//64 carve index) — the caller maps them back to the
  per-block window entries so GC/coarsen need no row gathers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_H = 24          # 8-aligned row origin + 16 rows of coverage
PATCH_W = 256         # 128-aligned col origin + 128 cols of coverage
# res-1 carves span 2x the metric extent of a res-0 block, so their
# projected footprint is ~2x taller; 24 rows starved ~1900 carve blocks
# into the 128-block/frame element fallback at Replica settings (measured).
# 80 rows guarantee +-32 px of row coverage after 8-alignment slack.
PATCH_HP = 80         # packed-branch patch rows (res-1 carve groups)
N_CH = 5              # d_hi, d_lo, r, g, b — all exactly representable in bf16
LANES = 512           # voxels per res-0 block
GRP = 64              # voxels per res-1 carve group
PAIR = 2 * GRP        # output lanes of one packed-pair dot
POOL_LANES = 4 * LANES          # sdf | sumsq | weight | rgbp
OUT_LANES = POOL_LANES + 128    # + flag lanes (layout above)
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

FAR_F32 = 3e38


def _bitcast(x, dtype):
    return jax.lax.bitcast_convert_type(x, dtype)


def _split5(patch_d, patch_p):
    """Depth+packed-rgb f32 patches -> stacked 5-channel bf16 [5*H, W].
    All channel values are integers < 256 (or the d_hi quotient < 256 for
    depths under 32 m), hence bf16-exact."""
    dq = jnp.floor(patch_d * DEPTH_Q + 0.5)           # integer-valued f32
    d_hi = jnp.floor(dq * (1.0 / 256.0))
    d_lo = dq - d_hi * 256.0
    pg = jnp.floor(patch_p * (1.0 / 256.0))
    pb = jnp.floor(pg * (1.0 / 256.0))
    cr_ = patch_p - pg * 256.0
    cg_ = pg - pb * 256.0
    return jnp.concatenate([d_hi, d_lo, cr_, cg_, pb],
                           axis=0).astype(jnp.bfloat16)


def _kernel(b, multires, img_hbm, cam_ref, meta_ref, pool_ref, out_ref,
            img_vmem, sampd_ref, sampp_ref, inp_ref, pcz_ref, okv_ref,
            copy_sem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(img_hbm, img_vmem, copy_sem)
        cp.start()
        cp.wait()

    step_active = jnp.max(meta_ref[:, 3])

    @pl.when(step_active == 0)
    def _():
        out_ref[:, :POOL_LANES] = pool_ref[...]
        out_ref[:, POOL_LANES:] = jnp.zeros((b, 128), jnp.int32)

    # ---- shared scalar loads + closures -----------------------------------
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
    hpi = hpad.astype(jnp.int32)
    wpi = wpad.astype(jnp.int32)

    def origin_of(crow, ccol, ph=PATCH_H):
        # floor-div alignment (projected centers may be negative for
        # off-image blocks; python-style floor division keeps origins
        # in range)
        r0 = jnp.clip(((crow - ph // 2) // 8) * 8, 0, hpi - ph)
        c0 = jnp.clip(((ccol - PATCH_W // 2) // 128) * 128,
                      0, wpi - PATCH_W)
        return pl.multiple_of(r0, 8), pl.multiple_of(c0, 128)

    def center_rc(bxk, byk, bzk):
        # block-center projection (scalar math, mirrors _sample_depth_rgb's
        # r0/c0 and _patch_origins)
        cwx = (bxk * 8.0 + 3.5) * vvs - tx
        cwy = (byk * 8.0 + 3.5) * vvs - ty
        cwz = (bzk * 8.0 + 3.5) * vvs - tz
        ccx = cwx * r00 + cwy * r10 + cwz * r20
        ccy = cwx * r01 + cwy * r11 + cwz * r21
        ccz = cwx * r02 + cwy * r12 + cwz * r22
        czs = jnp.where(ccz == 0.0, 1.0, ccz)
        crow = (fy * ccy / czs + cy + 0.5).astype(jnp.int32)
        ccol = (fx * ccx / czs + cx + 0.5).astype(jnp.int32)
        return crow, ccol

    def project_store(bx, by, bz, offx, offy, offz, valid_lane):
        """[b,512] lattice -> pixel projection; persists pcz + ok to scratch
        for the shared fuse stage; returns (row, col, ok) for sampling."""
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
        ok = (valid_lane & depth_ok & (row >= 0) & (col >= 0)
              & (row.astype(jnp.float32) < rows_f)
              & (col.astype(jnp.float32) < cols_f))
        pcz_ref[...] = pcz
        okv_ref[...] = ok.astype(jnp.int32)
        return row, col, ok

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, LANES), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (PATCH_W, LANES), 0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, LANES), 0)

    if multires:
        step_kind = jnp.max(meta_ref[:, 4])
        plain_pred = (step_active != 0) & (step_kind == 0)
    else:
        plain_pred = step_active != 0

    # ---- plain steps: one res-0 block per slot, dense 8^3 row -------------
    @pl.when(plain_pred)
    def _():
        bx = meta_ref[:, 0:1].astype(jnp.float32)             # [b,1]
        by = meta_ref[:, 1:2].astype(jnp.float32)
        bz = meta_ref[:, 2:3].astype(jnp.float32)
        valid_lane = meta_ref[:, 3:4] != 0                    # [b,1]->[b,512]
        offx = (lane % 8).astype(jnp.float32)
        offy = ((lane // 8) % 8).astype(jnp.float32)
        offz = (lane // 64).astype(jnp.float32)
        row, col, ok = project_store(bx, by, bz, offx, offy, offz,
                                     valid_lane)

        for k in range(b):
            crow, ccol = center_rc(meta_ref[k, 0].astype(jnp.float32),
                                   meta_ref[k, 1].astype(jnp.float32),
                                   meta_ref[k, 2].astype(jnp.float32))
            r0, c0 = origin_of(crow, ccol)
            patch5 = _split5(
                img_vmem[0, pl.ds(r0, PATCH_H), pl.ds(c0, PATCH_W)],
                img_vmem[1, pl.ds(r0, PATCH_H), pl.ds(c0, PATCH_W)])

            lrk = row[k:k + 1, :] - r0                        # [1,512]
            lck = col[k:k + 1, :] - c0
            in_p = (ok[k:k + 1, :] & (lrk >= 0) & (lrk < PATCH_H)
                    & (lck >= 0) & (lck < PATCH_W))
            lrs = jnp.where(in_p, lrk, 0)
            lcs = jnp.where(in_p, lck, 0)

            # column-select-first: ohc lane-major [256,512] -> ONE dot
            ohc = (iota_c == lcs).astype(jnp.bfloat16)        # [256,512]
            tmp = jax.lax.dot_general(
                patch5, ohc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [120,512]

            # row-select: masked sublane reduce (in_p zeroes unserved)
            ohr = ((iota_r == lrs) & in_p).astype(jnp.float32)  # [24,512]
            s = [jnp.sum(tmp[c * PATCH_H:(c + 1) * PATCH_H] * ohr,
                         axis=0, keepdims=True) for c in range(N_CH)]

            sampd_ref[k:k + 1, :] = (s[0] * 256.0 + s[1]) * (1.0 / DEPTH_Q)
            sampp_ref[k:k + 1, :] = s[2] + s[3] * 256.0 + s[4] * 65536.0
            inp_ref[k:k + 1, :] = in_p.astype(jnp.int32)

    # ---- packed steps (multires): 8 res-1 carve groups per slot -----------
    if multires:
        @pl.when((step_active != 0) & (step_kind != 0))
        def _():
            grp = lane // GRP

            def gsel(base):
                acc = jnp.zeros((b, LANES), jnp.int32)
                for j in range(8):
                    acc = jnp.where(grp == j,
                                    meta_ref[:, base + 4 * j:
                                             base + 4 * j + 1], acc)
                return acc

            bx = gsel(8).astype(jnp.float32)
            by = gsel(9).astype(jnp.float32)
            bz = gsel(10).astype(jnp.float32)
            valid_lane = gsel(11) != 0
            local = lane % GRP
            # res-1 carve offsets: 4^3 samples at 2x spacing
            offx = ((local % 4) * 2).astype(jnp.float32)
            offy = (((local // 4) % 4) * 2).astype(jnp.float32)
            offz = ((local // 16) * 2).astype(jnp.float32)
            row, col, ok = project_store(bx, by, bz, offx, offy, offz,
                                         valid_lane)

            iota_cp = jax.lax.broadcasted_iota(jnp.int32,
                                               (2 * PATCH_W, PAIR), 0)
            iota_rp = jax.lax.broadcasted_iota(jnp.int32, (PATCH_HP, PAIR),
                                               0)
            jhalf = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR), 1) >= GRP

            for k in range(b):
                # 4 unconditional pair dots; each serves groups (2p, 2p+1)
                # with their OWN patches stacked along the contraction dim.
                # Invalid groups sample garbage that ok/valid_lane masks.
                for p_ in range(4):
                    ga, gb_ = 2 * p_, 2 * p_ + 1
                    l0 = p_ * PAIR
                    ra, ca = center_rc(
                        meta_ref[k, 8 + 4 * ga].astype(jnp.float32),
                        meta_ref[k, 9 + 4 * ga].astype(jnp.float32),
                        meta_ref[k, 10 + 4 * ga].astype(jnp.float32))
                    rb, cb = center_rc(
                        meta_ref[k, 8 + 4 * gb_].astype(jnp.float32),
                        meta_ref[k, 9 + 4 * gb_].astype(jnp.float32),
                        meta_ref[k, 10 + 4 * gb_].astype(jnp.float32))
                    r0a, c0a = origin_of(ra, ca, PATCH_HP)
                    r0b, c0b = origin_of(rb, cb, PATCH_HP)
                    pair5 = jnp.concatenate([
                        _split5(img_vmem[0, pl.ds(r0a, PATCH_HP),
                                         pl.ds(c0a, PATCH_W)],
                                img_vmem[1, pl.ds(r0a, PATCH_HP),
                                         pl.ds(c0a, PATCH_W)]),
                        _split5(img_vmem[0, pl.ds(r0b, PATCH_HP),
                                         pl.ds(c0b, PATCH_W)],
                                img_vmem[1, pl.ds(r0b, PATCH_HP),
                                         pl.ds(c0b, PATCH_W)]),
                    ], axis=1)                                # [400, 512]

                    lrk = (row[k:k + 1, l0:l0 + PAIR]
                           - jnp.where(jhalf, r0b, r0a))      # [1,128]
                    lck = (col[k:k + 1, l0:l0 + PAIR]
                           - jnp.where(jhalf, c0b, c0a))
                    in_p = (ok[k:k + 1, l0:l0 + PAIR]
                            & (lrk >= 0) & (lrk < PATCH_HP)
                            & (lck >= 0) & (lck < PATCH_W))
                    lrs = jnp.where(in_p, lrk, 0)
                    # group B's patch occupies contraction cols
                    # [PATCH_W, 2*PATCH_W)
                    lcs = (jnp.where(in_p, lck, 0)
                           + jnp.where(jhalf, PATCH_W, 0))

                    ohc = (iota_cp == lcs).astype(jnp.bfloat16)  # [512,128]
                    tmp = jax.lax.dot_general(
                        pair5, ohc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)      # [400,128]

                    ohr = ((iota_rp == lrs) & in_p).astype(jnp.float32)
                    s = [jnp.sum(tmp[c * PATCH_HP:(c + 1) * PATCH_HP] * ohr,
                                 axis=0, keepdims=True)
                         for c in range(N_CH)]

                    sampd_ref[k:k + 1, l0:l0 + PAIR] = (
                        (s[0] * 256.0 + s[1]) * (1.0 / DEPTH_Q))
                    sampp_ref[k:k + 1, l0:l0 + PAIR] = (
                        s[2] + s[3] * 256.0 + s[4] * 65536.0)
                    inp_ref[k:k + 1, l0:l0 + PAIR] = in_p.astype(jnp.int32)

    # ---- shared TSDF fuse + Welford variance + flags ----------------------
    @pl.when(step_active != 0)
    def _():
        depth = sampd_ref[...]                            # [b,512]
        pk = sampp_ref[...].astype(jnp.int32)
        in_patch = inp_ref[...] != 0
        pcz = pcz_ref[...]
        ok = okv_ref[...] != 0

        sdf0 = _bitcast(pool_ref[:, 0:LANES], jnp.float32)
        ssq0 = _bitcast(pool_ref[:, LANES:2 * LANES], jnp.float32)
        w0 = pool_ref[:, 2 * LANES:3 * LANES]
        rgbp0 = pool_ref[:, 3 * LANES:4 * LANES]

        depth_ok2 = ok & (depth != 0.0) & (depth <= max_int)
        sdf = depth - pcz
        trunc = t0 + t1 * depth
        inside = sdf > -trunc
        sdf = jnp.clip(sdf, -trunc, trunc)
        update = depth_ok2 & inside

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

        out_ref[:, 0:LANES] = _bitcast(out_sdf, jnp.int32)
        out_ref[:, LANES:2 * LANES] = _bitcast(out_ssq, jnp.int32)
        out_ref[:, 2 * LANES:3 * LANES] = out_w
        out_ref[:, 3 * LANES:4 * LANES] = out_rgbp

        # ---- flag lanes (layout in the module docstring) ------------------
        # group lanes are emitted unconditionally under multires; for plain
        # steps they hold sub-row stats of res-0 rows, which no caller reads
        # (per-entry mapping picks group lanes only for res-1 entries)
        unserved = (ok & ~in_patch).astype(jnp.int32)
        n_uns = jnp.sum(unserved, axis=1, keepdims=True)             # [b,1]
        abs_s = jnp.where(out_w > 0, jnp.abs(out_sdf), jnp.float32(FAR_F32))
        min_s = jnp.min(abs_s, axis=1, keepdims=True)                # [b,1]
        max_w = jnp.max(out_w, axis=1, keepdims=True)                # [b,1]
        w_tot = jnp.sum(out_w, axis=1, keepdims=True)
        ssq_tot = jnp.sum(jnp.where(out_w > 0, out_ssq, 0.0), axis=1,
                          keepdims=True)
        parts = [n_uns, _bitcast(min_s, jnp.int32), max_w, w_tot,
                 _bitcast(ssq_tot, jnp.int32), jnp.zeros((b, 3), jnp.int32)]
        if multires:
            grp = lane // GRP
            for j in range(8):
                in_g = grp == j
                parts.append(jnp.sum(jnp.where(in_g, unserved, 0), axis=1,
                                     keepdims=True))
            for j in range(8):
                in_g = grp == j
                parts.append(_bitcast(jnp.min(
                    jnp.where(in_g, abs_s, jnp.float32(FAR_F32)),
                    axis=1, keepdims=True), jnp.int32))
            for j in range(8):
                in_g = grp == j
                parts.append(jnp.max(jnp.where(in_g, out_w, 0), axis=1,
                                     keepdims=True))
            parts.append(jnp.zeros((b, 128 - 32), jnp.int32))
        else:
            parts.append(jnp.zeros((b, 128 - 8), jnp.int32))
        out_ref[:, POOL_LANES:] = jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "b", "multires"))
def fused_integrate_pallas(img_cf, cam_vec, meta, pool_rows,
                           interpret=False, b=BLOCKS_PER_STEP,
                           multires=False):
    """img_cf f32[2,Hpad,Wpad] (depth, rgb packed exactly into f32);
    cam_vec f32[1,128] (layout above); meta i32[A,128] (0..2 block pos,
    3 valid, 4 kind (1 = packed res-1 row), 8+4g..11+4g per-group
    bx/by/bz/valid for packed rows); pool_rows i32[A,2048] (sdf|sumsq
    bitcast, weight, rgbp).  A % b == 0, and the slot stream must be
    kind-segregated so each b-slot step is single-kind
    (ops/integrate.pack_window_rows).  Returns i32[A,2176]: updated pool
    rows + flag lanes (layout in the module docstring)."""
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
            pltpu.VMEM((b, LANES), jnp.float32),   # projected camera z
            pltpu.VMEM((b, LANES), jnp.int32),     # lattice-projection ok
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_kernel, b, multires),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, OUT_LANES), jnp.int32),
        interpret=interpret,
    )
    return call(img_cf, cam_vec, meta, pool_rows)


# ---------------------------------------------------------------------------
# spherical (LiDAR) fused integrate: voxel-centric projective update
# ---------------------------------------------------------------------------
#
# TPU-native replacement for integrate3DKernel's per-point voxel walk
# (voxel_data_structures.cu:1214-1401).  The per-point DDA + per-visited-
# voxel hash lookup + global scatter-aggregation costs ~30 ms/frame in XLA
# (655k visited keys at Newer-College settings); inverting the loop makes it
# a dense per-block pass: rasterize the scan to a range image once, then for
# every voxel of every compacted-window block sample the range image at the
# voxel's own spherical projection and apply the projective SDF update.
# Semantics notes (documented deviation, DESIGN.md D19):
#   - update set: voxels with |sdf| < trunc w.r.t. their own pixel ray,
#     instead of voxels visited by per-point band walks — identical away
#     from silhouettes, one-voxel staggered at them;  the band gate
#     (sdf < trunc, not just sdf > -trunc) keeps the 3D kernel's
#     no-free-space-carving behavior;
#   - one update per voxel per frame (nearest scan pixel) instead of the
#     reference's racing multi-ray writes (one racer wins there too);
#   - the 3D kernel's Welford quirk is kept: curr_mean stays 0 for
#     never-touched voxels (:1362-1370).
#
# ALL transcendental projection math (atan2/asin) runs OUTSIDE the kernel:
# the caller precomputes, per slot lane, the packed local patch coords +
# masks (`proj` lanes 0..511) and the voxel's camera range (bitcast f32,
# lanes 512..1023), and per-slot/per-group 128-aligned patch column origins
# in spare meta lanes (5 for plain slots, 40..47 per packed group).  The
# scan's full elevation extent rides in every patch ([Hp, 256] window of
# the azimuth-wrap-padded range image), so out-of-patch lanes exist only in
# azimuth (near blocks) and go to the caller's element fallback.
#
# proj lane packing (lanes 0..511): bits 0..11 unwrapped local col (full
# value, so the element fallback can recover absolute columns of
# out-of-patch lanes), 12..19 row, 20 in-patch, 21 projection-ok (in-image
# + range in bounds).

SPH_N_CH = 3          # range split hi/mid/lo — exact in bf16 up to 2^24/DQ m


def _split3_range(patch):
    """Range f32 patch -> stacked 3-channel bf16 [3*Hp, W].  dq < 2^24
    (100 m at DEPTH_Q=2048 is 204800), each base-256 digit <= 255 and the
    hi quotient <= dq/65536 < 256 — all bf16-exact."""
    dq = jnp.floor(patch * DEPTH_Q + 0.5)
    hi = jnp.floor(dq * (1.0 / 65536.0))
    mid_q = jnp.floor(dq * (1.0 / 256.0))
    mid = mid_q - hi * 256.0
    lo = dq - mid_q * 256.0
    return jnp.concatenate([hi, mid, lo], axis=0).astype(jnp.bfloat16)


def _kernel_sph(b, multires, hp, img_hbm, cam_ref, meta_ref, proj_ref,
                pool_ref, out_ref, img_vmem, sampd_ref, copy_sem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(img_hbm, img_vmem, copy_sem)
        cp.start()
        cp.wait()

    step_active = jnp.max(meta_ref[:, 3])

    @pl.when(step_active == 0)
    def _():
        out_ref[:, :POOL_LANES] = pool_ref[...]
        out_ref[:, POOL_LANES:] = jnp.zeros((b, 128), jnp.int32)

    t0 = cam_ref[0, 19]
    t1 = cam_ref[0, 20]
    max_int = cam_ref[0, 21]
    w_samp = cam_ref[0, 22]
    w_max = cam_ref[0, 23]

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, LANES), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (PATCH_W, LANES), 0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (hp, LANES), 0)

    rc = proj_ref[:, :LANES]
    lck_all = rc & 4095
    row_all = (rc >> 12) & 255
    inp_all = ((rc >> 20) & 1) != 0
    ok_all = ((rc >> 21) & 1) != 0

    if multires:
        step_kind = jnp.max(meta_ref[:, 4])
        plain_pred = (step_active != 0) & (step_kind == 0)
    else:
        plain_pred = step_active != 0

    # ---- plain steps: one res-0 block per slot, one dot per block ----------
    @pl.when(plain_pred)
    def _():
        for k in range(b):
            c0 = pl.multiple_of(meta_ref[k, 5], 128)
            patch3 = _split3_range(img_vmem[:, pl.ds(c0, PATCH_W)])

            in_p = inp_all[k:k + 1, :]
            lcs = jnp.where(in_p, lck_all[k:k + 1, :], 0)
            lrs = jnp.where(in_p, row_all[k:k + 1, :], 0)

            ohc = (iota_c == lcs).astype(jnp.bfloat16)        # [256,512]
            tmp = jax.lax.dot_general(
                patch3, ohc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [3*hp,512]

            ohr = ((iota_r == lrs) & in_p).astype(jnp.float32)  # [hp,512]
            s = [jnp.sum(tmp[c * hp:(c + 1) * hp] * ohr,
                         axis=0, keepdims=True) for c in range(SPH_N_CH)]
            sampd_ref[k:k + 1, :] = (
                (s[0] * 65536.0 + s[1] * 256.0 + s[2]) * (1.0 / DEPTH_Q))

    # ---- packed steps (multires): 8 res-1 carve groups per slot ------------
    if multires:
        @pl.when((step_active != 0) & (step_kind != 0))
        def _():
            iota_cp = jax.lax.broadcasted_iota(jnp.int32,
                                               (2 * PATCH_W, PAIR), 0)
            iota_rp = jax.lax.broadcasted_iota(jnp.int32, (hp, PAIR), 0)
            jhalf = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR), 1) >= GRP

            for k in range(b):
                for p_ in range(4):
                    l0 = p_ * PAIR
                    c0a = pl.multiple_of(meta_ref[k, 40 + 2 * p_], 128)
                    c0b = pl.multiple_of(meta_ref[k, 41 + 2 * p_], 128)
                    pair3 = jnp.concatenate([
                        _split3_range(img_vmem[:, pl.ds(c0a, PATCH_W)]),
                        _split3_range(img_vmem[:, pl.ds(c0b, PATCH_W)]),
                    ], axis=1)                                # [3*hp, 512]

                    in_p = inp_all[k:k + 1, l0:l0 + PAIR]
                    lrs = jnp.where(in_p, row_all[k:k + 1, l0:l0 + PAIR], 0)
                    # group B's patch occupies contraction cols
                    # [PATCH_W, 2*PATCH_W)
                    lcs = (jnp.where(in_p, lck_all[k:k + 1, l0:l0 + PAIR], 0)
                           + jnp.where(jhalf, PATCH_W, 0))

                    ohc = (iota_cp == lcs).astype(jnp.bfloat16)  # [512,128]
                    tmp = jax.lax.dot_general(
                        pair3, ohc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)      # [3*hp,128]

                    ohr = ((iota_rp == lrs) & in_p).astype(jnp.float32)
                    s = [jnp.sum(tmp[c * hp:(c + 1) * hp] * ohr,
                                 axis=0, keepdims=True)
                         for c in range(SPH_N_CH)]
                    sampd_ref[k:k + 1, l0:l0 + PAIR] = (
                        (s[0] * 65536.0 + s[1] * 256.0 + s[2])
                        * (1.0 / DEPTH_Q))

    # ---- shared projective fuse + Welford + flags --------------------------
    @pl.when(step_active != 0)
    def _():
        r_px = sampd_ref[...]                             # [b,512]
        in_patch = inp_all
        ok = ok_all
        r_vox = _bitcast(proj_ref[:, LANES:], jnp.float32)

        sdf0 = _bitcast(pool_ref[:, 0:LANES], jnp.float32)
        ssq0 = _bitcast(pool_ref[:, LANES:2 * LANES], jnp.float32)
        w0 = pool_ref[:, 2 * LANES:3 * LANES]

        sdf = r_px - r_vox
        trunc = t0 + t1 * r_px
        # band gate both sides: the 3D kernel only touches voxels inside
        # the truncation band (no free-space carving)
        update = (ok & in_patch & (r_px > 0.0) & (r_px <= max_int)
                  & (sdf > -trunc) & (sdf < trunc))
        sdf = jnp.clip(sdf, -trunc, trunc)

        w0f = w0.astype(jnp.float32)
        half = cam_ref[0, 18] * 0.5
        # 3D kernel quirk: curr_mean stays 0 for never-touched voxels
        curr_mean = jnp.where(w0 > 0, sdf0, 0.0)
        delta = (sdf - curr_mean) / half
        m_sdf = (sdf0 * w0f + sdf * w_samp) / (w0f + w_samp)
        m_w = jnp.minimum(w_max, w0f + w_samp).astype(jnp.int32)
        delta2 = (sdf - m_sdf) / half
        m_ssq = ssq0 + delta * delta2

        out_sdf = jnp.where(update, m_sdf, sdf0)
        out_ssq = jnp.where(update, m_ssq, ssq0)
        out_w = jnp.where(update, m_w, w0)

        out_ref[:, 0:LANES] = _bitcast(out_sdf, jnp.int32)
        out_ref[:, LANES:2 * LANES] = _bitcast(out_ssq, jnp.int32)
        out_ref[:, 2 * LANES:3 * LANES] = out_w
        out_ref[:, 3 * LANES:4 * LANES] = pool_ref[:, 3 * LANES:4 * LANES]

        unserved = (ok & ~in_patch).astype(jnp.int32)
        n_uns = jnp.sum(unserved, axis=1, keepdims=True)             # [b,1]
        abs_s = jnp.where(out_w > 0, jnp.abs(out_sdf), jnp.float32(FAR_F32))
        min_s = jnp.min(abs_s, axis=1, keepdims=True)
        max_w = jnp.max(out_w, axis=1, keepdims=True)
        w_tot = jnp.sum(out_w, axis=1, keepdims=True)
        ssq_tot = jnp.sum(jnp.where(out_w > 0, out_ssq, 0.0), axis=1,
                          keepdims=True)
        parts = [n_uns, _bitcast(min_s, jnp.int32), max_w, w_tot,
                 _bitcast(ssq_tot, jnp.int32), jnp.zeros((b, 3), jnp.int32)]
        if multires:
            grp = lane // GRP
            for j in range(8):
                in_g = grp == j
                parts.append(jnp.sum(jnp.where(in_g, unserved, 0), axis=1,
                                     keepdims=True))
            for j in range(8):
                in_g = grp == j
                parts.append(_bitcast(jnp.min(
                    jnp.where(in_g, abs_s, jnp.float32(FAR_F32)),
                    axis=1, keepdims=True), jnp.int32))
            for j in range(8):
                in_g = grp == j
                parts.append(jnp.max(jnp.where(in_g, out_w, 0), axis=1,
                                     keepdims=True))
            parts.append(jnp.zeros((b, 128 - 32), jnp.int32))
        else:
            parts.append(jnp.zeros((b, 128 - 8), jnp.int32))
        out_ref[:, POOL_LANES:] = jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "b", "multires"))
def fused_integrate_points_pallas(rng_img, cam_vec, meta, proj, pool_rows,
                                  interpret=False, b=BLOCKS_PER_STEP,
                                  multires=False):
    """rng_img f32[Hp, Wp]: rasterized scan range image, Hp the 8-aligned
    scan height (full elevation extent rides in every patch), Wp the
    azimuth-wrap-padded width (caller pads 128 columns each side);
    cam_vec f32[1,128] (make_cam_vec layout; only lanes 18..23 are read);
    meta i32[A,128]: lanes 0..4 as the RGB-D kernel, lane 5 per-slot patch
    column origin, lanes 40..47 per-group origins for packed rows;
    proj i32[A,1024]: lanes 0..511 packed local coords/masks (see module
    comment), lanes 512..1023 voxel camera range (bitcast f32);
    pool_rows i32[A,2048].  Returns i32[A,2176] like the RGB-D kernel."""
    A = meta.shape[0]
    hp = rng_img.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(A // b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # range image
            pl.BlockSpec(memory_space=pltpu.VMEM),              # cam vec
            pl.BlockSpec((b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # meta
            pl.BlockSpec((b, 2 * LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # proj
            pl.BlockSpec((b, POOL_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # pool rows
        ],
        out_specs=pl.BlockSpec((b, OUT_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(rng_img.shape, jnp.float32),
            pltpu.VMEM((b, LANES), jnp.float32),   # sampled range
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_kernel_sph, b, multires, hp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, OUT_LANES), jnp.int32),
        interpret=interpret,
    )
    return call(rng_img, cam_vec, meta, proj, pool_rows)


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
