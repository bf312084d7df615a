"""TSDF allocation + integration + garbage collection + variance coarsening.

TPU-native re-derivation of the reference's CUDA kernels
(mrhash/src/sdf/voxel_data_structures.cu): per-pixel DDA allocation becomes a
vectorized lax.scan over a static step count; the bucket-mutex allocator
becomes salted scatter-dedup + batched insert (ops/hashtable.py); per-voxel
integration is a gather -> fused elementwise -> unique-scatter over the
compacted block window; the GC z-buffer is two scatter-min passes; the
variance merge is a lane reduction + batched realloc.

Everything is shape-static and jit-compilable; dynamic counts ride in scalar
int32s with masking.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mrhash_tpu import params as P
from mrhash_tpu.core.state import (MapConfig, MapState, VoxelPool, pack_rgb,
                                   unpack_rgb)
from mrhash_tpu.ops import camera as C
from mrhash_tpu.ops import coords as X
from mrhash_tpu.ops import hashtable as H

INF = jnp.float32(jnp.inf)
FI_PATCH_W = 256   # fused-kernel patch width (ops/fused_integrate.PATCH_W)


# ---------------------------------------------------------------------------
# frustum culling
# ---------------------------------------------------------------------------

def blocks_in_frustum_approx(cam: C.Camera, block_pos, vvs,
                             exact_corners: bool = False):
    """isSDFBlockInCameraFrustumApprox (voxel_data_structures.cu:66-78).

    The reference tests all 8 corner voxels against the +-50%-padded
    frustum; by default we test the block center against the same padded
    frustum with the depth range widened by the block diagonal — an 8x
    cheaper test whose acceptance region still covers the reference's (the
    50% border slack dwarfs a block's angular size beyond ~10 block
    diagonals of depth; nearer blocks are handled by the widened depth
    range).  Pass exact_corners=True for the literal 8-corner test."""
    base = X.sdf_block_to_virtual_voxel_pos(block_pos)         # [...,3]
    if exact_corners:
        corner = jnp.asarray(
            [[0, 0, 0], [0, 0, 7], [0, 7, 0], [0, 7, 7],
             [7, 0, 0], [7, 0, 7], [7, 7, 0], [7, 7, 7]], jnp.int32)
        pw = X.virtual_voxel_pos_to_world(vvs, base[..., None, :] + corner)
        return jnp.any(C.is_in_camera_frustum_approx(cam, pw), axis=-1)
    half = 3.5 * vvs
    center = X.virtual_voxel_pos_to_world(vvs, base) + half
    diag = jnp.float32(P.SDF_BLOCK_SIZE * vvs * 1.8)
    pc = C.world_to_cam(cam, center)
    row, col, _ = C.project_point_approx(cam, pc)
    depth = C.get_depth(cam, pc)
    depth_ok = (depth > cam.min_depth - diag) & (depth <= cam.max_depth
                                                 + diag)
    rt = int(cam.rows * 0.5)
    ct = int(cam.cols * 0.5)
    inside = ((row >= -rt) & (col >= -ct)
              & (row < cam.rows + rt) & (col < cam.cols + ct))
    return depth_ok & inside


# ---------------------------------------------------------------------------
# DDA candidate generation
# ---------------------------------------------------------------------------

def _dda_visit(cfg: MapConfig, cam: C.Camera, pw_min, pw_max, ray_valid,
               num_steps: int, block_level: bool = True):
    """Shared DDA core of allocBlocks{,3D}Kernel and integrate3DKernel
    (voxel_data_structures.cu:790-857, 963-1033, 1259-1303): walk the block
    grid (block_level) or the virtual-voxel grid from pw_min to pw_max,
    emitting every visited cell.

    pw_min/pw_max: f32[R,3] world endpoints.  Returns (cells i32[K,R,3],
    visit_mask bool[K,R])."""
    vvs = cfg.virtual_voxel_size
    ext = jnp.asarray(cfg.voxel_extents, jnp.float32)

    seg = pw_max - pw_min
    seg_len = jnp.linalg.norm(seg, axis=-1, keepdims=True)
    direction = seg / jnp.where(seg_len == 0, 1.0, seg_len)

    step = jnp.sign(direction)
    step_i = jnp.clip(step, 0.0, 1.0).astype(jnp.int32)
    if block_level:
        id_cur = X.world_point_to_sdf_block(vvs, ext, pw_min)
        id_end = X.world_point_to_sdf_block(vvs, ext, pw_max)
        boundary = X.sdf_block_to_world_point(vvs, id_cur + step_i) - 0.5 * vvs
        cell_metric = P.SDF_BLOCK_SIZE * vvs
    else:
        id_cur = X.world_point_to_virtual_voxel_pos(vvs, pw_min)
        id_end = X.world_point_to_virtual_voxel_pos(vvs, pw_max)
        boundary = X.virtual_voxel_pos_to_world(vvs, id_cur + step_i) - 0.5 * vvs
        cell_metric = vvs
    safe_dir = jnp.where(direction == 0, 1.0, direction)
    t_max = (boundary - pw_min) / safe_dir
    t_delta = (step * cell_metric) / safe_dir
    degenerate = (jnp.abs(direction) < P.FLOAT_EPSILON) | (
        jnp.abs(boundary - direction) < P.FLOAT_EPSILON)
    t_max = jnp.where(degenerate, INF, t_max)
    t_delta = jnp.where(degenerate, INF, t_delta)
    id_bound = (id_end.astype(jnp.float32) + step).astype(jnp.int32)

    def body(carry, _):
        id_cur, t_max, alive = carry
        emit_blocks = id_cur
        emit_mask = alive
        tx, ty, tz = t_max[..., 0], t_max[..., 1], t_max[..., 2]
        ax_x = (tx < ty) & (tx < tz)
        ax_z = ~ax_x & (tz < ty)
        ax_y = ~ax_x & ~ax_z
        axis = jnp.stack([ax_x, ax_y, ax_z], axis=-1)
        id_next = jnp.where(axis, id_cur + step.astype(jnp.int32), id_cur)
        hit_bound = jnp.any(axis & (id_next == id_bound), axis=-1)
        t_next = jnp.where(axis, t_max + t_delta, t_max)
        alive = alive & ~hit_bound
        return (id_next, t_next, alive), (emit_blocks, emit_mask)

    (_, _, _), (blocks, mask) = jax.lax.scan(
        body, (id_cur, t_max, ray_valid), None, length=num_steps)
    return blocks, mask


def _alloc_candidates_tiles(cfg: MapConfig, cam: C.Camera, pc_depth,
                            num_steps: int, row0, frame):
    """Tile-granular allocation: per s x s pixel tile, ONE representative ray
    (phase-rotated over the tile's s^2 pixels each frame) walks two
    truncation bands covering the tile's depth range — [dmin-t, dmin+t] and
    [max(dmax-t, dmin+t), dmax+t].

    Image-space dedup before hash-space dedup: adjacent pixels visit the
    same blocks (a block at depth d spans ~fx*block/d >> s pixels), so the
    per-pixel candidate volume of allocBlocksKernel
    (voxel_data_structures.cu:757-857) is s^2/2-fold redundant.  Unlike
    alloc_pixel_stride (which skips 1-1/s^2 of the bands entirely each
    frame), the near band covers EVERY pixel's surface band: for continuous
    surfaces the in-tile depth spread is tiny and the near band covers it;
    at discontinuities the spread mid-range contains no surface and the two
    bands bracket both sides.  The near band walks on even frames and the
    far band on odd frames (halving per-frame candidate volume; the far
    side of a silhouette staggers one frame).  Lateral error of the shared
    ray is <= s px ~ s*d/fx m — well under a block — and the rotating phase
    re-walks a different pixel's exact ray every 2*s^2 frames (same
    staggered convergence semantics as the reference's lock-miss
    retries)."""
    H_, W_ = pc_depth.shape
    s = int(cfg.alloc_tile)
    Hp, Wp = -(-H_ // s) * s, -(-W_ // s) * s
    d = pc_depth
    if (Hp, Wp) != (H_, W_):
        d = jnp.zeros((Hp, Wp), pc_depth.dtype).at[:H_, :W_].set(pc_depth)
    tiles = d.reshape(Hp // s, s, Wp // s, s)
    tvalid = tiles > 0.0
    dmin = jnp.min(jnp.where(tvalid, tiles, INF), axis=(1, 3)).reshape(-1)
    dmax = jnp.max(jnp.where(tvalid, tiles, -INF), axis=(1, 3)).reshape(-1)
    any_valid = jnp.any(tvalid, axis=(1, 3)).reshape(-1)

    Wt = Wp // s
    n_tiles = (Hp // s) * Wt
    fr = jnp.int32(0) if frame is None else frame.astype(jnp.int32)
    use_far = (fr % 2) == 1
    phase = (fr // 2) % (s * s)
    py, px = phase // s, phase % s
    ar = jnp.arange(n_tiles, dtype=jnp.int32)
    rows = (py + s * (ar // Wt) + row0).astype(jnp.float32)
    cols = (px + s * (ar % Wt)).astype(jnp.float32)

    t_lo = X.get_truncation(dmin, cfg.sdf_truncation, cfg.sdf_truncation_scale)
    t_hi = X.get_truncation(dmax, cfg.sdf_truncation, cfg.sdf_truncation_scale)
    mdist = cfg.max_integration_distance
    a_min = jnp.minimum(mdist, dmin - t_lo)
    a_max = jnp.minimum(mdist, dmin + t_lo)
    b_min = jnp.minimum(mdist, jnp.maximum(dmax - t_hi, a_max))
    b_max = jnp.minimum(mdist, dmax + t_hi)
    valid_a = any_valid & (a_min < a_max)
    valid_b = any_valid & (b_min < b_max)

    lo = jnp.where(use_far, b_min, a_min)
    hi = jnp.where(use_far, b_max, a_max)
    ok = jnp.where(use_far, valid_b, valid_a)
    pw_min = C.cam_to_world(cam, C.inverse_projection(cam, rows, cols, lo))
    pw_max = C.cam_to_world(cam, C.inverse_projection(cam, rows, cols, hi))
    keys, mask = _dda_visit(cfg, cam, pw_min, pw_max, ok, num_steps)
    return keys.reshape(-1, 3), mask.reshape(-1)


def alloc_candidates_depth(cfg: MapConfig, cam: C.Camera, pc_depth,
                           num_steps: int, row0=0, frame=None):
    """allocBlocksKernel (voxel_data_structures.cu:757-857): per-pixel ray
    through the truncation band [d-t, d+t].

    pc_depth: f32[H,W] per-pixel depth (z for pinhole, range for spherical);
    row0 offsets the row coordinates (for row-sharded SPMD shards).

    With cfg.alloc_tile = s > 1 the per-pixel rays collapse to one
    representative ray per s x s tile covering the tile's depth range (see
    _alloc_candidates_tiles) — the production TPU path.  Otherwise, with
    cfg.alloc_pixel_stride = s > 1 and a frame counter, only every s-th
    pixel in each dimension emits candidates, with the (s*s)-phase rotating
    per frame — full pixel coverage every s^2 frames.  This is the
    reference's staggered-allocation semantics ("fast version ... staggers
    alloc to the next frame", voxel_data_structures.cu:876) applied at the
    source, cutting candidate volume s^2-fold.
    Returns flat candidate keys + valid mask."""
    if int(cfg.alloc_tile) > 1:
        return _alloc_candidates_tiles(cfg, cam, pc_depth, num_steps, row0,
                                       frame)
    H_, W_ = pc_depth.shape
    s = int(cfg.alloc_pixel_stride)
    if s > 1 and frame is not None:
        phase = frame.astype(jnp.int32) % (s * s)
        py = phase // s
        px = phase % s
        sub = jax.lax.dynamic_slice(pc_depth, (py, px),
                                    (H_ - s + 1, W_ - s + 1))[::s, ::s]
        Hs, Ws = sub.shape
        depth = sub.reshape(-1)
        rows = (py + s * (jnp.arange(Hs * Ws, dtype=jnp.int32) // Ws)
                + row0).astype(jnp.float32)
        cols = (px + s * (jnp.arange(Hs * Ws, dtype=jnp.int32)
                          % Ws)).astype(jnp.float32)
    else:
        depth = pc_depth.reshape(-1)
        rows = (jnp.arange(H_ * W_, dtype=jnp.int32) // W_
                + row0).astype(jnp.float32)
        cols = (jnp.arange(H_ * W_, dtype=jnp.int32) % W_).astype(jnp.float32)

    t = X.get_truncation(depth, cfg.sdf_truncation, cfg.sdf_truncation_scale)
    d_min = jnp.minimum(cfg.max_integration_distance, depth - t)
    d_max = jnp.minimum(cfg.max_integration_distance, depth + t)
    ray_valid = (depth != 0.0) & (d_min < d_max)

    pw_min = C.cam_to_world(cam, C.inverse_projection(cam, rows, cols, d_min))
    pw_max = C.cam_to_world(cam, C.inverse_projection(cam, rows, cols, d_max))
    blocks, mask = _dda_visit(cfg, cam, pw_min, pw_max, ray_valid, num_steps)
    # NOTE: the reference re-tests each visited block against the padded
    # frustum (voxel_data_structures.cu:833); candidates here come from
    # in-frustum pixel rays walking the truncation band, so every visited
    # block already intersects the (padded) frustum — the test is redundant
    # and costs 8 projections per candidate (DESIGN.md).
    return blocks.reshape(-1, 3), mask.reshape(-1)


def alloc_candidates_points(cfg: MapConfig, cam: C.Camera, points, normals,
                            point_valid, num_steps: int):
    """allocBlocks3DKernel (voxel_data_structures.cu:924-1033): per-LiDAR-
    point DDA along the camera ray (projective) or the normal direction.

    points: f32[N,3] camera-frame points; normals: f32[N,3] (unit or zero).
    No frustum filter (matches the 3D kernel)."""
    rng = jnp.linalg.norm(points, axis=-1)
    safe = jnp.where(rng == 0, 1.0, rng)[..., None]
    cam_dir = points / safe
    nrm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    norm_dir = normals / jnp.where(nrm == 0, 1.0, nrm)
    t = X.get_truncation(rng, cfg.sdf_truncation, cfg.sdf_truncation_scale)
    d_min = jnp.minimum(cfg.max_integration_distance, rng - t)
    d_max = jnp.minimum(cfg.max_integration_distance, rng + t)
    ray_valid = point_valid & (rng != 0.0) & (d_min < d_max)

    walk_dir = cam_dir if cfg.projective_sdf else norm_dir
    pc_min = points + walk_dir * (d_min - rng)[..., None]
    pc_max = points + walk_dir * (d_max - rng)[..., None]
    pw_min = C.cam_to_world(cam, pc_min)
    pw_max = C.cam_to_world(cam, pc_max)
    blocks, mask = _dda_visit(cfg, cam, pw_min, pw_max, ray_valid, num_steps)
    return blocks.reshape(-1, 3), mask.reshape(-1)


# ---------------------------------------------------------------------------
# candidate dedup (replaces bucket-mutex conflict handling)
# ---------------------------------------------------------------------------

_SALT0 = jnp.uint32(2654435761)  # Knuth multiplicative constant

# full-avalanche uint32 mix (murmur3 finalizer) — required because any
# affine salt (xor/add/mul by odd) preserves low-bit collision structure
# mod a power-of-two scratch size: the salt would never rotate losers
_avalanche = H._avalanche


def dedup_candidates(keys, valid, frame_salt, scratch_size: int, u_max: int):
    """Pick one representative per distinct block key via salted scatter.

    Two distinct keys hashing to the same scratch cell lose one candidate
    this frame; the per-frame salt rotates losers so allocation converges —
    the same staggered semantics as the reference's lock-miss retry
    ("does not guarantee that all blocks are allocated",
    voxel_data_structures.cu:876).  Returns ([u_max,3] keys, [u_max] valid).
    """
    M = keys.shape[0]
    x = keys[..., 0].astype(jnp.uint32)
    y = keys[..., 1].astype(jnp.uint32)
    z = keys[..., 2].astype(jnp.uint32)
    salt = frame_salt.astype(jnp.uint32)
    h = _avalanche(x * jnp.uint32(P.P1) + salt * _SALT0)
    h = _avalanche(h ^ (y * jnp.uint32(P.P2)))
    h = _avalanche(h ^ (z * jnp.uint32(P.P0)))
    cell = (h % jnp.uint32(scratch_size)).astype(jnp.int32)

    idx = jnp.arange(M, dtype=jnp.int32)
    # scatter-SET, not a combiner: any single writer is a valid
    # representative, and duplicate-index .set stays parallel on TPU while
    # combiner scatters (.max/.min/.add) serialize
    scratch = jnp.full((scratch_size,), -1, jnp.int32).at[
        jnp.where(valid, cell, scratch_size)].set(idx, mode="drop")
    # winners are read off the SCRATCH (occupied cells), not by re-gathering
    # scratch[cell] per candidate — that M-element gather measured 10-30ms at
    # M=1.2M on v5e (round-2 breakdown: dedup was 22ms of the frame)
    sel, uvalid, _ = H.compact_indices(scratch >= 0, u_max)
    cand = scratch[jnp.where(uvalid, sel, 0)]
    ukeys = keys[jnp.where(uvalid, cand, 0)]
    return jnp.where(uvalid[:, None], ukeys, 0), uvalid


def alloc_blocks(cfg: MapConfig, table: H.HashTable, keys, valid, frame):
    """allocBlocks host wrapper (voxel_data_structures.cu:873-922).

    The reference re-runs its alloc kernel in a fixed-point loop to resolve
    bucket-lock misses (RESOLVE_CONFLICT_ALLOCATIONS, :901-921); the analogue
    here is alloc_rounds dedup+insert passes with independent salts, which
    drive the scratch-collision miss probability to ~(d/S)^rounds per key.

    Presence-cache tiering: in steady state nearly every deduped candidate
    is already in the table, and insert()'s full probe lookup over them
    (NUM_PROBES element gathers x max_alloc_per_frame, every frame) only
    re-derives that fact.  pcache_probe proves presence EXACTLY with one
    3-wide gather per key; the misses (cell-evicted present keys + genuinely
    new ones) compact into a cfg.alloc_miss_tier-sized insert when they fit
    (both tier programs compile once; exactly one runs — growth frames take
    the full-width path).  Alloc results are bit-identical either way:
    compaction preserves key order, so pending ranks, probe claims, and
    heap-draw order match the full-width insert."""
    U = cfg.max_alloc_per_frame
    k_tier = min(int(cfg.alloc_miss_tier), U)
    zero_res = jnp.zeros((U,), jnp.int32)
    for i in range(cfg.alloc_rounds):
        ukeys, uvalid = dedup_candidates(
            keys, valid, frame * cfg.alloc_rounds + i,
            U * cfg.dedup_scratch_factor, U)
        if k_tier <= 0 or k_tier >= U:
            table, _ = H.insert(table, ukeys, uvalid, zero_res)
            continue
        hit = H.pcache_probe(table, ukeys, uvalid)
        miss = uvalid & ~hit
        n_miss = jnp.sum(miss.astype(jnp.int32))

        def small(table, ukeys=ukeys, miss=miss):
            sel, ok, _ = H.compact_indices(miss, k_tier)
            mkeys = jnp.where(ok[:, None], ukeys[jnp.where(ok, sel, 0)], 0)
            t2, _ = H.insert(table, mkeys, ok,
                             jnp.zeros((k_tier,), jnp.int32))
            return t2

        def full(table, ukeys=ukeys, uvalid=uvalid):
            t2, _ = H.insert(table, ukeys, uvalid, zero_res)
            return t2

        table = jax.lax.cond(n_miss <= k_tier, small, full, table)
    return table


# ---------------------------------------------------------------------------
# compacted block window
# ---------------------------------------------------------------------------

def compact_active(cfg: MapConfig, table: H.HashTable, cam: C.Camera = None):
    """flatAndReduceHashTable (voxel_data_structures.cu:405-499).

    With cfg.occupied_bucket = B > 0, the scan is TWO-stage: a cheap
    occupancy compaction over the full capacity C (one boolean cumsum +
    dropped scatter — no geometry math) narrows to the first B occupied
    slots, and the 8-corner frustum projection + window compaction run on
    those B entries only.  At Replica-x2 occupancy (occ 41k, C 450k) the
    single-stage frustum-over-capacity pass was ~7 ms of the 27 ms frame;
    two-stage costs ~C cumsum + B projection.  B rides the GeoWrapper
    occupancy ladder (occ * 1.3 headroom): if occupancy ever exceeds B,
    the overflow blocks stagger (slot-order prefix) until the ladder
    grows, exactly like window-capacity overflow.

    Returns (slots[A], count, bpos[A,3], bptr[A], bres[A], bvalid[A])."""
    B = int(cfg.occupied_bucket)
    A = int(cfg.max_active_blocks)
    if 0 < B < table.capacity:
        occ = table.ptr != P.FREE_ENTRY
        oidx, ovalid, ototal = H.compact_indices(occ, B)
        if cam is None and B >= A:
            # no frustum filter: the occupancy compaction IS the window
            slots = jnp.where(ovalid[:A], oidx[:A], -1)
            count = jnp.minimum(ototal, A)
        else:
            safe_o = jnp.where(ovalid, oidx, 0)
            pos_o = table.pos[safe_o]
            mask = ovalid
            if cam is not None:
                mask = mask & blocks_in_frustum_approx(
                    cam, pos_o, cfg.virtual_voxel_size)
            idx2, v2, tot2 = H.compact_indices(mask, A)
            slots = jnp.where(v2, oidx[jnp.where(v2, idx2, 0)], -1)
            count = jnp.minimum(tot2, A)
    else:
        extra = None
        if cam is not None:
            extra = blocks_in_frustum_approx(cam, table.pos,
                                             cfg.virtual_voxel_size)
        slots, count = H.compact(table, extra, cfg.max_active_blocks)
    bvalid = slots >= 0
    safe = jnp.where(bvalid, slots, 0)
    return slots, count, table.pos[safe], table.ptr[safe], table.res[safe], bvalid


LANES = P.TOTAL_SDF_BLOCK_SIZE


def _block_rows(bptr, bvalid):
    """Pool row + intra-row window start of each block (ptr = row*512 +
    lane0; lane0 is 0 for res-0 and a 64-multiple for carved res-1)."""
    row = jnp.where(bvalid, bptr // LANES, 0)
    lane0 = jnp.where(bvalid, bptr % LANES, 0)
    return row, lane0


def _block_voxel_grid(bpos, bres, lane0=None):
    """Virtual-voxel coords + lane validity for each ROW lane of each block.

    Mirrors the scaling_factor * delinearize(idx, 8/scaling) layout of
    integrateDepthMapKernel (voxel_data_structures.cu:1114-1118), with the
    dense res-1 indexing fix (see ops/coords.py).  With lane0 given, lanes
    address the block's row window (res-1 blocks live at a 64-lane offset
    inside a shared row); without, windows start at lane 0.
    Returns (pi i32[A,512,3], lane_valid bool[A,512])."""
    lanes = jnp.arange(LANES, dtype=jnp.int32)
    local = (lanes[None, :] if lane0 is None
             else lanes[None, :] - lane0[:, None])           # [A,512]
    is_low = (bres == 1)[:, None]
    nvox = jnp.where(is_low, P.TOTAL_LOW_BLOCK_SIZE, LANES)
    lane_valid = (local >= 0) & (local < nvox)
    safe = jnp.clip(local, 0, LANES - 1)
    off8 = X.delinearize_voxel_pos(safe, P.SDF_BLOCK_SIZE)          # [A,512,3]
    off4 = X.delinearize_voxel_pos(jnp.clip(local, 0,
                                            P.TOTAL_LOW_BLOCK_SIZE - 1),
                                   P.LOW_BLOCK_SIZE) * 2
    offs = jnp.where(is_low[..., None], off4, off8)
    pi = X.sdf_block_to_virtual_voxel_pos(bpos)[:, None, :] + offs
    return pi, lane_valid


def _scatter_block_rows(pool: VoxelPool, row, bres, bvalid, update_mask,
                        new, old, multires: bool = True, lane0=None):
    """Write per-block lane updates back to the pool the fast way:
    whole-row scatter-SETs for res-0 blocks (their rows are unique), and
    one whole-row scatter-ADD of window-masked deltas for res-1 blocks.
    Sibling res-1 blocks share a pool row at disjoint 64-lane windows, so
    a row scatter-set would clobber fresh sibling data — but adding
    `new - old` confined to each entry's window composes exactly (at most
    one sibling touches any lane; old is the shared pre-update row, so
    old + (new - old) = new bit-exactly for ints and to 1 ulp for f32).
    Row-granular scatters run near HBM bandwidth; every per-lane-indexed
    formulation tried (element-wise window scatter, per-carve row-slice
    loop, lax.scatter with dynamic (row, lane0) windows) pays the TPU
    per-element scatter tax (~6-70 ms per 1M source elements — the 1.2
    s/frame multi-res writeback pathology, measured all three ways).
    `new`/`old` are dicts of [A,512] lane values in ROW layout (a res-1
    block's 64 lanes sit at [lane0, lane0+64)); update_mask [A,512]
    selects the lanes to change.

    multires=False (single-resolution configs, sdf_var_threshold == 0)
    statically drops the res-1 pass: XLA:TPU may flatten lax.cond into
    both-branches+select, so even an always-false res-1 branch costs real
    scatter time."""
    n_rows = pool.sdf.shape[0]
    L1 = P.TOTAL_LOW_BLOCK_SIZE
    out = {}
    if multires:
        # ONE row scatter-add for both resolutions: res-0 deltas over the
        # full row, res-1 deltas masked to the carved window (siblings
        # sharing a row touch disjoint lanes, so duplicate row indices
        # accumulate without conflict)
        assert lane0 is not None, "multires scatter needs carve lane0"
        rows_all = jnp.where(bvalid, row, n_rows)
        lanes = jnp.arange(LANES, dtype=jnp.int32)[None, :]
        local = lanes - lane0[:, None]
        in_win = jnp.where((bres == 1)[:, None],
                           (local >= 0) & (local < L1), True)
        upd = update_mask & in_win & bvalid[:, None]
        for name, new_vals in new.items():
            assert new_vals.ndim == 2, "pool lanes are packed 2D"
            arr = getattr(pool, name)
            zero = jnp.zeros((), arr.dtype)
            delta = jnp.where(upd, new_vals - old[name], zero)
            out[name] = arr.at[rows_all].add(delta, mode="drop")
        return pool.replace(**out)

    row0 = jnp.where(bvalid, row, n_rows)
    for name, new_vals in new.items():
        assert new_vals.ndim == 2, "pool lanes are packed 2D"
        full = jnp.where(update_mask, new_vals, old[name])
        arr = getattr(pool, name)
        out[name] = arr.at[row0].set(full, mode="drop",
                                     unique_indices=True)
    return pool.replace(**out)


def _gather_block_rows(pool: VoxelPool, row):
    """Row gathers of all voxel fields for the given blocks (near-bandwidth
    on TPU vs ~40M elem/s for element-wise gathers)."""
    return dict(sdf=pool.sdf[row], sumsq=pool.sumsq[row],
                weight=pool.weight[row], rgbp=pool.rgbp[row])


def _sample_image(img_flat, rows, cols, W, ok):
    flat = jnp.where(ok, rows * W + cols, 0)
    return img_flat[flat]


def _sample_depth_rgb(cfg: MapConfig, pc_depth, rgb_img, row, col, ok,
                      bpos_center_rc):
    """Per-voxel image sampling without element-wise gathers.

    Per-block 2-channel patches (depth + rgb bit-packed exactly into f32,
    values < 2^24) are slice-gathered around each block's projected center,
    then each lane selects its pixel with a one-hot bf16 matmul on the MXU
    (XLA fuses the iota-compare into the dot, so the [A,512,P] one-hot is
    never materialized).  Lanes whose pixel falls outside their block's
    patch (near, large-footprint blocks) are compacted and served by one
    bounded element-wise gather.  Element-wise gathers run ~115M elem/s on
    v5e; this path replaces 2x16.7M of them with ~100ms of slice-DMA+MXU.

    row/col/ok: [A,512] projected pixels; bpos_center_rc: [A,2] block-center
    pixel.  Returns (depth [A,512], rgb u8 [A,512,3])."""
    H_, W_ = pc_depth.shape
    A = row.shape[0]

    packed = (rgb_img[..., 0].astype(jnp.float32)
              + rgb_img[..., 1].astype(jnp.float32) * 256.0
              + rgb_img[..., 2].astype(jnp.float32) * 65536.0)

    if cfg.sample_mode == "pallas":
        from mrhash_tpu.ops import pallas_kernels as PK
        ph, pw = PK.PATCH_H, PK.PATCH_W
        # aligned patch origins (Mosaic slice constraints: 8-sublane /
        # 128-lane); the patch is generous enough that only very-near
        # blocks fall out
        Hpad = max(((H_ + 7) // 8) * 8, ph)
        Wpad = max(((W_ + 127) // 128) * 128, pw)
        img_cf = jnp.zeros((2, Hpad, Wpad), jnp.float32)
        img_cf = img_cf.at[:, :H_, :W_].set(jnp.stack([pc_depth, packed]))
        r0 = jnp.clip(((bpos_center_rc[:, 0] - ph // 2) // 8) * 8, 0,
                      Hpad - ph)
        c0 = jnp.clip(((bpos_center_rc[:, 1] - pw // 2) // 128) * 128, 0,
                      Wpad - pw)
        lr = row - r0[:, None]
        lc = col - c0[:, None]
        in_patch = ok & (lr >= 0) & (lr < ph) & (lc >= 0) & (lc < pw)
        lr_s = jnp.where(in_patch, lr, 0)
        lc_s = jnp.where(in_patch, lc, 0)
        # blocks with no in-patch lane (window padding, fully-fallback near
        # blocks) skip the kernel's MXU work entirely
        bactive = jnp.any(in_patch, axis=1)
        sampled = PK.sample_image_pallas(img_cf, r0, c0, lr_s, lc_s,
                                         bactive=bactive,
                                         interpret=cfg.pallas_interpret)
        depth = sampled[:, 0, :]
        pack = sampled[:, 1, :]
    else:
        ph = pw = int(cfg.sample_patch)
        stacked = jnp.stack([pc_depth, packed], axis=-1)      # [H,W,2]
        r0 = jnp.clip(bpos_center_rc[:, 0] - ph // 2, 0, H_ - ph)
        c0 = jnp.clip(bpos_center_rc[:, 1] - pw // 2, 0, W_ - pw)
        patches = jax.vmap(
            lambda r, c: jax.lax.dynamic_slice(stacked, (r, c, 0),
                                               (ph, pw, 2)))(r0, c0)
        patches = patches.reshape(A, ph * pw, 2)

        lr = row - r0[:, None]
        lc = col - c0[:, None]
        in_patch = ok & (lr >= 0) & (lr < ph) & (lc >= 0) & (lc < pw)
        pidx = jnp.where(in_patch, lr * pw + lc, 0)

        # f32 one-hot dot: depth needs the full mantissa (bf16 would
        # quantize a 2m depth by ~1.6cm); packed rgb needs 24 exact bits
        oh = (pidx[..., None]
              == jnp.arange(ph * pw, dtype=jnp.int32)).astype(jnp.float32)
        sampled = jnp.einsum("alp,apk->alk", oh, patches,
                             preferred_element_type=jnp.float32)  # [A,512,2]
        depth = sampled[..., 0]
        pack = sampled[..., 1]

    # --- block-compacted element-wise fallback for out-of-patch lanes.
    # NOTE: deliberately unconditional — XLA:TPU flattens lax.cond with
    # array operands into both-branches+select, so gating buys nothing —
    # and BLOCK-granular: a lane-granular compaction needs scatters with
    # A*512 source updates, which cost ~60ms each even when dropped.
    # Blocks beyond the budget skip the frame (staggered, like all other
    # capacity overflows).
    need = ok & ~in_patch
    BB = int(cfg.sample_fallback) // 512
    bneed = jnp.any(need, axis=1)                           # [A]
    brank = jnp.cumsum(bneed.astype(jnp.int32)) - 1
    bdest = jnp.where(bneed & (brank < BB), brank, BB)
    bsel = jnp.zeros((BB,), jnp.int32).at[bdest].set(
        jnp.arange(A, dtype=jnp.int32), mode="drop")
    bok = jnp.zeros((BB,), bool).at[bdest].set(True, mode="drop")

    rsel = jnp.where(bok, bsel, 0)
    fr = row[rsel]                                          # [BB,512]
    fc = col[rsel]
    fneed = need[rsel] & bok[:, None]
    fidx = jnp.where(fneed, fr * W_ + fc, 0)
    fd = pc_depth.reshape(-1)[fidx]
    fp = packed.reshape(-1)[fidx]
    md = jnp.where(fneed, fd, depth[rsel])
    mp = jnp.where(fneed, fp, pack[rsel])
    wdest = jnp.where(bok, bsel, A)
    depth = depth.at[wdest].set(md, mode="drop", unique_indices=True)
    pack = pack.at[wdest].set(mp, mode="drop", unique_indices=True)

    # out-of-patch lanes of blocks beyond the fallback budget hold a
    # patch[0,0] sample, not zero — zero them so they truly skip the frame
    served = bneed & (brank < BB)                           # [A]
    unserved = need & ~served[:, None]
    depth = jnp.where(unserved, 0.0, depth)
    pack = jnp.where(unserved, 0.0, pack)

    pk = jnp.clip(pack, 0, float(1 << 24)).astype(jnp.uint32)
    rgb = jnp.stack([pk % 256, (pk // 256) % 256, (pk // 65536) % 256],
                    axis=-1).astype(jnp.uint8)
    return depth, rgb


def integrate_depth(cfg: MapConfig, pool: VoxelPool, cam: C.Camera,
                    pc_depth, rgb_img, bpos, bptr, bres, bvalid,
                    lane_mask=None):
    """integrateDepthMapKernel (voxel_data_structures.cu:1094-1181): project
    every voxel of every compacted block into the frame, fuse SDF + color,
    accumulate Welford-style variance in sum_squared.

    The reference's benign read-modify-write race on sum_squared becomes an
    exact sequential update (one program per voxel).  Pool access is
    row-structured (see VoxelPool).

    lane_mask bool[A,512] (optional) restricts updates to the given lanes —
    used by the fused-kernel fallback to serve only out-of-patch lanes."""
    vvs = cfg.virtual_voxel_size
    prow, lane0 = _block_rows(bptr, bvalid)
    pi, lane_valid = _block_voxel_grid(bpos, bres, lane0)   # [A,512,...]
    pf = X.virtual_voxel_pos_to_world(vvs, pi)
    pcam = C.world_to_cam(cam, pf)
    row, col, ok = C.project_point(cam, pcam)

    if cfg.sample_mode in ("patch", "pallas"):
        # patch + one-hot MXU sampling instead of per-voxel image gathers
        block_center = X.virtual_voxel_pos_to_world(
            vvs, X.sdf_block_to_virtual_voxel_pos(bpos)) + 3.5 * vvs
        cr, cc, _ = C.project_point_approx(cam,
                                           C.world_to_cam(cam, block_center))
        center_rc = jnp.stack([cr, cc], axis=-1)
        depth, rgb_new = _sample_depth_rgb(cfg, pc_depth, rgb_img, row, col,
                                           ok, center_rc)
    else:
        # two element-wise gathers: depth + bit-packed rgb (~115M elem/s)
        W_ = pc_depth.shape[1]
        depth = _sample_image(pc_depth.reshape(-1), row, col, W_, ok)
        packed = (rgb_img[..., 0].astype(jnp.uint32)
                  | (rgb_img[..., 1].astype(jnp.uint32) << 8)
                  | (rgb_img[..., 2].astype(jnp.uint32) << 16))
        pk = _sample_image(packed.reshape(-1), row, col, W_, ok)
        rgb_new = jnp.stack([(pk & 255), ((pk >> 8) & 255),
                             ((pk >> 16) & 255)], axis=-1).astype(jnp.uint8)

    depth_ok = ok & (depth != 0.0) & (depth <= cfg.max_integration_distance)
    sdf = depth - C.get_depth(cam, pcam)
    trunc = X.get_truncation(depth, cfg.sdf_truncation,
                             cfg.sdf_truncation_scale)
    inside = sdf > -trunc
    sdf = jnp.clip(sdf, -trunc, trunc)

    update = bvalid[:, None] & lane_valid & depth_ok & inside
    if lane_mask is not None:
        update = update & lane_mask

    old = _gather_block_rows(pool, prow)
    sdf0, w0, ssq0 = old["sdf"], old["weight"], old["sumsq"]
    rgb0 = unpack_rgb(old["rgbp"])

    # Welford accumulation (voxel_data_structures.cu:1162-1180); deltas are
    # normalized by half a voxel.
    half_voxel = jnp.float32(vvs / 2.0)
    curr_mean = jnp.where(w0 > 0, sdf0, sdf)
    delta = (sdf - curr_mean) / half_voxel

    rgb0_eff = jnp.where((w0 == 0)[..., None], rgb_new, rgb0)
    w_new = jnp.full_like(w0, cfg.integration_weight_sample)
    m_sdf, m_w, m_rgb = X.combine_voxel(
        sdf0, w0, rgb0_eff, sdf, w_new, rgb_new, cfg.integration_weight_max)
    delta2 = (sdf - m_sdf) / half_voxel
    m_ssq = ssq0 + delta * delta2

    return _scatter_block_rows(
        pool, prow, bres, bvalid, update,
        dict(sdf=m_sdf, weight=m_w, sumsq=m_ssq, rgbp=pack_rgb(m_rgb)), old,
        multires=cfg.sdf_var_threshold > 0.0, lane0=lane0)


# ---------------------------------------------------------------------------
# fused-kernel depth integration (the TPU production path)
# ---------------------------------------------------------------------------

def _patch_origins(cam: C.Camera, bpos, vvs, hpad, wpad, ph, pw):
    """Aligned patch origins from block-center projections — must match the
    in-kernel scalar math of ops/fused_integrate.py exactly."""
    center = X.virtual_voxel_pos_to_world(
        vvs, X.sdf_block_to_virtual_voxel_pos(bpos)) + 3.5 * vvs
    pc = C.world_to_cam(cam, center)
    z = jnp.where(pc[..., 2] == 0, 1.0, pc[..., 2])
    crow = (cam.fy * pc[..., 1] / z + cam.cy + 0.5).astype(jnp.int32)
    ccol = (cam.fx * pc[..., 0] / z + cam.cx + 0.5).astype(jnp.int32)
    r0 = jnp.clip(((crow - ph // 2) // 8) * 8, 0, hpad - ph)
    c0 = jnp.clip(((ccol - pw // 2) // 128) * 128, 0, wpad - pw)
    return r0, c0


def pack_window_rows(cfg: MapConfig, bpos, bptr, bres, bvalid, n_pool_rows,
                     step: int = 16):
    """Group the compacted per-block window by POOL ROW for the fused
    kernel: res-0 blocks own their row; sibling res-1 blocks (64-lane
    carves of a shared row, hashtable carve layout: low id l occupies
    lanes [(l%8)*64, (l%8)*64+64) of row l//8) pack into ONE row slot with
    per-group meta.  Row-unique slots let the kernel write each pool row
    exactly once (set, not delta-add) and are the invariant the resident
    window cache requires (one backing row per slot).

    Slot layout is SEGREGATED by kind so every kernel grid step is
    single-path: res-0 slots first (window order), then — starting on a
    `step`-aligned boundary — the packed res-1 row slots.  The kernel
    branches once per STEP on the kind lane instead of once per slot
    (per-slot `pl.when` branches measured 4x the single-res per-slot cost).
    If the packed segment overflows A (possible only when the window bucket
    is nearly full), the tail rows get no slot this frame: their entries
    report eslot=-1 and the caller staggers them to the element fallback.

    Returns a dict of row-slot arrays [A]: rvalid, rrow, rres, rpos
    (res-0 slot's block pos) and group arrays gpos [A,8,3] / gvalid [A,8]
    (packed rows), plus per-ENTRY maps eslot [A] (the row slot serving
    window entry e; -1 for invalid/unslotted entries) and ecarve [A] (its
    64-lane group index; 0 for res-0)."""
    A = bptr.shape[0]
    S = n_pool_rows  # sentinel row id for invalid entries / dump cells
    arange = jnp.arange(A, dtype=jnp.int32)
    prow = jnp.where(bvalid, bptr // LANES, S)
    carve = jnp.where(bvalid, (bptr % LANES) // P.TOTAL_LOW_BLOCK_SIZE, 0)
    is0 = bvalid & (bres == 0)
    is1 = bvalid & (bres == 1)

    # row leader = the first window entry holding each res-1 row (res-0
    # entries lead their own row unconditionally: high-heap rows are unique)
    row_first = jnp.full((S + 1,), A, jnp.int32).at[
        jnp.where(is1, prow, S)].min(arange)
    lead1 = is1 & (row_first[prow] == arange)

    idx0, ok0, cnt0 = H.compact_indices(is0, A)
    idx1, _, cnt1 = H.compact_indices(lead1, A)
    base1 = -(-cnt0 // step) * step          # packed segment step-aligned
    j = arange - base1
    take1 = (j >= 0) & (j < cnt1)
    src = jnp.where(ok0, idx0, jnp.where(take1, idx1[jnp.clip(j, 0, A - 1)],
                                         A))
    rok = src < A
    src_c = jnp.where(rok, src, 0)
    rrow = jnp.where(rok, prow[src_c], S)
    rres = jnp.where(rok, bres[src_c], 0)
    rpos = jnp.where((rok & (rres == 0))[:, None], bpos[src_c], 0)

    slot_of_row = jnp.full((S + 1,), -1, jnp.int32).at[rrow].set(arange)
    eslot = jnp.where(bvalid, slot_of_row[prow], -1)

    # packed-row group meta: scatter each res-1 entry into its carve group
    gdest = jnp.where(is1 & (eslot >= 0), eslot * 8 + carve, A * 8)
    gpos = jnp.zeros((A * 8, 3), jnp.int32).at[gdest].set(
        bpos, mode="drop").reshape(A, 8, 3)
    gvalid = jnp.zeros((A * 8,), jnp.int32).at[gdest].set(
        1, mode="drop").reshape(A, 8)
    return dict(rvalid=rok, rrow=rrow, rres=rres, rpos=rpos,
                gpos=gpos, gvalid=gvalid, eslot=eslot, ecarve=carve)


def _window_flag_decisions(cfg: MapConfig, cam: C.Camera, out, emap, bres,
                           bvalid, unslotted_uns: bool):
    """Map the fused kernel's per-slot / per-group flag lanes back to
    per-ENTRY decisions (multi-res windows).  The consumers only need
    BOOLEANS (GC free?, coarsen?, unserved?), so the decision math runs
    per-SLOT on the slot-major flag block (pure VPU), packs into ONE int32
    bitmask per slot, and the per-entry map is a single [A]-element gather
    + variable shifts — the previous [A,32] row gather + 5 take_along_axis
    measured 9.8 ms/frame at A=36864 on v5e (sub-512-lane rows decompose
    to the ~6 ms/M element tax); this form is ~1 ms.
    Word layout: bit0 res-0 GC, bit1 res-0 coarsen-decide, bit2 res-0
    unserved; bits 8+g group-g GC, bits 16+g group-g unserved.

    Returns (uns_b[A], aux dict(gc_decision, coarsen_decide))."""
    cast = jax.lax.bitcast_convert_type
    L = LANES
    slotted = emap["eslot"] >= 0
    eslot_c = jnp.where(bvalid & slotted, emap["eslot"], 0)
    flags = out[:, 4 * L:4 * L + 32]                    # [A,32]
    is1e = bvalid & (bres == 1)
    crv = emap["ecarve"]

    trunc_max = X.get_truncation(cam.max_depth, cfg.sdf_truncation,
                                 cfg.sdf_truncation_scale)
    min_s0 = cast(flags[:, 1], jnp.float32)
    max_w0 = flags[:, 2]
    w_tot0 = flags[:, 3].astype(jnp.float32)
    ssq_t0 = cast(flags[:, 4], jnp.float32)
    gc0 = (min_s0 >= trunc_max) | (max_w0 == 0)
    # checkVarSDFKernel decision (voxel_data_structures.cu:1856-1905)
    avg_var = ssq_t0 / jnp.maximum(w_tot0 - 1.0, 1e-12)
    co0 = ((w_tot0 >= 2) & (avg_var > 0.0)
           & (avg_var < cfg.sdf_var_threshold))
    gmin = cast(flags[:, 16:24], jnp.float32)           # [A,8]
    gmax = flags[:, 24:32]
    gcg = (gmin >= trunc_max) | (gmax == 0)
    gsh = 1 << (8 + jnp.arange(8, dtype=jnp.int32))
    ush = 1 << (16 + jnp.arange(8, dtype=jnp.int32))
    word = (gc0.astype(jnp.int32)
            + (co0.astype(jnp.int32) << 1)
            + ((flags[:, 0] > 0).astype(jnp.int32) << 2)
            + jnp.sum(jnp.where(gcg, gsh[None, :], 0), axis=1)
            + jnp.sum(jnp.where(flags[:, 8:16] > 0, ush[None, :], 0),
                      axis=1))
    ew = word[eslot_c]                                  # [A] gather
    bit = lambda sh: ((ew >> sh) & 1) != 0
    uns_b = jnp.where(slotted, bit(jnp.where(is1e, 16 + crv, 2)),
                      unslotted_uns)
    aux = dict(
        gc_decision=slotted & bit(jnp.where(is1e, 8 + crv, 0)),
        coarsen_decide=(slotted & bvalid & (bres == 0) & bit(1)))
    return uns_b, aux


def fused_integrate_depth(cfg: MapConfig, pool: VoxelPool, cam: C.Camera,
                          pc_depth, rgb_img, bpos, bptr, bres, bvalid,
                          frame=None, resident=False, resident_meta=None):
    """One-kernel depth integration over the compacted window: pack pool
    rows, run the fused Pallas kernel, scatter rows back, then serve
    out-of-patch lanes of up to sample_fallback/512 blocks with the
    element-wise XLA path (rotated by frame so overflow staggers instead of
    starving the same blocks).

    Multi-res windows ride the same kernel with ROW-PACKED slots
    (pack_window_rows): sibling res-1 carves share one slot, every slot's
    pool row is unique, and the writeback is a plain row scatter-set.  The
    kernel's per-group flag lanes are mapped back to the per-block window
    entries, so GC and the coarsen decision need no row gathers either.

    With resident=True, `pool` is the resident window cache (core/resident):
    the window is already ordered so block i lives at pool row i, so the
    pack is a contiguous slice read and the writeback a contiguous slice
    update — both at HBM bandwidth instead of ~16-28 GB/s row scatters
    (measured 17.2 -> 7.3 ms/frame at A=20480).  `bptr` is ignored for row
    addressing in this mode (it carries the BIG-pool ptr for the caller).

    With resident_meta (multi-res resident, core/resident.adopt_window_rows):
    `pool` is the resident cache holding kind-segregated ROW slots; meta
    comes from the adoption dict (rpos/gpos/gvalid/ovalid) and the
    pack/gather/scatter machinery disappears entirely — contiguous slice
    read + write.  Entries whose row missed the churn cap (eslot=-1)
    integrate nothing this frame and are NOT routed to the element
    fallback (it addresses the resident pool, which lacks their rows);
    they stagger to the next frame's adoption.

    Returns (pool', aux).  Single-res aux = dict(gc_min_s[A], gc_max_w[A],
    unserved_blocks scalar); multires aux = dict(gc_decision[A] bool,
    coarsen_decide[A] bool, unserved_blocks scalar) — per-entry decisions
    derived per-slot from the kernel flag lanes (see the bitmask block
    below) so GC and the coarsen gate need no row gathers."""
    from mrhash_tpu.ops import fused_integrate as FI

    H_, W_ = pc_depth.shape
    A = bpos.shape[0]
    multires = cfg.sdf_var_threshold > 0.0
    hpad = max(((H_ + 7) // 8) * 8,
               FI.PATCH_HP if multires else FI.PATCH_H)
    wpad = max(((W_ + 127) // 128) * 128, FI.PATCH_W)

    packed = (rgb_img[..., 0].astype(jnp.float32)
              + rgb_img[..., 1].astype(jnp.float32) * 256.0
              + rgb_img[..., 2].astype(jnp.float32) * 65536.0)
    img_cf = jnp.zeros((2, hpad, wpad), jnp.float32)
    img_cf = img_cf.at[:, :H_, :W_].set(jnp.stack([pc_depth, packed]))

    cam_vec = FI.make_cam_vec(
        cam, cfg.virtual_voxel_size, cfg.sdf_truncation,
        cfg.sdf_truncation_scale, cfg.max_integration_distance,
        cfg.integration_weight_sample, cfg.integration_weight_max,
        hpad, wpad)

    cast = jax.lax.bitcast_convert_type
    n_rows = pool.sdf.shape[0]
    meta = jnp.zeros((A, 128), jnp.int32)
    if resident_meta is not None:
        assert multires and cfg.resident_plain_rows > 0
        rm = resident_meta
        A0 = int(cfg.resident_plain_rows)
        lane0 = rm["ecarve"] * P.TOTAL_LOW_BLOCK_SIZE
        kind = (jnp.arange(A, dtype=jnp.int32) >= A0).astype(jnp.int32)
        meta = meta.at[:, :3].set(rm["rpos"])
        meta = meta.at[:, 3].set(rm["ovalid"].astype(jnp.int32))
        meta = meta.at[:, 4].set(kind)
        gmeta = jnp.concatenate(
            [rm["gpos"], rm["gvalid"][..., None]], axis=2).reshape(A, 32)
        meta = meta.at[:, 8:40].set(gmeta)
        pool_rows = jnp.concatenate(
            [cast(pool.sdf[:A], jnp.int32), cast(pool.sumsq[:A], jnp.int32),
             pool.weight[:A], pool.rgbp[:A]], axis=1)
    elif resident:
        if multires:
            raise NotImplementedError(
                "multi-res resident mode needs resident_meta "
                "(cfg.resident_plain_rows > 0)")
        prow = jnp.arange(A, dtype=jnp.int32)
        lane0 = jnp.zeros((A,), jnp.int32)
        meta = meta.at[:, :3].set(jnp.where(bvalid[:, None], bpos, 0))
        meta = meta.at[:, 3].set(bvalid.astype(jnp.int32))
        pool_rows = jnp.concatenate(
            [cast(pool.sdf[:A], jnp.int32), cast(pool.sumsq[:A], jnp.int32),
             pool.weight[:A], pool.rgbp[:A]], axis=1)
    elif multires:
        rw = pack_window_rows(cfg, bpos, bptr, bres, bvalid, n_rows)
        _, lane0 = _block_rows(bptr, bvalid)
        meta = meta.at[:, :3].set(rw["rpos"])
        meta = meta.at[:, 3].set(rw["rvalid"].astype(jnp.int32))
        meta = meta.at[:, 4].set(jnp.where(rw["rvalid"], rw["rres"], 0))
        gmeta = jnp.concatenate(
            [rw["gpos"], rw["gvalid"][..., None]], axis=2).reshape(A, 32)
        meta = meta.at[:, 8:40].set(gmeta)
        rrow_c = jnp.where(rw["rvalid"], rw["rrow"], 0)
        pool_rows = jnp.concatenate(
            [cast(pool.sdf[rrow_c], jnp.int32),
             cast(pool.sumsq[rrow_c], jnp.int32),
             pool.weight[rrow_c], pool.rgbp[rrow_c]], axis=1)
    else:
        prow, lane0 = _block_rows(bptr, bvalid)
        meta = meta.at[:, :3].set(jnp.where(bvalid[:, None], bpos, 0))
        meta = meta.at[:, 3].set(bvalid.astype(jnp.int32))
        pool_rows = jnp.concatenate(
            [cast(pool.sdf[prow], jnp.int32),
             cast(pool.sumsq[prow], jnp.int32),
             pool.weight[prow], pool.rgbp[prow]], axis=1)

    out = FI.fused_integrate_pallas(img_cf, cam_vec, meta, pool_rows,
                                    interpret=cfg.pallas_interpret,
                                    multires=multires)

    L = LANES
    if resident_meta is not None or resident:
        # contiguous slice update (HBM bandwidth; in-place on the donated
        # resident arrays) — slot i's row IS resident row i
        pool = pool.replace(
            sdf=pool.sdf.at[:A].set(cast(out[:, 0:L], jnp.float32)),
            sumsq=pool.sumsq.at[:A].set(cast(out[:, L:2 * L], jnp.float32)),
            weight=pool.weight.at[:A].set(out[:, 2 * L:3 * L]),
            rgbp=pool.rgbp.at[:A].set(out[:, 3 * L:4 * L]))
    elif multires:
        # every row slot owns its pool row exclusively -> plain set
        rows_w = jnp.where(rw["rvalid"], rw["rrow"], n_rows)
        pool = pool.replace(
            sdf=pool.sdf.at[rows_w].set(cast(out[:, 0:L], jnp.float32),
                                        mode="drop", unique_indices=True),
            sumsq=pool.sumsq.at[rows_w].set(cast(out[:, L:2 * L],
                                                 jnp.float32),
                                            mode="drop", unique_indices=True),
            weight=pool.weight.at[rows_w].set(out[:, 2 * L:3 * L],
                                              mode="drop",
                                              unique_indices=True),
            rgbp=pool.rgbp.at[rows_w].set(out[:, 3 * L:4 * L],
                                          mode="drop", unique_indices=True))
    else:
        row0 = jnp.where(bvalid, prow, n_rows)
        pool = pool.replace(
            sdf=pool.sdf.at[row0].set(cast(out[:, 0:L], jnp.float32),
                                      mode="drop", unique_indices=True),
            sumsq=pool.sumsq.at[row0].set(cast(out[:, L:2 * L], jnp.float32),
                                          mode="drop", unique_indices=True),
            weight=pool.weight.at[row0].set(out[:, 2 * L:3 * L],
                                            mode="drop", unique_indices=True),
            rgbp=pool.rgbp.at[row0].set(out[:, 3 * L:4 * L],
                                        mode="drop", unique_indices=True))

    if multires:
        emap = rw if resident_meta is None else resident_meta
        uns_b, aux = _window_flag_decisions(cfg, cam, out, emap, bres,
                                            bvalid, resident_meta is None)
    else:
        uns_b = out[:, 4 * L] > 0
        aux = dict(gc_min_s=cast(out[:, 4 * L + 1], jnp.float32),
                   gc_max_w=out[:, 4 * L + 2])

    # --- bounded element-wise fallback for out-of-patch (near) blocks -------
    BB = int(cfg.sample_fallback) // L
    bneed = bvalid & uns_b
    # rotate the served set with the frame so overflow staggers rather than
    # starving the same near blocks every frame
    if frame is not None:
        shift = (frame.astype(jnp.int32) * 4097) % A
        rolled = jnp.roll(bneed, -shift)
        sel_r, ok_r, total_need = H.compact_indices(rolled, BB)
        bsel = (jnp.where(ok_r, sel_r, 0) + shift) % A
        bok = ok_r
    else:
        sel_r, bok, total_need = H.compact_indices(bneed, BB)
        bsel = jnp.where(bok, sel_r, 0)
    aux["unserved_blocks"] = total_need - jnp.sum(bok.astype(jnp.int32))

    fb_pos = bpos[bsel]
    fb_res = bres[bsel]
    fb_lane0 = lane0[bsel]
    # per-entry patch rows mirroring the kernel: res-1 carves use the
    # taller PATCH_HP footprint
    ph_fb = (jnp.where(fb_res == 1, FI.PATCH_HP, FI.PATCH_H)
             if multires else FI.PATCH_H)
    r0, c0 = _patch_origins(cam, fb_pos, cfg.virtual_voxel_size,
                            hpad, wpad, ph_fb, FI.PATCH_W)
    pif, _ = _block_voxel_grid(fb_pos, fb_res,
                               fb_lane0 if multires else None)
    pf = X.virtual_voxel_pos_to_world(cfg.virtual_voxel_size, pif)
    row, col, okp = C.project_point(cam, C.world_to_cam(cam, pf))
    lr = row - r0[:, None]
    lc = col - c0[:, None]
    ph_b = ph_fb[:, None] if multires else FI.PATCH_H
    out_of_patch = ~((lr >= 0) & (lr < ph_b)
                     & (lc >= 0) & (lc < FI.PATCH_W))
    fcfg = dataclasses.replace(cfg, sample_mode="gather")
    if resident_meta is not None:
        # resident-space ptr: slot row * 512 + carve window offset (only
        # slotted entries reach here — unslotted ones report unserved=0)
        rm_ptr = (jnp.maximum(resident_meta["eslot"], 0) * LANES
                  + resident_meta["ecarve"] * P.TOTAL_LOW_BLOCK_SIZE)
        fb_ptr = rm_ptr[bsel]
    elif resident:
        fb_ptr = bsel * LANES
    else:
        fb_ptr = bptr[bsel]
    pool = integrate_depth(fcfg, pool, cam, pc_depth, rgb_img,
                           fb_pos, fb_ptr, bres[bsel], bok,
                           lane_mask=out_of_patch)
    return pool, aux


def integrate_points_sdf(cfg: MapConfig, table: H.HashTable, pool: VoxelPool,
                         cam: C.Camera, points, normals, weights,
                         point_valid, num_steps: int, frame=None,
                         window=None):
    """integrate3DKernel (voxel_data_structures.cu:1214-1401): per-point DDA
    over the *voxel* grid in the truncation band; each visited allocated
    voxel gets a projective (range difference) or point-to-plane SDF update.

    Conflicts (several points hitting one voxel) are a benign race in the
    reference (:1344-1357); here contributions are aggregated per voxel with
    weighted segment sums before a single merge — deterministic and
    conflict-free (documented deviation, DESIGN.md).

    `weights` are accepted for API parity; like the reference (:1330-1338,
    adaptive weighting commented out) they do not affect the update.

    `window` = (slots, bpos, bptr, bres, bvalid) from compact_active:
    contributions are accumulated into the [A,512] compacted-window rows
    and merged with row gathers/scatters — O(active blocks), not O(pool
    capacity) (the full-pool flat merge read+wrote every voxel lane of a
    2^18-block pool, ~19 ms/frame of the round-2 LiDAR bench).  Without a
    window the legacy full-pool path runs.
    """
    vvs = cfg.virtual_voxel_size
    rng = jnp.linalg.norm(points, axis=-1)
    safe = jnp.where(rng == 0, 1.0, rng)[..., None]
    cam_dir = points / safe
    nn = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    norm_dir = normals / jnp.where(nn == 0, 1.0, nn)
    trunc = X.get_truncation(rng, cfg.sdf_truncation, cfg.sdf_truncation_scale)
    d_min = jnp.minimum(cfg.max_integration_distance, rng - trunc)
    d_max = jnp.minimum(cfg.max_integration_distance, rng + trunc)
    ray_valid = (point_valid & (rng >= 1e-6)
                 & (rng <= cfg.max_integration_distance) & (d_min < d_max))

    if cfg.projective_sdf:
        pc_min = points - cam_dir * trunc[..., None]
        pc_max = points + cam_dir * trunc[..., None]
    else:
        pc_min = points + norm_dir * (d_min - rng)[..., None]
        pc_max = points + norm_dir * (d_max - rng)[..., None]
    pw_min = C.cam_to_world(cam, pc_min)
    pw_max = C.cam_to_world(cam, pc_max)

    vox, visit = _dda_visit(cfg, cam, pw_min, pw_max, ray_valid, num_steps,
                            block_level=False)              # [K,N,3],[K,N]

    # hash lookup per visited voxel, dedup-fronted: the K*N visited keys
    # collapse to ~occupied-blocks distinct ones
    blk = X.virtual_voxel_pos_to_sdf_block(
        vox, vvs, jnp.asarray(cfg.voxel_extents, jnp.float32))
    if window is not None:
        wslots, bpos, bptr, bres, bvalid = window
        A = bpos.shape[0]
        cap = table.capacity
        slot_map = jnp.full((cap + 1,), -1, jnp.int32).at[
            jnp.where(bvalid, wslots, cap)].set(
            jnp.arange(A, dtype=jnp.int32), mode="drop")
        found, ewslot, elane0, eres = H.lookup_dedup(
            table, blk.reshape(-1, 3), visit.reshape(-1),
            cfg.lookup_dedup_scratch, frame_salt=frame, slot_map=slot_map)
        ewslot = ewslot.reshape(visit.shape)
        elane0 = elane0.reshape(visit.shape)
    else:
        found, eptr, eres = H.lookup_dedup(
            table, blk.reshape(-1, 3), visit.reshape(-1),
            cfg.lookup_dedup_scratch, frame_salt=frame)
        eptr = eptr.reshape(visit.shape)
    found = found.reshape(visit.shape)
    eres = eres.reshape(visit.shape)

    # per-contribution SDF (snapped to the voxel's resolution center,
    # voxel_data_structures.cu:1309-1321)
    scale = (1 << eres).astype(jnp.int32)
    # voxel_pos_aprox = vox / scale, then * getVoxelSize(entry) = vvs*scale
    vox_scaled = vox // scale[..., None]
    voxel_world = vox_scaled.astype(jnp.float32) * (
        vvs * scale[..., None].astype(jnp.float32))
    voxel_cam = C.world_to_cam(cam, voxel_world)
    voxel_range = jnp.linalg.norm(voxel_cam, axis=-1)
    if cfg.projective_sdf:
        sdf = rng[None, :] - voxel_range
    else:
        sdf = jnp.sum((voxel_cam - points[None]) * norm_dir[None], axis=-1)
    inside = sdf > -trunc[None, :]
    sdf = jnp.clip(sdf, -trunc[None, :], trunc[None, :])
    # `break` on sdf <= -trunc kills the rest of the walk for that ray
    alive = jnp.cumprod(jnp.where(found, inside, True).astype(jnp.int32),
                        axis=0).astype(bool)
    contrib = visit & found & inside & alive

    # dense per-resolution local index (block side = 8 >> res)
    local = jnp.mod(vox, P.SDF_BLOCK_SIZE) // scale[..., None]
    side = P.SDF_BLOCK_SIZE // scale
    lane = (local[..., 2] * side * side + local[..., 1] * side
            + local[..., 0])

    w_up = jnp.float32(cfg.integration_weight_sample)
    half_voxel = jnp.float32(vvs / 2.0)

    if window is not None:
        # accumulate into the [A,512] window rows (ROW layout: a res-1
        # block's lanes sit at [lane0, lane0+64))
        acc_idx = jnp.where(contrib, ewslot * LANES + elane0 + lane,
                            A * LANES).reshape(-1)
        acc_w = jnp.zeros((A * LANES,), jnp.float32).at[acc_idx].add(
            jnp.where(contrib, w_up, 0.0).reshape(-1),
            mode="drop").reshape(A, LANES)
        acc_sw = jnp.zeros((A * LANES,), jnp.float32).at[acc_idx].add(
            jnp.where(contrib, sdf * w_up, 0.0).reshape(-1),
            mode="drop").reshape(A, LANES)

        prow_w, lane0_w = _block_rows(bptr, bvalid)
        sdf0 = pool.sdf[prow_w]
        ssq0 = pool.sumsq[prow_w]
        w0 = pool.weight[prow_w]
        hit = (acc_w > 0) & bvalid[:, None]
        batch_sdf = acc_sw / jnp.where(hit, acc_w, 1.0)
        # 3D kernel quirk kept: curr_mean stays 0 for never-touched voxels
        curr_mean = jnp.where(w0 > 0, sdf0, 0.0)
        delta = (batch_sdf - curr_mean) / half_voxel
        w0f = w0.astype(jnp.float32)
        m_sdf = (sdf0 * w0f + acc_sw) / jnp.maximum(w0f + acc_w, 1e-20)
        m_w = jnp.minimum(cfg.integration_weight_max,
                          w0 + acc_w.astype(jnp.int32))
        delta2 = (batch_sdf - m_sdf) / half_voxel
        m_ssq = ssq0 + delta * delta2
        return _scatter_block_rows(
            pool, prow_w, bres, bvalid, hit,
            dict(sdf=m_sdf, weight=m_w, sumsq=m_ssq),
            dict(sdf=sdf0, weight=w0, sumsq=ssq0),
            multires=cfg.sdf_var_threshold > 0.0, lane0=lane0_w)

    vidx = eptr + lane
    flat_idx = jnp.where(contrib, vidx, pool.num_voxels).reshape(-1)
    nv = pool.num_voxels
    acc_w = jnp.zeros((nv,), jnp.float32).at[flat_idx].add(
        jnp.where(contrib, w_up, 0.0).reshape(-1), mode="drop")
    acc_sw = jnp.zeros((nv,), jnp.float32).at[flat_idx].add(
        jnp.where(contrib, sdf * w_up, 0.0).reshape(-1), mode="drop")

    hit = acc_w > 0
    batch_sdf = acc_sw / jnp.where(hit, acc_w, 1.0)
    w0 = pool.flat_weight
    sdf0 = pool.flat_sdf
    # 3D kernel quirk kept: curr_mean stays 0 for never-touched voxels
    curr_mean = jnp.where(w0 > 0, sdf0, 0.0)
    delta = (batch_sdf - curr_mean) / half_voxel
    w0f = w0.astype(jnp.float32)
    m_sdf = (sdf0 * w0f + acc_sw) / jnp.maximum(w0f + acc_w, 1e-20)
    m_w = jnp.minimum(cfg.integration_weight_max,
                      w0 + acc_w.astype(jnp.int32))
    delta2 = (batch_sdf - m_sdf) / half_voxel
    return pool.with_flat(
        sdf=jnp.where(hit, m_sdf, sdf0),
        weight=jnp.where(hit, m_w, w0),
        sumsq=jnp.where(hit, pool.flat_sumsq + delta * delta2,
                        pool.flat_sumsq))


# ---------------------------------------------------------------------------
# fused (Pallas) LiDAR integrate: voxel-centric projective update
# ---------------------------------------------------------------------------

SPH_PAD = 128          # azimuth wraparound pad columns per side


def _scan_raster_mapping(cam: C.Camera, points, point_valid):
    """Self-consistent raster mapping for the fused LiDAR path.

    Azimuth: the full circle maps to cam.cols columns.  Elevation: bounds
    are TRACED from the scan itself (nominal cam fy/cy may not cover the
    sensor's true elevation span) and map to cam.rows rows.  Returns
    (el_lo, s_el) so row = floor((el - el_lo) * s_el)."""
    rng = jnp.linalg.norm(points, axis=-1)
    ok = point_valid & (rng > 1e-6)
    el = jnp.arcsin(jnp.clip(points[..., 2] / jnp.where(ok, rng, 1.0),
                             -1.0, 1.0))
    el_lo = jnp.min(jnp.where(ok, el, jnp.inf))
    el_hi = jnp.max(jnp.where(ok, el, -jnp.inf))
    el_lo = jnp.where(jnp.isfinite(el_lo), el_lo, -1.0)
    el_hi = jnp.where(jnp.isfinite(el_hi), el_hi, 1.0)
    s_el = (cam.rows - 1) / jnp.maximum(el_hi - el_lo, 1e-6)
    return el_lo, s_el


def _sph_rowcol(cam: C.Camera, pc, el_lo, s_el):
    """Raster (row, col) of camera-frame points under the scan mapping.
    Returns (row, col, rng, in_rows)."""
    rng = jnp.linalg.norm(pc, axis=-1)
    safe = jnp.where(rng == 0, 1.0, rng)
    az = jnp.arctan2(pc[..., 1], pc[..., 0])
    el = jnp.arcsin(jnp.clip(pc[..., 2] / safe, -1.0, 1.0))
    colf = (az + jnp.pi) * (cam.cols / (2.0 * jnp.pi))
    col = jnp.clip(colf.astype(jnp.int32), 0, cam.cols - 1)
    rowf = (el - el_lo) * s_el + 0.5
    row = jnp.floor(rowf).astype(jnp.int32)
    in_rows = (row >= 0) & (row < cam.rows)
    return row, col, rng, in_rows


def rasterize_scan(cfg: MapConfig, cam: C.Camera, points, point_valid,
                   el_lo, s_el):
    """Min-range rasterization of the scan onto [Hp, cols + 2*SPH_PAD]
    (8-aligned rows; wraparound pad columns on both sides for the kernel's
    128-aligned patch windows).  Empty cells hold 0."""
    row, col, rng, in_rows = _sph_rowcol(cam, points, el_lo, s_el)
    ok = (point_valid & in_rows & (rng >= cam.min_depth)
          & (rng <= cam.max_depth))
    W_ = cam.cols
    hp = -(-cam.rows // 8) * 8
    flat = jnp.where(ok, row * W_ + col, hp * W_)
    img = jnp.full((hp * W_ + 1,), INF, jnp.float32).at[flat].min(
        jnp.where(ok, rng, INF))[:hp * W_].reshape(hp, W_)
    img = jnp.where(jnp.isfinite(img), img, 0.0)
    rpad = FI_PATCH_W - SPH_PAD
    if W_ >= max(SPH_PAD, rpad):
        return jnp.concatenate(
            [img[:, W_ - SPH_PAD:], img, img[:, :rpad]], axis=1)
    # narrow scans (cols < pad width): modular column gather for the wrap
    idx = jnp.mod(jnp.arange(-SPH_PAD, W_ + rpad, dtype=jnp.int32), W_)
    return img[:, idx]


def _sph_proj_pack(cfg: MapConfig, cam: C.Camera, pi, lane_valid, el_lo,
                   s_el, c0):
    """Per-lane packed local patch coords + voxel camera range for the
    spherical kernel (ops/fused_integrate.py module comment).

    pi i32[A,512,3] virtual-voxel lattice, c0 i32[A,512] each lane's patch
    column origin (padded coords; per-slot for plain rows, per-group for
    packed rows).  Returns proj i32[A,1024]."""
    pw = X.virtual_voxel_pos_to_world(cfg.virtual_voxel_size, pi)
    pc = C.world_to_cam(cam, pw)
    row, col, rng, in_rows = _sph_rowcol(cam, pc, el_lo, s_el)
    ok = (lane_valid & in_rows & (rng >= cam.min_depth)
          & (rng <= cam.max_depth))
    # unwrap each lane's column to the patch window: c0 is 128-aligned in
    # padded coords; the patch covers unpadded cols [c0-PAD, c0-PAD+256)
    lck = jnp.mod(col + SPH_PAD - c0, cam.cols)   # nearest representative
    inp = ok & (lck < FI_PATCH_W)
    # full lck rides in the packing (12 bits) so the element fallback can
    # recover the absolute column of out-of-patch lanes without re-
    # projecting; the kernel masks with the inp bit before its one-hots
    lck_c = jnp.minimum(lck, 4095)
    row_c = jnp.where(ok, row, 0)
    packed = (lck_c | (row_c << 12) | (inp.astype(jnp.int32) << 20)
              | (ok.astype(jnp.int32) << 21))
    rngb = jax.lax.bitcast_convert_type(rng.astype(jnp.float32), jnp.int32)
    return jnp.concatenate([packed, rngb], axis=1)


def _sph_patch_origin(cfg: MapConfig, cam: C.Camera, bpos):
    """128-aligned padded-coords patch column origin from block centers."""
    center = X.virtual_voxel_pos_to_world(
        cfg.virtual_voxel_size,
        X.sdf_block_to_virtual_voxel_pos(bpos)) + 3.5 * cfg.virtual_voxel_size
    pc = C.world_to_cam(cam, center)
    az = jnp.arctan2(pc[..., 1], pc[..., 0])
    ccol = jnp.clip(((az + jnp.pi) * (cam.cols / (2.0 * jnp.pi)))
                    .astype(jnp.int32), 0, cam.cols - 1)
    # padded-coords origin: patch [c0, c0+256) covers unpadded cols
    # [c0-128, c0+128); padded width = cols + 256
    return jnp.clip((ccol // 128) * 128, 0, cam.cols)


def _points_fallback(cfg: MapConfig, pool: VoxelPool, cam: C.Camera,
                     rng_img_unpadded, row, col, r_vox, ok, fb_ptr):
    """Element-wise voxel-centric update for out-of-patch lanes (mirrors
    the spherical kernel's fuse math; nearest-pixel gather sampling).

    row/col/r_vox/ok: per-lane raster coords + gate [BB,512] (decoded from
    the kernel's packed proj operand or recomputed by the caller)."""
    r_px = _sample_image(rng_img_unpadded.reshape(-1), row, col, cam.cols,
                         ok)
    sdf = r_px - r_vox
    trunc = X.get_truncation(r_px, cfg.sdf_truncation,
                             cfg.sdf_truncation_scale)
    update = (ok & (r_px > 0.0) & (r_px <= cfg.max_integration_distance)
              & (sdf > -trunc) & (sdf < trunc))
    sdf = jnp.clip(sdf, -trunc, trunc)

    lanes = jnp.arange(LANES, dtype=jnp.int32)[None, :]
    vidx = jnp.where(update, fb_ptr[:, None] + lanes, pool.num_voxels)
    sdf0 = pool.flat_sdf[vidx]
    ssq0 = pool.flat_sumsq[vidx]
    w0 = pool.flat_weight[vidx]
    w_up = jnp.float32(cfg.integration_weight_sample)
    half = jnp.float32(cfg.virtual_voxel_size / 2.0)
    curr_mean = jnp.where(w0 > 0, sdf0, 0.0)
    delta = (sdf - curr_mean) / half
    w0f = w0.astype(jnp.float32)
    m_sdf = (sdf0 * w0f + sdf * w_up) / (w0f + w_up)
    m_w = jnp.minimum(cfg.integration_weight_max,
                      (w0f + w_up).astype(jnp.int32))
    delta2 = (sdf - m_sdf) / half
    vidx_w = jnp.where(update, vidx, pool.num_voxels).reshape(-1)
    return pool.with_flat(
        sdf=pool.flat_sdf.at[vidx_w].set(m_sdf.reshape(-1), mode="drop"),
        weight=pool.flat_weight.at[vidx_w].set(m_w.reshape(-1), mode="drop"),
        sumsq=pool.flat_sumsq.at[vidx_w].set(
            (ssq0 + delta * delta2).reshape(-1), mode="drop"))


def fused_integrate_points(cfg: MapConfig, table: H.HashTable,
                           pool: VoxelPool, cam: C.Camera, points, normals,
                           weights, point_valid, frame, window):
    """One-kernel LiDAR integration over the compacted window (TPU-native
    inversion of integrate3DKernel, voxel_data_structures.cu:1214-1401 —
    deviation D19, DESIGN.md): rasterize the scan to a range image, run the
    fused spherical Pallas kernel over packed row slots, scatter rows back,
    then serve out-of-patch lanes of up to sample_fallback/512 blocks with
    the element-wise path (frame-rotated).  Requires cfg.projective_sdf.

    Returns (pool', aux) with aux = dict(unserved_blocks)."""
    from mrhash_tpu.ops import fused_integrate as FI

    wslots, bpos, bptr, bres, bvalid = window
    A = bpos.shape[0]
    multires = cfg.sdf_var_threshold > 0.0
    cast = jax.lax.bitcast_convert_type
    n_rows = pool.sdf.shape[0]

    el_lo, s_el = _scan_raster_mapping(cam, points, point_valid)
    rng_img = rasterize_scan(cfg, cam, points, point_valid, el_lo, s_el)
    rng_unpadded = rng_img[:, SPH_PAD:SPH_PAD + cam.cols]

    cam_vec = FI.make_cam_vec(
        cam, cfg.virtual_voxel_size, cfg.sdf_truncation,
        cfg.sdf_truncation_scale, cfg.max_integration_distance,
        cfg.integration_weight_sample, cfg.integration_weight_max,
        rng_img.shape[0], rng_img.shape[1])

    meta = jnp.zeros((A, 128), jnp.int32)
    if multires:
        rw = pack_window_rows(cfg, bpos, bptr, bres, bvalid, n_rows)
        _, lane0 = _block_rows(bptr, bvalid)
        meta = meta.at[:, :3].set(rw["rpos"])
        meta = meta.at[:, 3].set(rw["rvalid"].astype(jnp.int32))
        meta = meta.at[:, 4].set(jnp.where(rw["rvalid"], rw["rres"], 0))
        gmeta = jnp.concatenate(
            [rw["gpos"], rw["gvalid"][..., None]], axis=2).reshape(A, 32)
        meta = meta.at[:, 8:40].set(gmeta)
        meta = meta.at[:, 5].set(_sph_patch_origin(cfg, cam, rw["rpos"]))
        gc0 = _sph_patch_origin(cfg, cam, rw["gpos"].reshape(-1, 3)
                                ).reshape(A, 8)
        meta = meta.at[:, 40:48].set(gc0)
        rrow_c = jnp.where(rw["rvalid"], rw["rrow"], 0)
        pool_rows = jnp.concatenate(
            [cast(pool.sdf[rrow_c], jnp.int32),
             cast(pool.sumsq[rrow_c], jnp.int32),
             pool.weight[rrow_c], pool.rgbp[rrow_c]], axis=1)
        # lattice + per-lane origins in ROW layout (plain rows dense 8^3,
        # packed rows 8 x 4^3 carve groups)
        lanes = jnp.arange(LANES, dtype=jnp.int32)[None, :]
        grp = lanes // P.TOTAL_LOW_BLOCK_SIZE
        kindc = (rw["rres"] == 1)[:, None]
        gpos_l = jnp.take_along_axis(rw["gpos"], grp[..., None], axis=1)
        pos_l = jnp.where(kindc[..., None], gpos_l,
                          rw["rpos"][:, None, :])
        local = lanes % P.TOTAL_LOW_BLOCK_SIZE
        off4 = X.delinearize_voxel_pos(local, P.LOW_BLOCK_SIZE) * 2
        off8 = X.delinearize_voxel_pos(lanes, P.SDF_BLOCK_SIZE)
        offs = jnp.where(kindc[..., None], off4, off8)
        pi = X.sdf_block_to_virtual_voxel_pos(pos_l) + offs
        gval_l = jnp.take_along_axis(rw["gvalid"], grp, axis=1) != 0
        lane_valid = jnp.where(kindc, gval_l, rw["rvalid"][:, None])
        c0_l = jnp.where(kindc, jnp.take_along_axis(gc0, grp, axis=1),
                         meta[:, 5:6])
    else:
        prow, lane0 = _block_rows(bptr, bvalid)
        meta = meta.at[:, :3].set(jnp.where(bvalid[:, None], bpos, 0))
        meta = meta.at[:, 3].set(bvalid.astype(jnp.int32))
        meta = meta.at[:, 5].set(_sph_patch_origin(cfg, cam, bpos))
        pool_rows = jnp.concatenate(
            [cast(pool.sdf[prow], jnp.int32),
             cast(pool.sumsq[prow], jnp.int32),
             pool.weight[prow], pool.rgbp[prow]], axis=1)
        pi, lane_valid = _block_voxel_grid(bpos, bres)
        lane_valid = lane_valid & bvalid[:, None]
        c0_l = jnp.broadcast_to(meta[:, 5:6], (A, LANES))

    proj = _sph_proj_pack(cfg, cam, pi, lane_valid, el_lo, s_el, c0_l)

    out = FI.fused_integrate_points_pallas(
        rng_img, cam_vec, meta, proj, pool_rows,
        interpret=cfg.pallas_interpret, multires=multires)

    L = LANES
    if multires:
        rows_w = jnp.where(rw["rvalid"], rw["rrow"], n_rows)
    else:
        rows_w = jnp.where(bvalid, prow, n_rows)
    pool = pool.replace(
        sdf=pool.sdf.at[rows_w].set(cast(out[:, 0:L], jnp.float32),
                                    mode="drop", unique_indices=True),
        sumsq=pool.sumsq.at[rows_w].set(cast(out[:, L:2 * L], jnp.float32),
                                        mode="drop", unique_indices=True),
        weight=pool.weight.at[rows_w].set(out[:, 2 * L:3 * L], mode="drop",
                                          unique_indices=True))

    # --- bounded element fallback for out-of-patch (near) lanes -------------
    if multires:
        # GC + coarsen decisions ride the kernel flag lanes (same bitmask
        # mapping as the RGB-D fused path — no pool-row gathers)
        uns_b, aux = _window_flag_decisions(cfg, cam, out, rw, bres,
                                            bvalid, True)
    else:
        uns_b = out[:, 4 * L] > 0
        aux = dict(gc_min_s=cast(out[:, 4 * L + 1], jnp.float32),
                   gc_max_w=out[:, 4 * L + 2])
    BB = int(cfg.points_fallback) // L
    bneed = bvalid & uns_b
    shift = (frame.astype(jnp.int32) * 4097) % A
    rolled = jnp.roll(bneed, -shift)
    sel_r, bok, total_need = H.compact_indices(rolled, BB)
    bsel = (jnp.where(bok, sel_r, 0) + shift) % A
    aux["unserved_blocks"] = total_need - jnp.sum(bok.astype(jnp.int32))

    # fallback serves ONLY the out-of-patch lanes (in-patch lanes were
    # already updated by the kernel — double updates would double weights)
    if multires:
        # res-1 entries' lanes live at a carve offset inside their packed
        # SLOT's proj row — recompute per-entry projections instead
        fb_pos = bpos[bsel]
        fb_res = bres[bsel]
        pi_fb, lv_fb = _block_voxel_grid(fb_pos, fb_res)
        pw_fb = X.virtual_voxel_pos_to_world(cfg.virtual_voxel_size, pi_fb)
        row_fb, col_fb, rv_fb, inr_fb = _sph_rowcol(
            cam, C.world_to_cam(cam, pw_fb), el_lo, s_el)
        okp = (lv_fb & inr_fb & (rv_fb >= cam.min_depth)
               & (rv_fb <= cam.max_depth))
        c0_fb = _sph_patch_origin(cfg, cam, fb_pos)[:, None]
        lck_fb = jnp.mod(col_fb + SPH_PAD - c0_fb, cam.cols)
        oop = okp & ~((lck_fb >= 0) & (lck_fb < FI_PATCH_W))
        ok_fb = bok[:, None] & oop
    else:
        # decode the kernel's own packed proj rows — no re-projection
        pr = proj[bsel]                                   # [BB,1024] gather
        pk = pr[:, :L]
        row_fb = (pk >> 12) & 255
        okp = ((pk >> 21) & 1) != 0
        oop = okp & (((pk >> 20) & 1) == 0)
        lck = pk & 4095
        col_fb = jnp.mod(meta[bsel, 5:6] + lck - SPH_PAD, cam.cols)
        rv_fb = cast(pr[:, L:], jnp.float32)
        ok_fb = bok[:, None] & oop
    pool = _points_fallback(cfg, pool, cam, rng_unpadded, row_fb, col_fb,
                            rv_fb, ok_fb, bptr[bsel])
    return pool, aux


# ---------------------------------------------------------------------------
# garbage collection
# ---------------------------------------------------------------------------

def starve_band_hits(cfg: MapConfig, cam: C.Camera, bpos, bvalid,
                     band, n_bands: int):
    """Hit mask of window entries whose projected row span intersects
    image-row band `band` of `n_bands` (banded starve,
    cfg.starve_bands > 1).

    Exact for pinhole cameras: a block's perspective projection is the
    convex hull of its 8 projected corners, so the corner row min/max
    bound every voxel's row.  Blocks with any corner at or behind the
    near plane are conservatively included in every band.  Returns
    (hit[A], band_lo, band_hi).  Cheap (8 corner projections per entry),
    so callers run it unconditionally and branch on jnp.sum(hit) — the
    compaction to a capped window happens inside the banded branch."""
    vvs = cfg.virtual_voxel_size
    ext = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
         [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], jnp.int32)
    corners = (bpos[:, None, :] + ext[None, :, :]).astype(jnp.float32) \
        * (P.SDF_BLOCK_SIZE * vvs)                       # [A,8,3] world
    pc = C.world_to_cam(cam, corners)
    row, _, ok = C.project_point_approx(cam, pc)
    z_ok = pc[..., 2] > cam.min_depth
    rows_f = row.astype(jnp.int32)
    rmin = jnp.min(jnp.where(z_ok, rows_f, jnp.int32(1 << 30)), axis=1)
    rmax = jnp.max(jnp.where(z_ok, rows_f, jnp.int32(-(1 << 30))), axis=1)
    any_bad = jnp.any(~z_ok, axis=1)

    H_ = cam.rows
    band = band.astype(jnp.int32)
    lo = band * (H_ // n_bands)
    hi = jnp.where(band == n_bands - 1, H_, (band + 1) * (H_ // n_bands))
    hit = bvalid & (any_bad | ((rmin <= hi - 1) & (rmax >= lo)))
    return hit, lo, hi


def starve_band_select(cfg: MapConfig, cam: C.Camera, bpos, bvalid,
                       band, n_bands: int, cap: int):
    """starve_band_hits + compaction to a [cap] window.  Returns
    (sel[cap], selok[cap], band_lo, band_hi, n_total).  Overflow
    (n_total > cap) must NOT be treated as a benign stagger: dropped
    blocks also vanish from the band's z-buffer, so occluded voxels
    behind them would become false per-pixel winners and starve —
    callers fall back to the full-window starve for the band."""
    hit, lo, hi = starve_band_hits(cfg, cam, bpos, bvalid, band, n_bands)
    sel, selok, n_total = H.compact_indices(hit, cap)
    return sel, selok, lo, hi, n_total


def starve_mask(cfg: MapConfig, cam: C.Camera, bpos, bptr, bres, bvalid,
                axis_name=None, row_band=None, band_rows=None):
    """Geometry half of starveVoxelsKernel: the [A,512] mask of front-most
    (per pixel) window voxels.  Reads no pool data — callers apply the
    weight decrement via apply_starve (possibly split across pools, as the
    multi-res resident pipeline does for rows coarsening released
    mid-frame).

    axis_name: when set (SPMD path, parallel/sharding.py), the per-pixel
    z-buffer is pmin-merged across the mesh axis after the local
    scatter-min, so every shard's winner test reads the GLOBAL front
    depth.  Semantics stay D11 (all exact-depth ties starve) on both the
    single-chip and sharded paths, so the two are bit-equal.

    row_band=(lo, hi): banded starve — only voxels whose own pixel row is
    in [lo, hi) participate (as z-buffer sources AND as starve targets).
    A pixel's winner is exact as long as the window passed in contains
    every block projecting into the band (starve_band_select).

    band_rows: static sub-image height covering every band (callers pass
    H//n + H%n).  With it, the z-buffer and its sampler readback run on a
    [band_rows, W] SUB-image at row offset lo — the full-image zbuf fill +
    sampler pass cost ~23 ms/band at 1200x680 for rows that cannot win."""
    vvs = cfg.virtual_voxel_size
    prow, lane0 = _block_rows(bptr, bvalid)
    pi, lane_valid = _block_voxel_grid(bpos, bres, lane0)
    pf = X.virtual_voxel_pos_to_world(vvs, pi)
    pcam = C.world_to_cam(cam, pf)
    row, col, ok = C.project_point(cam, pcam)
    depth = C.get_depth(cam, pcam)
    ok = ok & (depth >= cam.min_depth) & bvalid[:, None] & lane_valid
    row0 = jnp.int32(0)
    img_rows = cam.rows
    if row_band is not None:
        ok = ok & (row >= row_band[0]) & (row < row_band[1])
        if band_rows is not None:
            # z-buffer + sampler run on the band's sub-image
            row0 = row_band[0]
            img_rows = int(band_rows)
            row = row - row0

    HW = img_rows * cam.cols
    FAR = jnp.float32(1e30)  # finite sentinel (INF through bf16 MXU is UB)
    pix = jnp.where(ok, row * cam.cols + col, HW).reshape(-1)
    d = jnp.where(ok, depth, FAR).reshape(-1)
    zbuf = jnp.full((HW,), FAR, jnp.float32).at[pix].min(d, mode="drop")
    if axis_name is not None:
        zbuf = jax.lax.pmin(zbuf, axis_name)

    if cfg.sample_mode in ("patch", "pallas", "fused"):
        zimg = zbuf.reshape(img_rows, cam.cols)
        scfg = dataclasses.replace(
            cfg, sample_mode="pallas" if cfg.sample_mode == "fused"
            else cfg.sample_mode)
        block_center = X.virtual_voxel_pos_to_world(
            vvs, X.sdf_block_to_virtual_voxel_pos(bpos)) + 3.5 * vvs
        cr, cc, _ = C.project_point_approx(cam,
                                           C.world_to_cam(cam, block_center))
        center_rc = jnp.stack([cr - row0, cc], axis=-1)
        zeros_rgb = jnp.zeros((img_rows, cam.cols, 3), jnp.uint8)
        zsamp, _ = _sample_depth_rgb(scfg, zimg, zeros_rgb, row, col, ok,
                                     center_rc)
        starved = ok & (depth == zsamp)
    else:
        starved = (ok.reshape(-1)
                   & (d == zbuf[jnp.where(pix < HW, pix, 0)])).reshape(
            (-1, LANES))
    return starved


def apply_starve(cfg: MapConfig, pool: VoxelPool, bptr, bres, bvalid,
                 starved):
    """Decrement the weights of the starved lanes (window-masked row
    writeback)."""
    prow, lane0 = _block_rows(bptr, bvalid)
    w0 = pool.weight[prow]
    return _scatter_block_rows(
        pool, prow, bres, bvalid, starved & bvalid[:, None],
        dict(weight=jnp.maximum(0, w0 - 1)), dict(weight=w0),
        multires=cfg.sdf_var_threshold > 0.0, lane0=lane0)


def starve_voxels(cfg: MapConfig, pool: VoxelPool, cam: C.Camera,
                  bpos, bptr, bres, bvalid):
    """starveVoxelsKernel z-buffer (voxel_data_structures.cu:1596-1671): the
    front-most voxel per pixel gets its weight decremented.

    The winner test reads the z-buffer back per voxel THROUGH THE PATCH
    SAMPLER (the z-buffer is an image) instead of an element-wise gather —
    two 16.7M-element gathers plus the tie-break pass measured 662ms/event
    on v5e; this formulation costs one scatter-min + one sampler pass.
    Deviation D11 (DESIGN.md): voxels tied at the exact same f32 depth all
    starve (the reference tie-breaks to the lowest thread id); ties between
    distinct voxels are measure-zero and starvation is a decay heuristic."""
    starved = starve_mask(cfg, cam, bpos, bptr, bres, bvalid)
    return apply_starve(cfg, pool, bptr, bres, bvalid, starved)


def _clear_blocks(pool: VoxelPool, bptr, bres, mask, multires=True):
    """deleteVoxel over whole blocks (voxel_data_structures.cu:1838-1842):
    zero the freed blocks' rows (res-0) / row windows (res-1)."""
    A = bptr.shape[0]
    prow, lane0 = _block_rows(bptr, mask)
    lanes = jnp.arange(LANES, dtype=jnp.int32)
    local = lanes[None, :] - lane0[:, None]
    nvox = jnp.where(bres == 1, P.TOTAL_LOW_BLOCK_SIZE, LANES)[:, None]
    in_window = (local >= 0) & (local < nvox)
    zero = dict(sdf=jnp.zeros((A, LANES), jnp.float32),
                sumsq=jnp.zeros((A, LANES), jnp.float32),
                weight=jnp.zeros((A, LANES), jnp.int32),
                rgbp=jnp.zeros((A, LANES), jnp.int32))
    old = _gather_block_rows(pool, prow)
    return _scatter_block_rows(pool, prow, bres, mask,
                               in_window & mask[:, None], zero, old,
                               multires=multires, lane0=lane0)


def garbage_collect_sweep(cfg: MapConfig, table: H.HashTable,
                          pool: VoxelPool, cam: C.Camera,
                          slots, bpos, bptr, bres, bvalid,
                          kernel_flags=None, resident_rp=None,
                          kernel_decision=None):
    """garbageCollectIdentify + Free (voxel_data_structures.cu:1673-1854):
    free blocks whose min |sdf| exceeds the max-depth truncation or whose max
    weight is zero.

    kernel_flags = (min_abs_sdf[A], max_w[A]) from the fused integrate
    kernel's flag lanes: skips the w/sdf row gathers.  kernel_decision =
    the per-entry free decision already computed (bool[A], multires fused
    path).  On starve frames the flags predate the starvation decrement,
    so a block starved to weight 0 is freed one frame later (deviation
    D12, DESIGN.md).

    With resident_rp (core/resident mode), the window is in resident-slot
    order, `pool` is the BIG pool (freed rows are zeroed there for heap
    reuse) and freed blocks' residency is released; returns
    (table, pool, rp') instead of (table, pool)."""
    trunc_max = X.get_truncation(cam.max_depth, cfg.sdf_truncation,
                                 cfg.sdf_truncation_scale)
    if kernel_decision is not None:
        decision = bvalid & kernel_decision
        prow, lane0 = _block_rows(bptr, bvalid)
    elif kernel_flags is not None:
        min_s, max_w = kernel_flags
        decision = bvalid & ((min_s >= trunc_max) | (max_w == 0))
        prow, lane0 = _block_rows(bptr, bvalid)
    else:
        prow, lane0 = _block_rows(bptr, bvalid)
        lanes = jnp.arange(LANES, dtype=jnp.int32)
        local = lanes[None, :] - lane0[:, None]
        nvox = jnp.where(bres == 1, P.TOTAL_LOW_BLOCK_SIZE, LANES)[:, None]
        lane_valid = (local >= 0) & (local < nvox)
        w_rows = pool.weight[prow]
        s_rows = pool.sdf[prow]
        w = jnp.where(bvalid[:, None] & lane_valid, w_rows, 0)
        s = jnp.where((w > 0) & lane_valid, jnp.abs(s_rows), INF)
        decision = bvalid & ((jnp.min(s, axis=1) >= trunc_max)
                             | (jnp.max(w, axis=1) == 0))
    # bound the per-frame free+clear set: the clear's row scatters cost
    # scales with its SOURCE length (the whole compacted window before),
    # and steady-state frames free only a handful of blocks.  Overflow
    # staggers to the next frame like every other capacity cap.
    # The whole free+clear pass sits under decision.any() (like the
    # coarsen chain): a frame with nothing to free pays only the scalar
    # decision math — the unconditional pass measured ~2.5 ms/frame of
    # K-capacity machinery at ScanNet scale.
    K = int(cfg.max_gc_free_per_frame)
    multires = cfg.sdf_var_threshold > 0.0
    if resident_rp is not None and multires:
        assert kernel_decision is not None, (
            "multi-res resident GC needs the kernel decision (the "
            "big-pool rows are stale)")

    def free_of(k):
        def do_free(table, pool, rp):
            from mrhash_tpu.core import resident as RES
            didx, dvalid, _ = H.compact_indices(decision, k)
            didx_c = jnp.where(dvalid, didx, 0)
            table, ptrs, fres, freed = H.free_slots(table, slots[didx_c],
                                                    dvalid)
            if resident_rp is not None and multires:
                # multi-res resident: freed carves share rows with live
                # siblings — flush the resident copies to the big pool
                # BEFORE zeroing the freed windows there, then drop
                # residency (rows re-adopt from the updated big copy next
                # frame)
                rp, pool = RES.flush_release_rows(rp, pool, ptrs // LANES,
                                                  freed)
                pool = _clear_blocks(pool, ptrs, fres, freed, multires=True)
                return table, pool, rp
            pool = _clear_blocks(pool, ptrs, fres, freed, multires=multires)
            if resident_rp is not None:
                rp = RES.release_rows(rp, ptrs // LANES, didx_c, freed)
            return table, pool, rp
        return do_free

    def skip_free(table, pool, rp):
        return table, pool, rp

    # tier the free+clear chain like _tiered_coarsen: its row traffic is
    # O(capacity) whether 1 or K blocks free, and steady-state frames free
    # a handful — the n_decide <= tier branch runs a k=tier-sized program,
    # bursts take the full-K one (both compile once; exactly one runs)
    tier = min(int(cfg.gc_free_tier), K)
    n_decide = jnp.sum(decision.astype(jnp.int32))
    if 0 < tier < K:
        small, full = free_of(tier), free_of(K)

        def do_free(table, pool, rp):
            return jax.lax.cond(n_decide <= tier, small, full,
                                table, pool, rp)
    else:
        do_free = free_of(K)

    any_free = n_decide > 0
    if resident_rp is not None:
        return jax.lax.cond(any_free, do_free, skip_free, table, pool,
                            resident_rp)
    table, pool, _ = jax.lax.cond(any_free, do_free, skip_free, table,
                                  pool, 0)
    return table, pool


# ---------------------------------------------------------------------------
# variance-adaptive coarsening (multi-resolution)
# ---------------------------------------------------------------------------

def coarsen_decide(cfg: MapConfig, pool: VoxelPool, bptr, bres, bvalid):
    """checkVarSDFKernel decision mask (voxel_data_structures.cu:1856-1905):
    res-0 blocks whose average SDF variance is positive and below threshold.
    Cheap (two row gathers + reductions) — the expensive free/realloc/
    reintegrate applies under a lax.cond on decide.any(), so steady-state
    frames (nothing left to coarsen) skip it entirely."""
    prow, _ = _block_rows(bptr, bvalid)
    w = pool.weight[prow]
    ssq = pool.sumsq[prow]
    # only res-0 blocks coarsen; their window is the full row
    wf = jnp.where((w > 0) & bvalid[:, None], w, 0).astype(jnp.float32)
    ssqf = jnp.where((w > 0) & bvalid[:, None], ssq, 0.0)
    w_tot = jnp.sum(wf, axis=1)
    ssq_tot = jnp.sum(ssqf, axis=1)
    avg_var = ssq_tot / jnp.maximum(w_tot - 1.0, 1e-12)
    return (bvalid & (bres == 0) & (w_tot >= 2)
            & (avg_var > 0.0) & (avg_var < cfg.sdf_var_threshold))


def coarsen_by_variance(cfg: MapConfig, table: H.HashTable, pool: VoxelPool,
                        slots, bpos, bptr, bres, bvalid, decide=None,
                        u=None, pre_write_hook=None):
    """checkVarSDFKernel + reallocBlocks (voxel_data_structures.cu:
    1856-2069): res-0 blocks whose average SDF variance is below threshold
    are freed and re-allocated at res 1 (drawing from the low heap, refilled
    by splitting high blocks when short).

    u overrides the serve capacity (tiered dispatch: the whole free/clear/
    insert/reintegrate chain costs O(u), and the steady-state trickle is a
    handful of decisions — callers pick a small tier when the decide count
    fits, see pipeline._tiered_coarsen).

    Returns (table', pool', new_slots[u], new_mask[u], served[A]) — the
    re-allocated coarse blocks to re-integrate, and the window entries
    freed this call (callers must exclude them from later same-frame
    passes over the pre-coarsen window: their hash slots are free and
    their rows cleared/reusable)."""
    if decide is None:
        decide = coarsen_decide(cfg, pool, bptr, bres, bvalid)

    # serve at most u decisions per frame; the rest stay FINE and re-decide
    # next frame (freeing beyond the re-alloc budget would drop their data
    # without a coarse replacement)
    if u is None:
        u = cfg.max_coarsen_per_frame
    A = decide.shape[0]

    # compact the served indices FIRST so free_slots and the row clears run
    # on u-sized views: a scatter's cost scales with its SOURCE length
    # (DESIGN.md rule), and free_slots over the full window carried O(A)
    # heap-push + table-clear sources per fire — a per-frame tax at the
    # steady-state trickle (the chain fires nearly every travel frame)
    sel, selok, _ = H.compact_indices(decide, u)
    safe_sel = jnp.where(selok, sel, 0)
    table, ptrs_u, fres_u, freed_u = H.free_slots(table, slots[safe_sel],
                                                  selok)
    if cfg.coarsen_downsample:
        # snapshot the fine rows before the clear: the accumulated
        # observations downsample-merge into the coarse block below
        prow_f, _ = _block_rows(ptrs_u, freed_u)
        fine = _gather_block_rows(pool, prow_f)
    pool = _clear_blocks(pool, ptrs_u, fres_u, freed_u)

    # queue re-allocation at res+1 (compaction preserves window order)
    rkeys = jnp.where(freed_u[:, None], bpos[safe_sel], 0)
    rvalid = freed_u

    # full-window freed mask for the caller's same-frame exclusions
    freed = jnp.zeros((A,), bool).at[
        jnp.where(selok, sel, A)].set(freed_u, mode="drop")

    # refill low heap if short (allocateMemoryLow)
    need = jnp.sum(rvalid.astype(jnp.int32))
    table = H.split_high_blocks(table, cfg.low_split_chunk,
                                enable=table.low_count < need)

    table, info = H.insert(table, rkeys, rvalid, jnp.ones((u,), jnp.int32))
    if pre_write_hook is not None:
        # resident caller: flush sibling-resident carve rows BEFORE the
        # downsample writes its window through the big pool (a later flush
        # would overwrite the fresh window with the stale resident copy)
        pool = pre_write_hook(table, pool, info)
    if cfg.coarsen_downsample:
        pool = _downsample_into_coarse(cfg, table, pool, fine,
                                       info["slot"], rvalid & info["was_new"])
    return table, pool, info["slot"], info["was_new"], freed


def _downsample_into_coarse(cfg: MapConfig, table: H.HashTable,
                            pool: VoxelPool, fine, new_slots, new_mask):
    """Merge a freed fine block's accumulated observations into its coarse
    replacement: each coarse voxel takes the weight-sum / weighted-mean SDF
    / weighted-mean color of its 8 children, with sumsq combined by the
    parallel-variance formula (Chan), consistent with the integration
    accumulator's half-virtual-voxel normalization (integrate_depth above).
    TPU-first improvement over the reference, which deletes the data and
    reintegrates only the current frame (voxel_data_structures.cu:
    1929-2018) — the cause of the multi-res recall drop when the camera has
    already moved past a coarsened region.  All arrays are u-sized; the
    writeback is one row scatter-ADD of window-masked deltas (res-1 carve
    rule of _scatter_block_rows)."""
    u = new_slots.shape[0]
    half_voxel = jnp.float32(cfg.virtual_voxel_size / 2.0)
    # fine lane = z*64 + y*8 + x  ->  [u, cz,dz, cy,dy, cx,dx]
    shape6 = (u, 4, 2, 4, 2, 4, 2)
    wf = fine["weight"].astype(jnp.float32).reshape(shape6)
    sd = fine["sdf"].reshape(shape6)
    ssq = jnp.where(wf > 0, fine["sumsq"].reshape(shape6), 0.0)
    rgb = unpack_rgb(fine["rgbp"], jnp.float32).reshape(shape6 + (3,))

    w_c = jnp.sum(wf, axis=(2, 4, 6))                      # [u,4,4,4]
    w_safe = jnp.maximum(w_c, 1.0)
    m_c = jnp.sum(wf * sd, axis=(2, 4, 6)) / w_safe

    # First-order de-bias (round-5): the stored coarse voxel center
    # coincides with its (0,0,0) child — NOT with the children's weighted
    # centroid at +0.5 fine voxel per axis — so the raw weighted mean
    # estimates the SDF up to half a fine voxel off along each axis
    # (0.87*vvs diagonally).  Round 4 shipped that as a half-voxel surface
    # shift wherever the camera had moved on (clutter precision
    # 0.901 -> 0.852, chamfer 0.0254 -> 0.0327, tests/test_quality.py).
    # Correct with the per-axis SDF gradient (weighted half-means) times
    # the weighted-centroid offset; axes with data on only one side keep
    # the uncorrected term (no worse than before).
    corr = jnp.zeros_like(m_c)
    for ax in (2, 4, 6):                   # dz, dy, dx child axes
        other = tuple(a for a in (2, 4, 6) if a != ax)
        w_lo = jnp.sum(jnp.take(wf, 0, axis=ax), axis=tuple(
            a - (1 if a > ax else 0) for a in other))
        w_hi = jnp.sum(jnp.take(wf, 1, axis=ax), axis=tuple(
            a - (1 if a > ax else 0) for a in other))
        ws_lo = jnp.sum(jnp.take(wf * sd, 0, axis=ax), axis=tuple(
            a - (1 if a > ax else 0) for a in other))
        ws_hi = jnp.sum(jnp.take(wf * sd, 1, axis=ax), axis=tuple(
            a - (1 if a > ax else 0) for a in other))
        m_lo = ws_lo / jnp.maximum(w_lo, 1.0)
        m_hi = ws_hi / jnp.maximum(w_hi, 1.0)
        g = m_hi - m_lo                    # SDF change per fine-voxel step
        off = w_hi / w_safe                # weighted-centroid offset (0..1)
        corr = corr + jnp.where((w_lo > 0) & (w_hi > 0), off * g, 0.0)
    m_c = m_c - corr

    dev = (sd - m_c[:, :, None, :, None, :, None]) / half_voxel
    ssq_c = jnp.sum(ssq + wf * dev * dev, axis=(2, 4, 6))
    rgb_c = (jnp.sum(wf[..., None] * rgb, axis=(2, 4, 6))
             / w_safe[..., None])
    occ = w_c > 0

    # coarse lane = cz*16 + cy*4 + cx (reshape order matches)
    def pack64(a, dtype):
        return a.reshape(u, 64).astype(dtype)
    c_sdf = pack64(jnp.where(occ, m_c, 0.0), jnp.float32)
    c_ssq = pack64(jnp.where(occ, ssq_c, 0.0), jnp.float32)
    c_w = pack64(jnp.minimum(w_c, cfg.integration_weight_max), jnp.int32)
    c_rgb = pack64(pack_rgb(jnp.floor(rgb_c + 0.5).astype(jnp.int32)
                            * occ[..., None].astype(jnp.int32)), jnp.int32)

    safe_slot = jnp.where(new_mask, new_slots, 0)
    new_ptr = table.ptr[safe_slot]
    new_res = table.res[safe_slot]
    prow_c, lane0_c = _block_rows(new_ptr, new_mask)
    carve = lane0_c // P.TOTAL_LOW_BLOCK_SIZE                   # [u] 0..7
    lanes = jnp.arange(LANES, dtype=jnp.int32)[None, :]
    local = lanes - lane0_c[:, None]
    in_win = (local >= 0) & (local < P.TOTAL_LOW_BLOCK_SIZE)

    def place(c64):
        # 8 static pad positions selected per-row (no per-element gather)
        out = jnp.zeros((u, LANES), c64.dtype)
        for i in range(8):
            pad = jnp.pad(c64, ((0, 0), (i * 64, LANES - (i + 1) * 64)))
            out = jnp.where((carve == i)[:, None], pad, out)
        return out

    new = dict(sdf=place(c_sdf), sumsq=place(c_ssq), weight=place(c_w),
               rgbp=place(c_rgb))
    old = _gather_block_rows(pool, prow_c)
    return _scatter_block_rows(pool, prow_c, new_res, new_mask,
                               in_win & new_mask[:, None], new, old,
                               multires=True, lane0=lane0_c)


def reintegrate_blocks(cfg: MapConfig, table: H.HashTable, pool: VoxelPool,
                       cam: C.Camera, pc_depth, rgb_img, new_slots, new_mask):
    """reintegrateDepthMapKernel (voxel_data_structures.cu:1941-2018): fuse
    the current frame into freshly coarsened blocks (no variance update)."""
    safe = jnp.where(new_mask, new_slots, 0)
    return integrate_depth(cfg, pool, cam, pc_depth, rgb_img,
                           table.pos[safe], table.ptr[safe], table.res[safe],
                           new_mask)
