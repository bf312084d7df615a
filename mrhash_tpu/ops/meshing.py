"""Marching-cubes iso-surface extraction (Transvoxel tables).

TPU re-derivation of MarchingCubesExtractor
(mrhash/src/sdf/marching_cubes.{cuh,cu}) and the mixed-resolution trilinear
interpolation it samples (voxel_data_structures.cu:260-338).

Two-phase extraction instead of one mega-kernel: a cheap corner-weight gate
over all (block, voxel) cells, compaction of surviving cells, then the full
64-lookup trilinear + table lookup on survivors only.  Output is a fixed-
capacity triangle buffer + count (the reference's max_num_triangles_mesh_
budget, mesh_extractor.cuh:47-65).
"""
from __future__ import annotations

import jax.numpy as jnp

from mrhash_tpu import params as P
from mrhash_tpu.core.state import MapConfig, VoxelPool, unpack_rgb
from mrhash_tpu.ops import coords as X
from mrhash_tpu.ops import hashtable as H
from mrhash_tpu.ops import transvoxel as TV
from mrhash_tpu.ops.integrate import _block_rows, _block_voxel_grid

# Transvoxel tables as device constants
_CELL_CLASS = jnp.asarray(TV.REGULAR_CELL_CLASS, jnp.int32)
_CELL_GEOM = jnp.asarray(TV.REGULAR_CELL_GEOMETRY, jnp.int32)
_CELL_VIDX = jnp.asarray(TV.REGULAR_CELL_VERTEX_INDEX, jnp.int32)   # [16,15]
_VERTEX_DATA = jnp.asarray(TV.REGULAR_VERTEX_DATA, jnp.int32)       # [256,12]

# cube corner k: bit0 -> +x, bit1 -> +y, bit2 -> +z (dist000..dist111
# ordering of marching_cubes.cu:85-157 with cube_index += 1 << k)
_CORNER = jnp.asarray(
    [[(k >> 0) & 1, (k >> 1) & 1, (k >> 2) & 1] for k in range(8)],
    jnp.float32)


# 27-neighborhood offsets, index = (dz+1)*9 + (dy+1)*3 + (dx+1)
_OFF27 = jnp.asarray([[dx, dy, dz]
                      for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                      for dx in (-1, 0, 1)], jnp.int32)


def build_ring(cfg: MapConfig, table: H.HashTable, bpos, bvalid):
    """27-neighbor lookup cache for a block window: resolves (found, ptr,
    res) of every window block's 1-ring ONCE, so the extraction phases
    answer point->block lookups with index arithmetic + one gather instead
    of a probe-window scan per point.

    TPU rationale: the mesh sweep's hot cost is point lookups (~158 per
    cell through gate + trilinear + corner reads, each a ~17-gather
    fingerprint probe); every probed point of a cell lies within +-6 fine
    voxels of its block (< the 8-voxel block side), so the 27-ring bounds
    every lookup the sweep can make.  Ring build cost is 27*A probed keys
    per window, once.

    Returns dict(found[A*27], ptr[A*27], res[A*27])."""
    keys = (bpos[:, None, :] + _OFF27[None, :, :]).reshape(-1, 3)
    found, _, ptr, res = H.lookup(table, keys,
                                  valid=jnp.repeat(bvalid, _OFF27.shape[0]))
    return dict(found=found, ptr=ptr, res=res)


def _ring_resolve(ctx, blk):
    """(found, ptr, res) of block keys `blk` [...,3] through the ring cache.
    ctx = (ring, bpos_window[A,3], cell_blk[...]) where cell_blk is the
    window row owning each query point (broadcastable to blk.shape[:-1]).
    Keys beyond the 1-ring resolve to found=False (geometrically impossible
    for the mesh sweep's probes — see build_ring)."""
    ring, bposw, cell_blk = ctx
    rel = blk - bposw[cell_blk]
    inb = jnp.all(jnp.abs(rel) <= 1, axis=-1)
    nidx = ((rel[..., 2] + 1) * 9 + (rel[..., 1] + 1) * 3
            + (rel[..., 0] + 1))
    ridx = jnp.where(inb, cell_blk * 27 + nidx, 0)
    found = ring["found"][ridx] & inb
    safe = jnp.where(found, ridx, 0)
    return found, ring["ptr"][safe], ring["res"][safe]


def get_voxel(cfg: MapConfig, table: H.HashTable, pool: VoxelPool, pos,
              ctx=None):
    """getVoxel(world) (voxel_data_structures.cu:162-205): nearest virtual
    voxel's stored value at the owning block's resolution.

    pos: f32[...,3].  Returns (sdf, weight, rgb f32[...,3] 0-255, res,
    found).  ctx: optional ring-cache context (build_ring) replacing the
    per-point probe lookup."""
    vvs = cfg.virtual_voxel_size
    ext = jnp.asarray(cfg.voxel_extents, jnp.float32)
    pi = X.world_point_to_virtual_voxel_pos(vvs, pos)
    blk = X.virtual_voxel_pos_to_sdf_block(pi, vvs, ext)
    shape = pi.shape[:-1]
    if ctx is None:
        found, _, ptr, res = H.lookup(table, blk.reshape(-1, 3))
        found = found.reshape(shape)
        ptr = ptr.reshape(shape)
        res = res.reshape(shape)
    else:
        found, ptr, res = _ring_resolve(ctx, blk)

    scale = (1 << res).astype(jnp.int32)
    local = jnp.mod(pi, P.SDF_BLOCK_SIZE) // scale[..., None]
    side = P.SDF_BLOCK_SIZE // scale
    lane = (local[..., 2] * side * side + local[..., 1] * side
            + local[..., 0])
    vidx = jnp.where(found, ptr + lane, 0)
    sdf = jnp.where(found, pool.flat_sdf[vidx], 0.0)
    w = jnp.where(found, pool.flat_weight[vidx], 0)
    rgb = jnp.where(found[..., None],
                    unpack_rgb(pool.flat_rgbp[vidx], jnp.float32), 0.0)
    return sdf, w, rgb, jnp.where(found, res, 0), found


def get_voxel_size(cfg: MapConfig, table: H.HashTable, pos, ctx=None):
    """getVoxelSize(world) (voxel_data_structures.cu:226-240): vvs * 2^res of
    the owning block (res 0 if unallocated)."""
    vvs = cfg.virtual_voxel_size
    ext = jnp.asarray(cfg.voxel_extents, jnp.float32)
    pi = X.world_point_to_virtual_voxel_pos(vvs, pos)
    blk = X.virtual_voxel_pos_to_sdf_block(pi, vvs, ext)
    shape = pi.shape[:-1]
    if ctx is None:
        found, _, _, res = H.lookup(table, blk.reshape(-1, 3))
        found = found.reshape(shape)
        res = res.reshape(shape)
    else:
        found, _, res = _ring_resolve(ctx, blk)
    res = jnp.where(found, res, 0)
    return vvs * (1 << res).astype(jnp.float32), res


def trilinear_interpolation(cfg: MapConfig, table: H.HashTable,
                            pool: VoxelPool, pos, ctx=None):
    """trilinearInterpolation (voxel_data_structures.cu:260-338): 8-corner
    blend at the local voxel size, with coarse-neighbor SDF blending across
    resolution boundaries.  pos f32[...,3] -> (dist, valid)."""
    vs, base_res = get_voxel_size(cfg, table, pos, ctx)         # [...]
    # NOTE: the reference re-derives base_res from block coords computed
    # with the scaled voxel size (voxel_data_structures.cu:264), which for
    # coarse blocks addresses a different key space; we read the true owning
    # block's resolution instead (documented deviation, DESIGN.md).
    vsn = vs[..., None]
    pos_dual = pos - 0.5 * vsn
    pos_sdf, _, _, _, _ = get_voxel(cfg, table, pool, pos_dual, ctx)

    sdf = []
    valid = jnp.ones(pos.shape[:-1], bool)
    p_max = pos_dual
    for k in range(8):
        corner = _CORNER[k]
        vp = pos_dual + corner * vsn
        v_sdf, v_w, _, v_res, _ = get_voxel(cfg, table, pool, vp, ctx)
        valid = valid & (v_w > 0)
        # resolution boundary: blend with the coarse sample
        nvs = vsn * 2.0
        nvp = pos - 0.5 * nvs + corner * nvs
        c_sdf, _, _, _, _ = get_voxel(cfg, table, pool, nvp, ctx)
        blend = 0.5 * pos_sdf + 0.5 * c_sdf
        sdf.append(jnp.where(v_res > base_res, blend, v_sdf))
        p_max = jnp.maximum(p_max, vp)

    x0 = pos_dual
    span = p_max - x0
    delta = jnp.where(span > 1e-6,
                      (pos - x0) / jnp.where(span > 1e-6, span, 1.0), 0.5)
    dx, dy, dz = delta[..., 0], delta[..., 1], delta[..., 2]
    s = sdf
    dist = (s[0]
            + (s[1] - s[0]) * dx
            + (s[2] - s[0]) * dy
            + (s[4] - s[0]) * dz
            + (s[3] - s[2] - s[1] + s[0]) * dx * dy
            + (s[6] - s[4] - s[2] + s[0]) * dy * dz
            + (s[5] - s[4] - s[1] + s[0]) * dx * dz
            + (s[7] - s[6] - s[5] - s[3] + s[1] + s[4] + s[2] - s[0])
            * dx * dy * dz)
    return dist, valid


def _check_vertex_voxels(cfg, table, pf, vs, scaled_p, scaled_m, ctx=None):
    """checkVertexVoxels (marching_cubes.cu:6-69): shrink corner offsets by
    0.499 on axes whose +-half-voxel neighbor lives at another resolution."""
    def probe(offset_vec):
        p = pf + offset_vec
        nvs, _ = get_voxel_size(cfg, table, p, ctx)
        return (nvs > 0) & (nvs < 1.0) & (nvs != vs)

    zeros = jnp.zeros_like(vs)
    for axis in range(3):
        def vec(comp):
            cols = [zeros, zeros, zeros]
            cols[axis] = comp
            return jnp.stack(cols, axis=-1)
        shrink_p = probe(vec(scaled_p[..., axis]))
        shrink_m = probe(vec(scaled_m[..., axis]))
        scaled_p = scaled_p.at[..., axis].multiply(
            jnp.where(shrink_p, 0.499, 1.0))
        scaled_m = scaled_m.at[..., axis].multiply(
            jnp.where(shrink_m, 0.499, 1.0))
    return scaled_p, scaled_m


def _vertex_interp(p1, p2, d1, d2, c1, c2):
    """vertexInterp (mesh_extractor.cu:5-37), with the color blend done
    consistently in 0..255 (the reference mixes /255 scales — documented
    deviation, DESIGN.md).  Returns (pos, color)."""
    iso = 0.0
    mu = (iso - d1) / jnp.where(d2 - d1 == 0, 1.0, d2 - d1)
    use_p1 = (jnp.abs(iso - d1) < 1e-5) | (jnp.abs(d1 - d2) < 1e-5)
    use_p2 = (jnp.abs(iso - d2) < 1e-5) & ~use_p1
    mu = jnp.where(use_p1, 0.0, jnp.where(use_p2, 1.0, mu))[..., None]
    pos = p1 + mu * (p2 - p1)
    col = c1 + mu * (c2 - c1)
    return pos, col


def cell_gate(cfg: MapConfig, table: H.HashTable, pool: VoxelPool,
              bpos, bptr, bres, bvalid, ring=None):
    """Phase A: per (block, voxel) cell, does any of the 8 cube corners land
    in a weighted voxel?  Cheap filter — a cell with all-zero corner weights
    can emit no geometry (extractIsoSurfaceAtPosition rejects on weight).

    Returns (pf f32[A,512,3] cell centers, gate bool[A,512])."""
    vvs = cfg.virtual_voxel_size
    _, lane0 = _block_rows(bptr, bvalid)
    pi, lane_valid = _block_voxel_grid(bpos, bres, lane0)
    pf = X.virtual_voxel_pos_to_world(vvs, pi)
    vs = (vvs * (1 << bres).astype(jnp.float32))[:, None, None]
    ctx = None
    if ring is not None:
        A = bpos.shape[0]
        ctx = (ring, bpos, jnp.arange(A, dtype=jnp.int32)[:, None])
    gate = jnp.zeros(pf.shape[:-1], bool)
    for k in range(8):
        vp = pf + (_CORNER[k] - 0.5) * vs  # corners at pf +- vs/2
        _, w, _, _, _ = get_voxel(cfg, table, pool, vp, ctx)
        gate = gate | (w > 0)
    gate = gate & bvalid[:, None] & lane_valid
    return pf, gate


def compact_cells(pf, gate, max_cells: int, offset=None):
    """Gather surviving cell centers into a fixed [max_cells] buffer,
    starting at gated-cell rank `offset` (a traced scalar) so a host loop
    can sweep ALL gated cells batch by batch — one bounded buffer used to
    silently truncate dense chunks 30x."""
    flat_pf = pf.reshape(-1, 3)
    flat_gate = gate.reshape(-1)
    cs = jnp.cumsum(flat_gate.astype(jnp.int32))
    total = cs[-1]
    off = jnp.int32(0) if offset is None else offset.astype(jnp.int32)
    ranks = off + jnp.arange(1, max_cells + 1, dtype=jnp.int32)
    sel = jnp.searchsorted(cs, ranks, side="left").astype(jnp.int32)
    valid = ranks <= total
    sel_c = jnp.where(valid, jnp.minimum(sel, flat_gate.shape[0] - 1), 0)
    out_pf = jnp.where(valid[:, None], flat_pf[sel_c], 0.0)
    # window row of each compacted cell (cells are laid out [A, 512]):
    # lets phase B address the window's ring cache
    out_blk = jnp.where(valid, sel_c // pf.shape[1], 0)
    return out_pf, valid, total, out_blk


def extract_cells(cfg: MapConfig, table: H.HashTable, pool: VoxelPool,
                  pf, cell_valid, ctx=None):
    """Phase B: extractIsoSurfaceAtPosition (marching_cubes.cu:71-261) on the
    compacted cells.  Returns (tri_pos f32[Cc,5,3,3], tri_col f32[Cc,5,3,3],
    tri_mask bool[Cc,5]).  ctx: ring-cache context (build_ring) for the
    cells' window."""
    Cc = pf.shape[0]
    vs, _ = get_voxel_size(cfg, table, pf, ctx)
    half = 0.5 * vs
    scaled_p = half[..., None] * jnp.ones((1, 3), jnp.float32)
    scaled_m = -half[..., None] * jnp.ones((1, 3), jnp.float32)
    scaled_p, scaled_m = _check_vertex_voxels(cfg, table, pf, vs,
                                              scaled_p, scaled_m, ctx)

    # 8 corners: positions, trilinear dists (fallback to raw voxel sdf),
    # colors, validity
    dists, cols, ok = [], [], cell_valid
    ppos = []
    for k in range(8):
        sel = _CORNER[k]
        off = sel * scaled_p + (1.0 - sel) * scaled_m
        p_k = pf + off
        ppos.append(p_k)
        dist, tri_ok = trilinear_interpolation(cfg, table, pool, p_k, ctx)
        v_sdf, v_w, v_rgb, _, _ = get_voxel(cfg, table, pool, p_k, ctx)
        dist = jnp.where(tri_ok, dist, v_sdf)
        ok = ok & (tri_ok | (v_w >= cfg.min_weight_threshold))
        dists.append(dist)
        cols.append(v_rgb)

    d = jnp.stack(dists, axis=-1)                      # [Cc,8]
    cube_index = jnp.zeros((Cc,), jnp.int32)
    for k in range(8):
        cube_index = cube_index + jnp.where(d[:, k] < 0.0, 1 << k, 0)

    # SDF-consistency filters (marching_cubes.cu:181-201)
    thr = cfg.marching_cubes_threshold
    dk = d[:, :, None]
    dl = d[:, None, :]
    opposite = dk * dl < 0.0
    bad = jnp.where(opposite, jnp.abs(dk) + jnp.abs(dl) > thr,
                    jnp.abs(dk - dl) > thr)
    ok = ok & ~jnp.any(bad, axis=(1, 2)) & ~jnp.any(jnp.abs(d) > thr, axis=1)

    cls = _CELL_CLASS[cube_index]                      # [Cc]
    tri_count = _CELL_GEOM[cls] & 0x0F
    edge_codes = _VERTEX_DATA[cube_index] & 0xFF       # [Cc,12]
    c_lo = edge_codes & 0x0F
    c_hi = edge_codes >> 4

    pos8 = jnp.stack(ppos, axis=1)                     # [Cc,8,3]
    col8 = jnp.stack(cols, axis=1)                     # [Cc,8,3]

    p1 = jnp.take_along_axis(pos8, c_hi[..., None], axis=1)
    p2 = jnp.take_along_axis(pos8, c_lo[..., None], axis=1)
    c1 = jnp.take_along_axis(col8, c_hi[..., None], axis=1)
    c2 = jnp.take_along_axis(col8, c_lo[..., None], axis=1)
    d1 = jnp.take_along_axis(d, c_hi, axis=1)
    d2 = jnp.take_along_axis(d, c_lo, axis=1)
    vpos, vcol = _vertex_interp(p1, p2, d1, d2, c1, c2)  # [Cc,12,3]

    vidx = _CELL_VIDX[cls].reshape(Cc, 5, 3)           # [Cc,5,3]
    tri_pos = jnp.take_along_axis(vpos[:, None].repeat(5, 1),
                                  vidx[..., None], axis=2)
    tri_col = jnp.take_along_axis(vcol[:, None].repeat(5, 1),
                                  vidx[..., None], axis=2)
    tri_mask = (jnp.arange(5)[None, :] < tri_count[:, None]) & ok[:, None]
    return tri_pos, tri_col, tri_mask


def compact_triangles(tri_pos, tri_col, tri_mask, max_triangles: int):
    """Compacted append into the fixed triangle buffer (replaces the atomic
    appendTriangle, mesh_extractor.cu:44-55)."""
    flat_pos = tri_pos.reshape(-1, 3, 3)
    flat_col = tri_col.reshape(-1, 3, 3)
    flat_mask = tri_mask.reshape(-1)
    sel, valid, total = H.compact_indices(flat_mask, max_triangles)
    safe = jnp.where(valid, sel, 0)
    out_pos = jnp.where(valid[:, None, None], flat_pos[safe], 0.0)
    out_col = jnp.where(valid[:, None, None], flat_col[safe], 0.0)
    return out_pos, out_col, jnp.minimum(total, max_triangles)


def extract_iso_surface(cfg: MapConfig, table: H.HashTable, pool: VoxelPool,
                        bpos, bptr, bres, bvalid,
                        max_cells: int, max_triangles: int):
    """extractIsoSurface (marching_cubes.cu:287-305) over compacted blocks
    (single bounded batch — callers needing full coverage drive
    gate_cells / extract_cell_batch in a host loop)."""
    pf, gate, total, ring = gate_cells(cfg, table, pool, bpos, bptr, bres,
                                       bvalid)
    return extract_cell_batch(cfg, table, pool, pf, gate, None,
                              max_cells, max_triangles, ring=ring, bpos=bpos)


def gate_cells(cfg: MapConfig, table: H.HashTable, pool: VoxelPool,
               bpos, bptr, bres, bvalid):
    """Phase A once per block window: cell centers + gate + gated count +
    the window's 27-ring lookup cache (reused by every phase-B batch)."""
    ring = build_ring(cfg, table, bpos, bvalid)
    pf, gate = cell_gate(cfg, table, pool, bpos, bptr, bres, bvalid,
                         ring=ring)
    return pf, gate, jnp.sum(gate.astype(jnp.int32)), ring


def extract_cell_batch(cfg: MapConfig, table: H.HashTable, pool: VoxelPool,
                       pf, gate, offset, max_cells: int, max_triangles: int,
                       ring=None, bpos=None):
    """Phase B on gated cells [offset, offset+max_cells)."""
    cpf, cvalid, _, cblk = compact_cells(pf, gate, max_cells, offset)
    ctx = (ring, bpos, cblk) if ring is not None else None
    tri_pos, tri_col, tri_mask = extract_cells(cfg, table, pool, cpf, cvalid,
                                               ctx)
    return compact_triangles(tri_pos, tri_col, tri_mask, max_triangles)
