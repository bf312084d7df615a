"""Resident-window maintenance: sticky slot assignment, bounded
evict/load churn, and the flush that re-syncs the big pool.

This is the TPU-native answer to the reference's "touch the voxel block
heap in place" model (integrateDepthMapKernel writes d_SDFBlocks directly,
mrhash/src/sdf/voxel_data_structures.cu:1094-1181): a CUDA kernel can
random-access HBM per block at full bandwidth, but an XLA row scatter runs
at ~16-28 GB/s on v5e (measured, DESIGN.md), so the per-frame
pack/writeback of the compacted window dominated the frame.  Caching the
window contiguously (`state.ResidentPool`) turns the per-frame traffic
into slice reads/writes at HBM bandwidth and bills only frustum CHURN
(blocks entering residency) at scatter rates, bounded by
`cfg.resident_churn` per frame (overflow staggers to the next frame, the
same convergence semantics as every other capacity cap in this codebase).

Slot assignment is per-frame, fully inside the jitted frame program:
  1. window blocks already resident keep their slots (sticky);
  2. unclaimed slots < A (the window bucket) are vacancies;
  3. the k-th non-resident window block pairs with the k-th vacancy:
     the vacancy's previous tenant (if any) is flushed back to the big
     pool and the entrant's row is loaded into the slot.
Since A >= window count, vacancies always cover the entrants; only the
per-frame CHURN cap can stagger an entrant.  Requires the window bucket
to be non-shrinking within a GeoWrapper run (geowrapper pins a bucket
floor) so a resident slot never falls outside the kernel range.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mrhash_tpu.core.state import MapConfig, ResidentPool, VoxelPool
from mrhash_tpu.ops import hashtable as H

LANES = 512
_FIELDS = ("sdf", "sumsq", "weight", "rgbp")


def _tiered_churn(cfg: MapConfig, n_ent, E, churn_of, rp, pool):
    """Dispatch the adoption churn at a capacity fitted to the entrant
    count (same capacity-cost rule as pipeline._tiered_coarsen): the
    flush/load row traffic costs O(E) whether or not anything enters, and
    steady-state frames admit a handful of blocks (often zero).  Frames
    with no entrants skip the churn entirely; trickles ride the
    cfg.resident_churn_tier program; bursts take the full-E program.  All
    branches compile once; exactly one runs."""
    tier = min(int(cfg.resident_churn_tier), E)

    def skip(rp, pool):
        return rp, pool

    if 0 < tier < E:
        small, full = churn_of(tier), churn_of(E)

        def dispatch(rp, pool):
            return jax.lax.cond(n_ent <= tier, small, full, rp, pool)
    else:
        dispatch = churn_of(E)
    return jax.lax.cond(n_ent > 0, dispatch, skip, rp, pool)


def adopt_window(cfg: MapConfig, rp: ResidentPool, pool: VoxelPool,
                 slots, bpos, bptr, bres, bvalid):
    """Assign resident slots to the compacted window and reorder it to
    slot order.

    Returns (rp', pool', ordered) where ordered = (oslots, obpos, obptr,
    obres, ovalid) indexed BY resident slot: ordered[i] describes the block
    cached at resident row i (ovalid False for vacant slots and for
    entrants staggered past the churn cap).  obptr is the BIG-pool ptr
    (needed to free/clear big rows on GC)."""
    A = bptr.shape[0]
    E = min(int(cfg.resident_churn), A)
    R = rp.backing.shape[0]
    n_big = rp.res_index.shape[0] - 1

    wrow = jnp.where(bvalid, bptr // LANES, n_big)
    rs_old = rp.res_index[wrow]                        # -1 if absent
    is_res = bvalid & (rs_old >= 0)

    # vacancies: slots < A not claimed by a resident window block
    claimed = jnp.zeros((R,), bool).at[
        jnp.where(is_res, rs_old, R)].set(True, mode="drop")
    vac = ~claimed[:A]
    ent = bvalid & ~is_res
    n_ent = jnp.sum(ent.astype(jnp.int32))

    def churn_of(e):
        def churn(rp, pool):
            eidx, eok, _ = H.compact_indices(ent, e)   # window positions
            vidx, vok, _ = H.compact_indices(vac, e)   # resident slots
            pair = eok & vok
            epos = jnp.where(pair, eidx, 0)            # safe window index
            vslot = jnp.where(pair, vidx, 0)           # safe resident slot
            vdrop = jnp.where(pair, vidx, R)           # drop id for scatters

            # 1) evict: flush previous tenants of paired slots (if backed)
            old_back = rp.backing[vslot]               # i32[e]
            flush_to = jnp.where(pair & (old_back >= 0), old_back, n_big)
            pool = pool.replace(**{
                f: getattr(pool, f).at[flush_to].set(
                    getattr(rp.pool, f)[vslot], mode="drop",
                    unique_indices=True)
                for f in _FIELDS})

            # 2) load entrants (new blocks' big rows are zero-cleared on
            #    free, so fresh allocations load zeros — correct
            #    first-integration state)
            erow = jnp.where(pair, wrow[epos], n_big)
            rpool = rp.pool.replace(**{
                f: getattr(rp.pool, f).at[vdrop].set(
                    getattr(pool, f)[jnp.where(pair, erow, 0)],
                    mode="drop", unique_indices=True)
                for f in _FIELDS})

            # 3) maps
            backing = rp.backing.at[vdrop].set(erow, mode="drop")
            res_index = rp.res_index.at[flush_to].set(-1, mode="drop")
            res_index = res_index.at[erow].set(
                jnp.where(pair, vidx, -1), mode="drop")
            return rp.replace(pool=rpool, backing=backing,
                              res_index=res_index), pool
        return churn

    rp, pool = _tiered_churn(cfg, n_ent, E, churn_of, rp, pool)

    # final slot per window block (-1 = staggered past the churn cap),
    # read off the post-churn residency map
    rslot = jnp.where(bvalid, rp.res_index[wrow], -1)
    served = bvalid & (rslot >= 0)

    # reorder the window to resident-slot order: ONE packed [A,8] row
    # scatter instead of six element scatters — a scatter's cost rides its
    # index count, not its width (measured: the six-way form paid ~6x)
    tgt = jnp.where(served, rslot, A)
    src = jnp.stack([slots, bpos[:, 0], bpos[:, 1], bpos[:, 2],
                     bptr, bres, served.astype(jnp.int32),
                     jnp.zeros((A,), jnp.int32)], axis=1)       # [A,8]
    init = jnp.zeros((A, 8), jnp.int32).at[:, 0].set(-1)
    packed = init.at[tgt].set(src, mode="drop")
    oslots = packed[:, 0]
    obpos = packed[:, 1:4]
    obptr = packed[:, 4]
    obres = packed[:, 5]
    ovalid = packed[:, 6] > 0
    return rp, pool, (oslots, obpos, obptr, obres, ovalid)


def adopt_window_rows(cfg: MapConfig, rp: ResidentPool, pool: VoxelPool,
                      bpos, bptr, bres, bvalid):
    """Multi-res row-slot adoption: resident slots cache POOL ROWS (not
    window entries) in two kind-segregated regions — slots
    [0, cfg.resident_plain_rows) hold res-0 rows, slots
    [resident_plain_rows, A) hold carve (res-1) rows packed 8 sibling
    blocks per row — so every fused-kernel grid step stays single-kind
    (see ops/fused_integrate.py).  A row's kind can only change through a
    free (GC / coarsen / streaming), all of which release residency, so a
    sticky slot never ends up in the wrong region.

    Unlike the single-res adopt_window, the window is NOT reordered:
    entries keep window order and the per-entry maps eslot/ecarve address
    them into the slot space (multiple sibling entries share one slot).
    Rows that miss the churn cap (or overflow a region) stay non-resident:
    their entries get eslot=-1 and stagger to the next frame.

    Returns (rp', pool', meta) with meta = dict(
      ovalid[A] (slot claimed by this frame's window), rpos[A,3] (res-0
      slot block pos), gpos[A,8,3]/gvalid[A,8] (carve-group meta, rebuilt
      from the window every frame), eslot[A]/ecarve[A] per-entry maps)."""
    A = bptr.shape[0]
    A0 = int(cfg.resident_plain_rows)
    assert 0 < A0 < A and A0 % 16 == 0, (A0, A)
    E = min(int(cfg.resident_churn), A)
    R = rp.backing.shape[0]
    n_big = rp.res_index.shape[0] - 1
    arange = jnp.arange(A, dtype=jnp.int32)

    prow = jnp.where(bvalid, bptr // LANES, n_big)
    carve = jnp.where(bvalid, (bptr % LANES) // 64, 0)
    is0 = bvalid & (bres == 0)
    is1 = bvalid & (bres == 1)

    rs_old = rp.res_index[prow]                        # -1 if absent
    is_res = bvalid & (rs_old >= 0)
    claimed = jnp.zeros((R,), bool).at[
        jnp.where(is_res, rs_old, R)].set(True, mode="drop")

    # region-P entrants: non-resident res-0 entries (rows unique);
    # region-Q entrants: one leader per non-resident res-1 row
    ent0 = is0 & ~is_res
    cand1 = is1 & ~is_res
    row_first = jnp.full((n_big + 1,), A, jnp.int32).at[
        jnp.where(cand1, prow, n_big)].min(arange)
    lead1 = cand1 & (row_first[prow] == arange)

    tot0 = jnp.sum(ent0.astype(jnp.int32))
    tot1 = jnp.sum(lead1.astype(jnp.int32))

    # region demand = already-claimed slots + rows still wanting in; the
    # geowrapper ladders resident_plain_rows / the bucket from these so a
    # too-small region can never silently starve entrants forever
    p_demand = jnp.sum(claimed[:A0].astype(jnp.int32)) + tot0
    q_demand = jnp.sum(claimed[A0:A].astype(jnp.int32)) + tot1

    def churn_of(e):
        def churn(rp, pool):
            eidx0, eok0, _ = H.compact_indices(ent0, e)
            vidx0, vok0, _ = H.compact_indices(~claimed[:A0], e)
            pair0 = eok0 & vok0
            eidx1, eok1, _ = H.compact_indices(lead1, e)
            vidx1, vok1, _ = H.compact_indices(~claimed[A0:A], e)
            pair1 = eok1 & vok1

            pair = jnp.concatenate([pair0, pair1])
            epos = jnp.concatenate([jnp.where(pair0, eidx0, 0),
                                    jnp.where(pair1, eidx1, 0)])
            vslot = jnp.concatenate([jnp.where(pair0, vidx0, 0),
                                     jnp.where(pair1, vidx1 + A0, 0)])
            vdrop = jnp.where(pair, vslot, R)

            # 1) evict: flush previous tenants of paired slots (if backed)
            old_back = rp.backing[vslot]
            flush_to = jnp.where(pair & (old_back >= 0), old_back, n_big)
            pool = pool.replace(**{
                f: getattr(pool, f).at[flush_to].set(
                    getattr(rp.pool, f)[vslot], mode="drop",
                    unique_indices=True)
                for f in _FIELDS})

            # 2) load entrant rows (fresh rows are zero-cleared on free)
            erow = jnp.where(pair, prow[epos], n_big)
            rpool = rp.pool.replace(**{
                f: getattr(rp.pool, f).at[vdrop].set(
                    getattr(pool, f)[jnp.where(pair, erow, 0)],
                    mode="drop", unique_indices=True)
                for f in _FIELDS})

            # 3) maps
            backing = rp.backing.at[vdrop].set(erow, mode="drop")
            res_index = rp.res_index.at[flush_to].set(-1, mode="drop")
            res_index = res_index.at[erow].set(
                jnp.where(pair, vslot, -1), mode="drop")
            return rp.replace(pool=rpool, backing=backing,
                              res_index=res_index), pool
        return churn

    rp, pool = _tiered_churn(cfg, tot0 + tot1, E, churn_of, rp, pool)

    # per-entry slot map after adoption (-1 = staggered this frame)
    eslot = jnp.where(bvalid, rp.res_index[prow], -1)

    # per-slot meta, rebuilt from the window each frame (so carve churn —
    # coarsen allocs, GC frees, frustum exits — needs no event tracking).
    # Both reorders pack (pos, flag) into ONE [.,4] row scatter each — a
    # scatter's cost rides its index count, not its width
    tgt0 = jnp.where(is0 & (eslot >= 0), eslot, A)
    src0 = jnp.concatenate([bpos, jnp.ones((A, 1), jnp.int32)], axis=1)
    pk0 = jnp.zeros((A, 4), jnp.int32).at[tgt0].set(src0, mode="drop")
    rpos = pk0[:, :3]
    ovalid = pk0[:, 3] > 0
    gdest = jnp.where(is1 & (eslot >= 0), eslot * 8 + carve, A * 8)
    pk1 = jnp.zeros((A * 8, 4), jnp.int32).at[gdest].set(
        src0, mode="drop").reshape(A, 8, 4)
    gpos = pk1[..., :3]
    gvalid = pk1[..., 3]
    ovalid = ovalid | (jnp.sum(gvalid, axis=1) > 0)
    return rp, pool, dict(ovalid=ovalid, rpos=rpos, gpos=gpos,
                          gvalid=gvalid, eslot=eslot, ecarve=carve,
                          p_demand=p_demand, q_demand=q_demand)


def flush_release_rows(rp: ResidentPool, pool: VoxelPool, rows, mask):
    """Flush the given big-pool rows' resident copies back to the big pool
    (if backed) and drop their residency.  Used before an operation that
    mutates those rows THROUGH THE BIG POOL (coarsen realloc +
    reintegrate, GC sub-row clears): siblings sharing the row survive via
    the flush, and the row re-adopts from the updated big copy next
    frame.  `rows` i32[K] big row ids, `mask` bool[K]."""
    R = rp.backing.shape[0]
    n_big = rp.res_index.shape[0] - 1
    # NOTE: `rows` may contain duplicates (several freed carves of one
    # row) — duplicate writes carry identical row content, but do NOT
    # declare unique_indices (that would be UB)
    rs = rp.res_index[jnp.where(mask, rows, n_big)]
    backed = mask & (rs >= 0)
    slot = jnp.where(backed, rs, 0)
    pool = pool.replace(**{
        f: getattr(pool, f).at[jnp.where(backed, rows, n_big)].set(
            getattr(rp.pool, f)[slot], mode="drop")
        for f in _FIELDS})
    rp = rp.replace(
        backing=rp.backing.at[jnp.where(backed, rs, R)].set(
            -1, mode="drop"),
        res_index=rp.res_index.at[jnp.where(mask, rows, n_big)].set(
            -1, mode="drop"))
    return rp, pool


def release_rows(rp: ResidentPool, big_rows, rslots, mask):
    """Drop residency of freed blocks (GC): their resident slots become
    unbacked vacancies and their big rows forget the slot.  The resident
    row data itself needs no clearing — loads overwrite whole rows."""
    R = rp.backing.shape[0]
    n_big = rp.res_index.shape[0] - 1
    return rp.replace(
        backing=rp.backing.at[jnp.where(mask, rslots, R)].set(
            -1, mode="drop"),
        res_index=rp.res_index.at[jnp.where(mask, big_rows, n_big)].set(
            -1, mode="drop"))


@jax.jit
def flush(rp: ResidentPool, pool: VoxelPool):
    """Scatter every backed resident row back to the big pool (meshing /
    raycast / serialize read the big pool).  Residency maps stay valid —
    the big pool is merely re-synced, not mutated elsewhere."""
    n_big = pool.sdf.shape[0]
    rows = jnp.where(rp.backing >= 0, rp.backing, n_big)
    return pool.replace(**{
        f: getattr(pool, f).at[rows].set(
            getattr(rp.pool, f), mode="drop", unique_indices=True)
        for f in _FIELDS})
