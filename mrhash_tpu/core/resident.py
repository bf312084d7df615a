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
    eidx, eok, _ = H.compact_indices(ent, E)           # window positions
    vidx, vok, _ = H.compact_indices(vac, E)           # resident slots
    pair = eok & vok
    epos = jnp.where(pair, eidx, 0)                    # safe window index
    vslot = jnp.where(pair, vidx, 0)                   # safe resident slot
    vdrop = jnp.where(pair, vidx, R)                   # drop id for scatters

    # 1) evict: flush previous tenants of the paired slots (if backed)
    old_back = rp.backing[vslot]                       # i32[E]
    flush_to = jnp.where(pair & (old_back >= 0), old_back, n_big)
    pool = pool.replace(**{
        f: getattr(pool, f).at[flush_to].set(
            getattr(rp.pool, f)[vslot], mode="drop", unique_indices=True)
        for f in _FIELDS})

    # 2) load entrants (new blocks' big rows are zero-cleared on free, so
    #    fresh allocations load zeros — correct first-integration state)
    erow = jnp.where(pair, wrow[epos], n_big)
    rpool = rp.pool.replace(**{
        f: getattr(rp.pool, f).at[vdrop].set(
            getattr(pool, f)[jnp.where(pair, erow, 0)],
            mode="drop", unique_indices=True)
        for f in _FIELDS})

    # 3) maps
    backing = rp.backing.at[vdrop].set(erow, mode="drop")
    res_index = rp.res_index.at[
        jnp.where(pair & (old_back >= 0), old_back, n_big)].set(
            -1, mode="drop")
    res_index = res_index.at[erow].set(
        jnp.where(pair, vidx, -1), mode="drop")
    rp = rp.replace(pool=rpool, backing=backing, res_index=res_index)

    # final slot per window block (-1 = staggered past the churn cap)
    rslot = jnp.where(is_res, rs_old, -1)
    rslot = rslot.at[jnp.where(pair, epos, A)].set(vidx, mode="drop")
    served = bvalid & (rslot >= 0)

    # reorder the window to resident-slot order
    tgt = jnp.where(served, rslot, A)
    oslots = jnp.full((A,), -1, jnp.int32).at[tgt].set(slots, mode="drop")
    obpos = jnp.zeros((A, 3), jnp.int32).at[tgt].set(bpos, mode="drop")
    obptr = jnp.zeros((A,), jnp.int32).at[tgt].set(bptr, mode="drop")
    obres = jnp.zeros((A,), jnp.int32).at[tgt].set(bres, mode="drop")
    ovalid = jnp.zeros((A,), bool).at[tgt].set(served, mode="drop")
    return rp, pool, (oslots, obpos, obptr, obres, ovalid)


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
