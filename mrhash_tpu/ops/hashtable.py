"""Static-capacity spatial hash table with batched, atomic-free operations.

TPU-native replacement for the reference's GPU hash
(mrhash/src/sdf/voxel_data_structures.{cuh,cu}): buckets of HASH_BUCKET_SIZE
slots with per-bucket spinlocks and cross-bucket linked lists become a flat
SoA table probed with a fixed, fully-vectorized probe sequence of
NUM_PROBES slots (bucket slots + deterministic linear overflow).  Because
lookups always scan the whole probe window (no early exit in SIMD), deletion
needs no tombstones or linked-list surgery, and insertion is a deterministic
batched algorithm (bucket-rank free-slot claims + one conflict election,
prefix-sum heap draws) instead of the reference's atomicExch retry loops
(voxel_data_structures.cu:501-755, 901-921).

Table arrays (a HashTable pytree):
  pos:  int32[C,3]  block coordinates of the slot's entry
  ptr:  int32[C]    base voxel index into the flat pool, FREE_ENTRY if free
  res:  int32[C]    block resolution: 0 = 8^3 fine, 1 = 4^3 coarse
  heap_high: int32[N]  free-list of res-0 block ids;  free count = high_count
  heap_low:  int32[8N] free-list of res-1 block ids;  free count = low_count

ptr semantics match the reference (entry.ptr = block_id * block_volume into
one flat voxel pool; res-1 blocks are carved 8-per-high-block so low block id
l occupies voxels [l*64, l*64+64) — voxel_data_structures.cu:859-871).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mrhash_tpu import params as P

FREE = P.FREE_ENTRY


PC_EMPTY = 0x7FFFFFFF  # presence-cache empty sentinel (never a block coord)
PC_FACTOR = 8          # presence-cache cells per bucket: evicted-key misses
#                        (~n^2/2Pc at occupancy n) must fit the caller's
#                        alloc_miss_tier with headroom, or alloc falls back
#                        to the full-width insert every frame


@struct.dataclass
class HashTable:
    pos: jax.Array        # int32[C,3]
    ptr: jax.Array        # int32[C]
    res: jax.Array        # int32[C]
    fp: jax.Array         # int32[C] key fingerprint, 0 = free slot
    pck: jax.Array        # int32[Pc,3] presence cache: direct-mapped EXACT
    #                       key copies (PC_EMPTY sentinel in x when empty).
    #                       A cache hit proves presence with ONE 3-wide row
    #                       gather instead of the NUM_PROBES-gather probe
    #                       scan; misses (cell evicted by a colliding key,
    #                       or genuinely absent) fall back to lookup().
    heap_high: jax.Array  # int32[N]
    heap_low: jax.Array   # int32[8N]
    high_count: jax.Array  # int32[] number of free high blocks
    low_count: jax.Array   # int32[] number of free low blocks
    num_buckets: int = struct.field(pytree_node=False, default=0)
    num_blocks: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.num_buckets * P.HASH_BUCKET_SIZE


def make_table(num_blocks: int, num_buckets: int | None = None) -> HashTable:
    """Mirror of VoxelContainer buffer init (voxel_data_structures.cpp:57-87):
    heap_high holds ids N-1..0 (descending), heap_low starts empty/invalid."""
    if num_buckets is None:
        num_buckets = num_blocks
    C = num_buckets * P.HASH_BUCKET_SIZE
    n_low = num_blocks * P.OCTREE_BRANCHING_FACTOR
    return HashTable(
        pos=jnp.zeros((C, 3), jnp.int32),
        ptr=jnp.full((C,), FREE, jnp.int32),
        res=jnp.zeros((C,), jnp.int32),
        fp=jnp.zeros((C,), jnp.int32),
        # presence cache sized by BLOCK capacity, not bucket count: compact
        # bucket configs (buckets << blocks) hold up to num_blocks keys,
        # and a cache of 8*buckets cells at ~n keys suffers ~n^2/2Pc
        # evictions — 22k at Replica-x2 (107k keys in 262k cells), far past
        # any alloc_miss_tier, silently disabling the fast alloc path every
        # frame.  8*num_blocks cells keeps evictions O(n/16).
        pck=jnp.full((PC_FACTOR * max(num_buckets, num_blocks), 3),
                     PC_EMPTY, jnp.int32),
        heap_high=jnp.arange(num_blocks - 1, -1, -1, dtype=jnp.int32),
        heap_low=jnp.full((n_low,), n_low, jnp.int32),
        high_count=jnp.int32(num_blocks),
        low_count=jnp.int32(0),
        num_buckets=int(num_buckets),
        num_blocks=int(num_blocks),
    )


def _avalanche(h):
    """murmur3 finalizer: full-avalanche uint32 mix (any affine salt would
    preserve low-bit collision structure mod a power-of-two size)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def fingerprint(block_pos):
    """32-bit key fingerprint for probe filtering; 0 is reserved for free
    slots.  Independent mixing chain from calculate_hash so a bucket
    collision carries no fingerprint-collision correlation."""
    x = block_pos[..., 0].astype(jnp.uint32)
    y = block_pos[..., 1].astype(jnp.uint32)
    z = block_pos[..., 2].astype(jnp.uint32)
    h = _avalanche(x * jnp.uint32(0x9E3779B1))
    h = _avalanche(h ^ (y * jnp.uint32(0x7FEB352D)))
    h = _avalanche(h ^ (z * jnp.uint32(0x846CA68B)))
    return jnp.where(h == 0, 1, h).astype(jnp.int32)


def calculate_hash(block_pos, num_buckets):
    """voxel_data_structures.cu:150-160 — xor of prime-multiplied coords.

    uint32 wrap-around multiplication, then mod bucket count."""
    x = block_pos[..., 0].astype(jnp.uint32)
    y = block_pos[..., 1].astype(jnp.uint32)
    z = block_pos[..., 2].astype(jnp.uint32)
    h = (x * jnp.uint32(P.P0)) ^ (y * jnp.uint32(P.P1)) ^ (z * jnp.uint32(P.P2))
    return (h % jnp.uint32(num_buckets)).astype(jnp.int32)


def probe_slots(bucket, capacity):
    """The NUM_PROBES-slot probe window of a bucket: its HASH_BUCKET_SIZE
    primary slots followed by LINKED_LIST_SIZE linear-overflow slots (the
    deterministic stand-in for the reference's collision linked list)."""
    base = bucket.astype(jnp.int32) * P.HASH_BUCKET_SIZE
    offs = jnp.arange(P.NUM_PROBES, dtype=jnp.int32)
    return (base[..., None] + offs) % capacity


_FALLBACK_K = 64  # exact-compare budget for fingerprint-collision suspects


def lookup(table: HashTable, keys, valid=None, with_uncertain=False):
    """Vectorized getHashEntry (voxel_data_structures.cu:79-127).

    keys: int32[M,3].  Returns (found[M] bool, slot[M], ptr[M], res[M]);
    slot/ptr/res are meaningful only where found.

    Probe filtering runs on a 32-bit key FINGERPRINT (one element gather per
    probe slot instead of four: pos x/y/z + ptr — element gathers are the
    cost of lookup on TPU, ~115M/s on v5e), then the selected slot is
    verified exactly.  A fingerprint collision ahead of the true slot in the
    probe window makes the verify fail; those suspects (expected ~1e-5 per
    8k-key batch) are re-resolved with the full-window exact compare, capped
    at _FALLBACK_K per call.  With with_uncertain=True also returns a mask
    of suspects beyond that cap (resolution unknown — callers that insert
    must treat them as present to preserve the no-duplicate-keys invariant).
    """
    C = table.capacity
    M = keys.shape[0]
    bucket = calculate_hash(keys, table.num_buckets)
    slots = probe_slots(bucket, C)                        # [M, NP]
    fpk = fingerprint(keys)                               # [M]
    match = table.fp[slots] == fpk[..., None]             # [M, NP]
    found = jnp.any(match, axis=-1)
    if valid is not None:
        found = found & valid
    first = jnp.argmax(match, axis=-1)
    slot = jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0]
    sel_pos = table.pos[jnp.where(found, slot, 0)]        # [M, 3]
    exact = found & jnp.all(sel_pos == keys, axis=-1)

    # exact fallback for fingerprint-collision suspects
    suspects = found & ~exact
    sidx, svalid, total = compact_indices(suspects, _FALLBACK_K)
    sidx_c = jnp.where(svalid, sidx, 0)
    s_slots = slots[sidx_c]                               # [K, NP]
    s_match = ((table.ptr[s_slots] != FREE)
               & jnp.all(table.pos[s_slots] == keys[sidx_c][:, None, :],
                         axis=-1))
    s_found = jnp.any(s_match, axis=-1) & svalid
    s_first = jnp.argmax(s_match, axis=-1)
    s_slot = jnp.take_along_axis(s_slots, s_first[..., None], axis=-1)[..., 0]
    dst = jnp.where(svalid, sidx, M)
    exact = exact.at[dst].set(s_found, mode="drop")
    slot = slot.at[dst].set(s_slot, mode="drop")

    found = exact
    ptr = jnp.where(found, table.ptr[jnp.where(found, slot, 0)], FREE)
    res = jnp.where(found, table.res[jnp.where(found, slot, 0)], 0)
    slot = jnp.where(found, slot, -1)
    if with_uncertain:
        # suspects beyond the fallback cap stayed unresolved
        rank = jnp.cumsum(suspects.astype(jnp.int32)) - 1
        uncertain = suspects & (rank >= _FALLBACK_K)
        return found, slot, ptr, res, uncertain
    return found, slot, ptr, res


def _pc_cell(table: HashTable, block_pos):
    """Presence-cache cell of a key: one more avalanche over the fingerprint
    with a distinct constant (decorrelated from both the bucket hash and the
    fp filter)."""
    h = _avalanche(fingerprint(block_pos).astype(jnp.uint32)
                   ^ jnp.uint32(0x27220A95))
    return (h % jnp.uint32(table.pck.shape[0])).astype(jnp.int32)


def pcache_probe(table: HashTable, keys, valid):
    """EXACT presence test against the direct-mapped cache: True means the
    key is certainly in the table (the cell stores full key copies, written
    by insert and cleared by free, so a hit cannot be stale); False means
    unknown — absent, or present but evicted from its cell by a colliding
    key (expected ~n^2/2Pc keys at occupancy n) — resolve via lookup()."""
    cell = _pc_cell(table, keys)
    return valid & jnp.all(table.pck[cell] == keys, axis=-1)


def rebuild_pcache(table: HashTable) -> HashTable:
    """Repopulate the presence cache from the table's occupied entries (for
    snapshots serialized without it).  Any state where every stored cell
    holds a live key is valid — hits prove presence, evicted keys just miss."""
    occ = table.ptr != FREE
    cell = _pc_cell(table, table.pos)
    pck = jnp.full_like(table.pck, PC_EMPTY).at[
        jnp.where(occ, cell, table.pck.shape[0])].set(table.pos, mode="drop")
    return table.replace(pck=pck)


def fingerprint2(block_pos):
    """Secondary fingerprint (independent mixing chain) for the dedup-lookup
    verification: combined with the cell match it gives ~46+ bits of key
    discrimination without gathering the 96-bit key."""
    x = block_pos[..., 0].astype(jnp.uint32)
    y = block_pos[..., 1].astype(jnp.uint32)
    z = block_pos[..., 2].astype(jnp.uint32)
    h = _avalanche(z * jnp.uint32(0xB5297A4D))
    h = _avalanche(h ^ (x * jnp.uint32(0x68E31DA4)))
    h = _avalanche(h ^ (y * jnp.uint32(0x1B56C4E9)))
    return h.astype(jnp.int32)


def lookup_dedup(table: HashTable, keys, valid, scratch_size: int,
                 frame_salt=None, slot_map=None):
    """lookup() with a dedup front-end for highly-duplicated key batches
    (the per-voxel LiDAR walk visits ~N*K keys but only ~occupied-blocks
    DISTINCT ones; probing every duplicate costs NUM_PROBES element gathers
    per key — 95 ms of the round-2 LiDAR frame).

    Elect one representative per scratch cell (salted scatter, like
    dedup_candidates), probe-lookup only the <= scratch_size
    representatives, then map results back with TWO element gathers per key
    (packed result + a secondary-fingerprint verify).  Distinct keys
    colliding in a cell resolve as not-found for the loser and rotate with
    the frame salt — the usual staggered-drop semantics.

    Without slot_map returns (found[M], ptr[M], res[M]).  With slot_map
    (int32[capacity+1], hash slot -> caller index, -1 absent) the packed
    lane carries (slot_map[slot], carve, res) instead of ptr and the
    return is (found[M], wslot[M], lane0[M], res[M]) — saving the callers
    that accumulate into a compacted window a full M-sized ptr->slot
    gather."""
    M = keys.shape[0]
    fpk = fingerprint(keys).astype(jnp.uint32)
    salt = (jnp.uint32(0) if frame_salt is None
            else frame_salt.astype(jnp.uint32))
    cell = (_avalanche(fpk + salt * jnp.uint32(2654435761))
            % jnp.uint32(scratch_size)).astype(jnp.int32)

    scr = jnp.full((scratch_size,), -1, jnp.int32).at[
        jnp.where(valid, cell, scratch_size)].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop")
    rvalid = scr >= 0
    ridx = jnp.where(rvalid, scr, 0)
    rkeys = keys[ridx]
    f, s, p, r = lookup(table, rkeys, rvalid)
    if slot_map is None:
        # pack (ptr, res, found): ptr < num_blocks*512 < 2^29
        pack = jnp.where(f, (p << 2) | (r << 1) | 1, 0)
    else:
        w = slot_map[jnp.where(f, s, slot_map.shape[0] - 1)]
        carve = (p % jnp.int32(512)) // jnp.int32(64)
        f = f & (w >= 0)
        pack = jnp.where(f, (w << 5) | (carve << 2) | (r << 1) | 1, 0)
    rfp2 = jnp.where(rvalid, fingerprint2(rkeys), 0)

    my_pack = pack[cell]
    ok = valid & ((my_pack & 1) == 1) & (rfp2[cell] == fingerprint2(keys))
    res = jnp.where(ok, (my_pack >> 1) & 1, 0)
    if slot_map is None:
        ptr = jnp.where(ok, my_pack >> 2, FREE)
        return ok, ptr, res
    wslot = jnp.where(ok, my_pack >> 5, 0)
    lane0 = jnp.where(ok, ((my_pack >> 2) & 7) * 64, 0)
    return ok, wslot, lane0, res


def _heap_draw(heap, count, want_mask):
    """Draw one free id per True in want_mask (prefix-sum ranked).

    Returns (ids[M], got[M], heap_count'). ids valid only where got."""
    rank = jnp.cumsum(want_mask.astype(jnp.int32)) - 1          # [M]
    got = want_mask & (rank < count)
    idx = jnp.clip(count - 1 - rank, 0, heap.shape[0] - 1)
    ids = jnp.where(got, heap[idx], -1)
    taken = jnp.sum(got.astype(jnp.int32))
    return ids, got, count - taken


def _heap_push(heap, count, ids, mask):
    """Return freed ids to a heap (prefix-sum ranked scatter)."""
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, count + rank, heap.shape[0])  # OOB => dropped
    heap = heap.at[dest].set(ids, mode="drop")
    return heap, count + jnp.sum(mask.astype(jnp.int32))


def insert(table: HashTable, keys, valid, res):
    """Batched allocBlock (voxel_data_structures.cu:501-755), atomic-free.

    keys:[U,3] int32, valid:[U] bool, res:[U] int32 (0 or 1).  Keys must be
    deduplicated by the caller (see integrate.dedup_candidates).  For each
    valid key not already in the table: claim a free slot in its probe window
    (same-bucket claims made disjoint by rank; overlap conflicts elected) and
    draw a block from the matching heap.  Keys whose probe window is full or
    whose heap is dry are dropped, exactly like the reference's staggered
    "fast version" allocator (voxel_data_structures.cu:876, 566-569).

    Returns (table', info) with info slots/ptrs for all keys (existing or
    newly inserted), and was_new mask.
    """
    U = keys.shape[0]
    C = table.capacity
    found, slotF, ptrF, resF, uncertain = lookup(table, keys, valid,
                                                 with_uncertain=True)
    # unresolved fingerprint suspects must not insert (possible duplicate);
    # they drop to a later frame like any other staggered miss
    pending0 = valid & ~found & ~uncertain

    def do_insert(table):
        bucket = calculate_hash(keys, table.num_buckets)
        slots_all = probe_slots(bucket, C)  # [U, NP]
        arange_u = jnp.arange(U, dtype=jnp.int32)

        # single-pass claim (no sequential probe rounds): rank each pending
        # key among its same-bucket peers (sort by bucket + segmented index),
        # then claim the (rank+1)-th FREE slot of its probe window — distinct
        # ranks make same-bucket claims disjoint by construction.  Windows of
        # ADJACENT buckets overlap on the linear-overflow slots, so one
        # scatter-argmax election drops cross-bucket losers (they stagger to
        # the next frame, like the reference's bucket-lock misses,
        # voxel_data_structures.cu:876).
        bkey = jnp.where(pending0, bucket, C)
        order = jnp.argsort(bkey)
        sb = bkey[order]
        newseg = jnp.concatenate([jnp.ones((1,), bool), sb[1:] != sb[:-1]])
        idx = jnp.arange(U, dtype=jnp.int32)
        seg_start = jax.lax.cummax(jnp.where(newseg, idx, 0))
        rank = jnp.zeros((U,), jnp.int32).at[order].set(idx - seg_start)

        free = table.fp[slots_all] == 0                        # [U, NP]
        cumfree = jnp.cumsum(free.astype(jnp.int32), axis=-1)
        want_pos = rank + 1
        has = pending0 & (cumfree[:, -1] >= want_pos)
        sel = jnp.argmax(cumfree == want_pos[:, None], axis=-1)
        slot_p = jnp.take_along_axis(slots_all, sel[..., None],
                                     axis=-1)[..., 0]          # [U]
        prop = jnp.full((C,), -1, jnp.int32).at[
            jnp.where(has, slot_p, C)].max(arange_u, mode="drop")
        winner = has & (prop[slot_p] == arange_u)
        assigned_slot = jnp.where(winner, slot_p, -1)
        got_slot = winner

        # heap draws per resolution
        want_high = got_slot & (res == 0)
        want_low = got_slot & (res == 1)
        ids_h, got_h, high_count = _heap_draw(
            table.heap_high, table.high_count, want_high)
        ids_l, got_l, low_count = _heap_draw(
            table.heap_low, table.low_count, want_low)
        new = got_h | got_l
        new_ptr = jnp.where(got_h, ids_h * P.TOTAL_SDF_BLOCK_SIZE,
                            ids_l * P.TOTAL_LOW_BLOCK_SIZE)

        # write entries for successful inserts only
        dest = jnp.where(new, assigned_slot, C)
        # presence cache: last writer wins among colliding cells (evicted
        # keys just lose their fast-path hit, pcache_probe falls back)
        pdest = jnp.where(new, _pc_cell(table, keys), table.pck.shape[0])
        table = table.replace(
            pos=table.pos.at[dest].set(keys, mode="drop"),
            ptr=table.ptr.at[dest].set(new_ptr, mode="drop"),
            res=table.res.at[dest].set(res, mode="drop"),
            fp=table.fp.at[dest].set(fingerprint(keys), mode="drop"),
            pck=table.pck.at[pdest].set(keys, mode="drop"),
            high_count=high_count, low_count=low_count)
        return table, assigned_slot, new_ptr, new

    def skip_insert(table):
        return (table, jnp.full((U,), -1, jnp.int32),
                jnp.full((U,), FREE, jnp.int32), jnp.zeros((U,), bool))

    # steady-state frames allocate nothing: skip the probe loop + heap draws
    table, assigned_slot, new_ptr, new = jax.lax.cond(
        jnp.any(pending0), do_insert, skip_insert, table)

    out_slot = jnp.where(found, slotF, jnp.where(new, assigned_slot, -1))
    out_ptr = jnp.where(found, ptrF, jnp.where(new, new_ptr, FREE))
    out_res = jnp.where(found, resF, res)

    info = dict(slot=out_slot, ptr=out_ptr, res=out_res, was_new=new,
                present=found | new)
    return table, info


def free_slots(table: HashTable, slots, mask):
    """Batched deleteHashEntryElement + heap return
    (voxel_data_structures.cu:1726-1824): clear entries at `slots` (where
    mask) and push their block ids back on the matching heap.  No list
    repair is needed — lookups scan the full probe window.

    Returns (table', ptrs, res, mask) so the caller can zero the voxel pool.
    """
    C = table.capacity
    slots_c = jnp.where(mask, slots, 0)
    ptrs = table.ptr[slots_c]
    res = table.res[slots_c]
    mask = mask & (ptrs != FREE)

    is_high = mask & (res == 0)
    is_low = mask & (res == 1)
    hh, hc = _heap_push(table.heap_high, table.high_count,
                        ptrs // P.TOTAL_SDF_BLOCK_SIZE, is_high)
    hl, lc = _heap_push(table.heap_low, table.low_count,
                        ptrs // P.TOTAL_LOW_BLOCK_SIZE, is_low)

    # presence cache: clear a cell only if it still holds the freed key
    # (it may hold a colliding live key instead — leave that one alone)
    pos_f = table.pos[slots_c]
    cell = _pc_cell(table, pos_f)
    owns = mask & jnp.all(table.pck[cell] == pos_f, axis=-1)
    pck = table.pck.at[jnp.where(owns, cell, table.pck.shape[0])].set(
        PC_EMPTY, mode="drop")

    dest = jnp.where(mask, slots, C)
    ptr_arr = table.ptr.at[dest].set(FREE, mode="drop")
    pos_arr = table.pos.at[dest].set(0, mode="drop")
    res_arr = table.res.at[dest].set(0, mode="drop")
    fp_arr = table.fp.at[dest].set(0, mode="drop")
    table = table.replace(pos=pos_arr, ptr=ptr_arr, res=res_arr, fp=fp_arr,
                          pck=pck, heap_high=hh, heap_low=hl,
                          high_count=hc, low_count=lc)
    return table, ptrs, res, mask


def split_high_blocks(table: HashTable, n_split: int, enable=None):
    """allocateMemoryLow (voxel_data_structures.cu:859-871): pop n_split
    res-0 blocks from the high heap and push their 8 sub-block ids each onto
    the low heap.  n_split is static; `enable` (traced bool) gates the whole
    refill (used as "refill only when the low heap is short")."""
    want = jnp.arange(n_split) < jnp.minimum(n_split, table.high_count)
    if enable is not None:
        want = want & enable
    ids, got, high_count = _heap_draw(table.heap_high, table.high_count, want)
    sub = (ids[:, None] * P.OCTREE_BRANCHING_FACTOR
           + jnp.arange(P.OCTREE_BRANCHING_FACTOR, dtype=jnp.int32)).reshape(-1)
    sub_mask = jnp.repeat(got, P.OCTREE_BRANCHING_FACTOR)
    hl, lc = _heap_push(table.heap_low, table.low_count, sub, sub_mask)
    return table.replace(heap_high=table.heap_high, high_count=high_count,
                         heap_low=hl, low_count=lc)


def compact_indices(mask, k: int):
    """Positions of the first k set bits of `mask`.

    Two formulations, picked by the k/C ratio (both pay the TPU per-element
    tax, ~6 ms per 1M indexed elements):
    - small k: cumsum + searchsorted — k*log2(C) binary-search gathers;
    - large k (k*log2(C) > C): cumsum + ONE dropped scatter of C sources
      (rank >= k and unset lanes land out of bounds and drop).  At the
      compacted-window scale (k ~ 45k over C ~ 1.3M) the searchsorted form
      measured ~6 ms where the scatter form is ~2 ms.

    Returns (idx[k] int32 (=len(mask) padding), valid[k], total_count)."""
    C = int(mask.shape[0])
    cs = jnp.cumsum(mask.astype(jnp.int32))
    total = cs[-1]
    valid = jnp.arange(k) < jnp.minimum(total, k)
    if k * max(C.bit_length() - 1, 1) > C:
        dest = jnp.where(mask, cs - 1, k)
        idx = jnp.full((k,), C, jnp.int32).at[dest].set(
            jnp.arange(C, dtype=jnp.int32), mode="drop")
    else:
        idx = jnp.searchsorted(cs, jnp.arange(1, k + 1, dtype=jnp.int32),
                               side="left").astype(jnp.int32)
        idx = jnp.where(valid, idx, C)
    return idx, valid, total


def compact(table: HashTable, extra_mask=None, max_active: int = 0):
    """flatAndReduceHashTable (voxel_data_structures.cu:405-499): gather the
    table slots of occupied (optionally frustum-filtered) entries into a
    fixed [max_active] index buffer + count.

    Returns (slots[max_active] int32 (=-1 padding), count int32)."""
    mask = table.ptr != FREE
    if extra_mask is not None:
        mask = mask & extra_mask
    idx, valid, total = compact_indices(mask, max_active)
    slots = jnp.where(valid, idx, -1)
    count = jnp.minimum(total, max_active)
    return slots, count
