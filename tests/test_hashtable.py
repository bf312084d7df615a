"""Hash table invariants, mirroring tests/test_hash_utils.cu:192-526
(HASHTABLE.AllocationDeletion, BufferInitialization, HeapSanityCheck)."""
import jax
import jax.numpy as jnp
import numpy as np

from mrhash_tpu import params as P
from mrhash_tpu.ops import hashtable as H

N_BLOCKS = 512


def make():
    return H.make_table(N_BLOCKS)


def rand_keys(n, seed=0, lo=-40, hi=40):
    rng = np.random.default_rng(seed)
    pts = rng.integers(lo, hi, size=(n, 3))
    pts = np.unique(pts, axis=0)
    return jnp.asarray(pts, jnp.int32)


def test_buffer_initialization():
    t = make()
    assert int(t.high_count) == N_BLOCKS
    assert int(t.low_count) == 0
    # heap holds each block id exactly once, descending
    assert sorted(np.asarray(t.heap_high).tolist()) == list(range(N_BLOCKS))
    assert bool((t.ptr == P.FREE_ENTRY).all())


def test_insert_lookup_roundtrip():
    t = make()
    keys = rand_keys(200)
    n = keys.shape[0]
    valid = jnp.ones((n,), bool)
    res = jnp.zeros((n,), jnp.int32)
    t, info = H.insert(t, keys, valid, res)
    assert bool(info["was_new"].all())
    assert int(t.high_count) == N_BLOCKS - n

    found, slot, ptr, fres = H.lookup(t, keys)
    assert bool(found.all())
    assert np.array_equal(np.asarray(ptr), np.asarray(info["ptr"]))
    # ptrs are distinct multiples of 512
    ptrs = np.asarray(ptr)
    assert len(set(ptrs.tolist())) == n
    assert np.all(ptrs % P.TOTAL_SDF_BLOCK_SIZE == 0)

    # unknown keys are not found
    missing = jnp.asarray([[999, 999, 999], [-999, 0, 5]], jnp.int32)
    f2, _, _, _ = H.lookup(t, missing)
    assert not bool(f2.any())


def test_insert_idempotent():
    t = make()
    keys = rand_keys(100, seed=1)
    n = keys.shape[0]
    valid = jnp.ones((n,), bool)
    res = jnp.zeros((n,), jnp.int32)
    t, info1 = H.insert(t, keys, valid, res)
    t, info2 = H.insert(t, keys, valid, res)
    assert not bool(info2["was_new"].any())
    assert int(t.high_count) == N_BLOCKS - n
    assert np.array_equal(np.asarray(info1["ptr"]), np.asarray(info2["ptr"]))


def test_allocation_deletion_conservation():
    """Allocate, free everything, assert heap + table return to pristine
    accounting (test_hash_utils.cu:192-304)."""
    t = make()
    keys = rand_keys(300, seed=2)
    n = keys.shape[0]
    t, info = H.insert(t, keys, jnp.ones((n,), bool),
                       jnp.zeros((n,), jnp.int32))
    slots, count = H.compact(t, max_active=512)
    assert int(count) == n

    t, ptrs, res, freed = H.free_slots(t, jnp.where(slots >= 0, slots, 0),
                                       slots >= 0)
    assert int(freed.sum()) == n
    assert int(t.high_count) == N_BLOCKS
    assert bool((t.ptr == P.FREE_ENTRY).all())
    # every block id is free exactly once
    assert sorted(np.asarray(t.heap_high).tolist()) == list(range(N_BLOCKS))

    f, _, _, _ = H.lookup(t, keys)
    assert not bool(f.any())


def test_heap_sanity_after_mixed_ops():
    """No duplicate positions, no pointer both free and allocated, free +
    occupied == capacity (test_hash_utils.cu:378-526)."""
    t = make()
    k1 = rand_keys(150, seed=3)
    k2 = rand_keys(150, seed=4, lo=-10, hi=10)
    for keys in (k1, k2):
        n = keys.shape[0]
        t, _ = H.insert(t, keys, jnp.ones((n,), bool),
                        jnp.zeros((n,), jnp.int32))
    # free half of what's allocated
    slots, count = H.compact(t, max_active=512)
    sel = (jnp.arange(512) % 2 == 0) & (slots >= 0)
    t, _, _, freed = H.free_slots(t, jnp.where(slots >= 0, slots, 0), sel)

    occupied = np.asarray(t.ptr) != P.FREE_ENTRY
    n_occ = occupied.sum()
    assert n_occ + int(t.high_count) == N_BLOCKS

    # occupied positions unique
    pos = np.asarray(t.pos)[occupied]
    assert len(np.unique(pos, axis=0)) == n_occ
    # occupied block ids and free block ids are disjoint
    occ_ids = set((np.asarray(t.ptr)[occupied] // 512).tolist())
    free_ids = set(np.asarray(t.heap_high)[:int(t.high_count)].tolist())
    assert not occ_ids & free_ids
    assert len(occ_ids | free_ids) == N_BLOCKS


def test_bucket_overflow_probing():
    """More same-bucket keys than a bucket holds spill into the probe window
    (the stand-in for the reference's collision linked list)."""
    t = make()
    # craft keys with identical hash by brute force
    rng = np.random.default_rng(5)
    target = None
    bucket_keys = []
    while len(bucket_keys) < P.HASH_BUCKET_SIZE + 3:
        k = rng.integers(-500, 500, size=(3,))
        h = int(H.calculate_hash(jnp.asarray(k, jnp.int32)[None],
                                 t.num_buckets)[0])
        if target is None:
            target = h
        if h == target and not any(np.array_equal(k, b) for b in bucket_keys):
            bucket_keys.append(k)
    keys = jnp.asarray(np.stack(bucket_keys), jnp.int32)
    n = keys.shape[0]
    t, info = H.insert(t, keys, jnp.ones((n,), bool),
                       jnp.zeros((n,), jnp.int32))
    assert bool(info["was_new"].all())
    f, _, _, _ = H.lookup(t, keys)
    assert bool(f.all())


def test_split_high_blocks():
    t = make()
    t = H.split_high_blocks(t, 4)
    assert int(t.high_count) == N_BLOCKS - 4
    assert int(t.low_count) == 32
    low = np.asarray(t.heap_low)[:32]
    # low ids are the 8 sub-blocks of the 4 drawn high blocks
    assert len(set(low.tolist())) == 32
    assert np.all(low < N_BLOCKS * 8)

    # insert res-1 entries drawing from the low heap
    keys = rand_keys(8, seed=6)
    n = keys.shape[0]
    t, info = H.insert(t, keys, jnp.ones((n,), bool),
                       jnp.ones((n,), jnp.int32))
    assert bool(info["was_new"].all())
    assert int(t.low_count) == 32 - n
    ptrs = np.asarray(info["ptr"])
    assert np.all(ptrs % P.TOTAL_LOW_BLOCK_SIZE == 0)
    # freeing returns them to the low heap
    f, slot, _, _ = H.lookup(t, keys)
    t, _, _, freed = H.free_slots(t, slot, f)
    assert int(freed.sum()) == n
    assert int(t.low_count) == 32


def test_insert_heap_exhaustion():
    """More inserts than blocks: extras are dropped, no corruption."""
    t = H.make_table(16)
    keys = rand_keys(200, seed=7)
    n = keys.shape[0]
    t, info = H.insert(t, keys, jnp.ones((n,), bool),
                       jnp.zeros((n,), jnp.int32))
    assert int(info["was_new"].sum()) == 16
    assert int(t.high_count) == 0
    occupied = (np.asarray(t.ptr) != P.FREE_ENTRY).sum()
    assert occupied == 16


def test_fingerprint_lookup_with_forced_collisions():
    """lookup filters probes by fingerprint; force fp collisions by
    overwriting stored fingerprints and check the exact-compare fallback
    still resolves every key to its true slot."""
    t = H.make_table(64)
    keys = jnp.asarray([[i, -2 * i, 3 * i + 1] for i in range(8)], jnp.int32)
    t, info = H.insert(t, keys, jnp.ones((8,), bool),
                       jnp.zeros((8,), jnp.int32))
    assert bool(jnp.all(info["present"]))
    # force every occupied slot to share one fingerprint value
    occ = t.ptr != H.FREE
    t = t.replace(fp=jnp.where(occ, jnp.int32(12345), 0))
    fpk = H.fingerprint(keys)
    t = t.replace(fp=t.fp.at[info["slot"]].set(fpk))
    # now shadow: give slot of key 0 the fingerprint of key 1 as well would
    # need same window; instead set ALL occupied slots to key 0's fp so the
    # first probe match is usually the wrong slot
    t2 = t.replace(fp=jnp.where(occ, fpk[0], 0))
    found, slot, ptr, res = H.lookup(t2, keys[:1])
    assert bool(found[0])
    assert int(ptr[0]) == int(info["ptr"][0])
    # keys 1..7 have fp[0] stored everywhere, their own fp matches nowhere ->
    # fp lookup misses, fallback does not resurrect them (fp mismatch means
    # "not found" is only claimed when the key genuinely has no fp match in
    # its window -- here it is a forced-corruption case, absence is fine)
    # restore correct fps and verify all keys resolve
    found, slot, ptr, res = H.lookup(t, keys)
    assert bool(jnp.all(found))
    assert np.array_equal(np.asarray(ptr), np.asarray(info["ptr"]))
