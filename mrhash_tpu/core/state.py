"""Container state: hash table + flat voxel pool + frame counters.

TPU equivalent of VoxelContainer's device buffers
(mrhash/src/sdf/voxel_data_structures.cuh:253-274).  The voxel pool is SoA
over one flat axis of num_blocks * 512 voxels; a res-0 block with ptr p owns
voxels [p, p+512), a res-1 block owns [p, p+64) (same carving as the
reference's heap_low sub-block ids, voxel_data_structures.cu:859-871).

Voxel fields mirror struct Voxel (voxel_hash_utils.cuh:8-22): sdf f32,
sum_squared f32, rgb u8x3, weight u8 — weight is carried as int32 with the
255 cap applied at merge time (params.h:24), and rgb is carried bit-packed
as one int32 lane (r | g<<8 | b<<16): a u8[N,512,3] field's 3-wide minor
dimension forces relayout copies on every TPU gather/scatter (measured:
~24 ms of XLA glue around the fused kernel in round 2), while the packed
lane rides the same row DMAs as sdf/weight for free.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from mrhash_tpu import params as P
from mrhash_tpu.ops import hashtable as H


@struct.dataclass
class VoxelPool:
    """Row-structured SoA: one 512-lane row per high block.

    TPU performance note: XLA's element-wise dynamic gather/scatter runs at
    ~40M elem/s on v5e, while whole-row (slice) gathers run at HBM
    bandwidth — so the hot paths address the pool as [N, 512] rows keyed by
    block id.  ptr semantics stay flat (ptr = row*512 + lane0, with res-1
    blocks occupying 64-lane windows carved 8-per-row, matching the
    reference's heap_low carving, voxel_data_structures.cu:859-871);
    `flat_*` views (free reshapes) serve random-access paths (meshing,
    LiDAR DDA, streaming payloads)."""
    sdf: jax.Array     # f32[N,512]
    sumsq: jax.Array   # f32[N,512]
    weight: jax.Array  # i32[N,512] (u8 semantics)
    rgbp: jax.Array    # i32[N,512] packed r | g<<8 | b<<16

    @property
    def num_voxels(self) -> int:
        return self.sdf.shape[0] * self.sdf.shape[1]

    # flat (bitcast) views for element-wise access
    @property
    def flat_sdf(self):
        return self.sdf.reshape(-1)

    @property
    def flat_sumsq(self):
        return self.sumsq.reshape(-1)

    @property
    def flat_weight(self):
        return self.weight.reshape(-1)

    @property
    def flat_rgbp(self):
        return self.rgbp.reshape(-1)

    def with_flat(self, sdf=None, sumsq=None, weight=None, rgbp=None):
        """Replace fields from flat arrays (reshape back to rows)."""
        shape = self.sdf.shape
        kw = {}
        if sdf is not None:
            kw["sdf"] = sdf.reshape(shape)
        if sumsq is not None:
            kw["sumsq"] = sumsq.reshape(shape)
        if weight is not None:
            kw["weight"] = weight.reshape(shape)
        if rgbp is not None:
            kw["rgbp"] = rgbp.reshape(shape)
        return self.replace(**kw)


def pack_rgb(rgb):
    """u8/int [...,3] -> packed int32 lane."""
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    return r | (g << 8) | (b << 16)


def unpack_rgb(rgbp, dtype=jnp.uint8):
    """packed int32 lane -> [...,3] channels."""
    return jnp.stack([rgbp & 255, (rgbp >> 8) & 255, (rgbp >> 16) & 255],
                     axis=-1).astype(dtype)


def make_pool(num_blocks: int) -> VoxelPool:
    n, L = num_blocks, P.TOTAL_SDF_BLOCK_SIZE
    return VoxelPool(
        sdf=jnp.zeros((n, L), jnp.float32),
        sumsq=jnp.zeros((n, L), jnp.float32),
        weight=jnp.zeros((n, L), jnp.int32),
        rgbp=jnp.zeros((n, L), jnp.int32),
    )


@struct.dataclass
class ResidentPool:
    """Contiguous cache of the in-frustum blocks' pool rows.

    TPU rationale: XLA row scatters/gathers over the big pool run at
    ~16-28 GB/s on v5e (measured, DESIGN.md), so packing the compacted
    window via `pool.sdf[prow]` and writing it back via `.at[prow].set`
    costs ~13-24 ms/frame.  Keeping each in-frustum block's row RESIDENT at
    a sticky slot < window bucket turns both into contiguous slice
    reads/writes at HBM bandwidth (measured 17.2 -> 7.3 ms for the fused
    single-res frame at A=20480); only blocks entering/leaving the frustum
    pay bounded row copies (frame coherence keeps that churn small).

    Invariants: `backing[s]` is the big-pool row cached at slot s (-1 if
    empty); `res_index[row]` is that row's slot (-1 if absent); resident
    data is authoritative for backed rows — the big pool is stale until
    `flush` scatters it back (meshing/streaming/serialize flush first)."""
    pool: VoxelPool        # [R,512] row cache (same SoA as the big pool)
    backing: jax.Array     # i32[R]    big-pool row id per slot, -1 empty
    res_index: jax.Array   # i32[N+1]  resident slot per big row, -1 absent
                           #           (one pad row so N is a safe drop id)


def make_resident(num_big_rows: int, resident_rows: int) -> ResidentPool:
    return ResidentPool(
        pool=make_pool(resident_rows),
        backing=jnp.full((resident_rows,), -1, jnp.int32),
        res_index=jnp.full((num_big_rows + 1,), -1, jnp.int32),
    )


@struct.dataclass
class MapState:
    table: H.HashTable
    pool: VoxelPool
    frame: jax.Array  # i32[] — num_integrated_frames_
    resident: ResidentPool | None = None


def make_state(num_blocks: int, num_buckets: int | None = None,
               resident_rows: int = 0) -> MapState:
    return MapState(table=H.make_table(num_blocks, num_buckets),
                    pool=make_pool(num_blocks),
                    frame=jnp.int32(0),
                    resident=(make_resident(num_blocks, resident_rows)
                              if resident_rows > 0 else None))


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Static (trace-time) configuration.  Mirrors the GeoWrapper ctor args
    (mrhash/src/sdf/geowrapper.cpp:9-81) plus TPU capacity knobs."""
    virtual_voxel_size: float = 0.05
    voxel_extents: tuple = (1.0, 1.0, 1.0)   # metric chunk scale (streamer)
    sdf_truncation: float = 0.1
    sdf_truncation_scale: float = 0.0
    integration_weight_sample: int = 1
    integration_weight_max: int = P.INTEGRATION_WEIGHT_MAX
    max_integration_distance: float = 30.0
    n_frames_invalidate_voxels: int = 0      # 0 = garbage collection off
    sdf_var_threshold: float = 0.0           # 0 = single-resolution
    min_weight_threshold: int = 1
    # coarsen keeps the fine block's accumulated observations by
    # downsample-merging them into the coarse block (the reference deletes
    # the data and reintegrates the current frame only,
    # voxel_data_structures.cu:1929-1939 — a recall loss whenever the
    # camera has moved on; False restores reference semantics)
    coarsen_downsample: bool = True
    marching_cubes_threshold: float = 1.5
    vertices_merging_threshold: float = 0.0
    projective_sdf: bool = True

    # --- TPU capacity knobs (static shapes) --------------------------------
    num_blocks: int = 1 << 17
    num_buckets: int = 0                     # 0 -> num_blocks
    max_active_blocks: int = 1 << 16         # compacted block window
    occupied_bucket: int = 0                 # >0: two-stage compact_active —
                                             # occupancy compaction over C,
                                             # then frustum math over the
                                             # first `occupied_bucket`
                                             # occupied slots only (GeoWrapper
                                             # ladders this from total
                                             # occupancy; 0 = single stage)
    max_alloc_per_frame: int = 1 << 14       # unique new blocks per frame
    dedup_scratch_factor: int = 16           # scratch cells per alloc slot
    alloc_rounds: int = 1                    # salted dedup+insert passes
    alloc_miss_tier: int = 1 << 10           # presence-cache miss tier: when
                                             # the candidates NOT proven
                                             # present by the exact pcache
                                             # fit, insert runs at this
                                             # capacity instead of
                                             # max_alloc_per_frame (skips the
                                             # full-width probe lookup on
                                             # steady-state frames). 0 = off.
    alloc_pixel_stride: int = 2              # stagger candidates over s^2 frames
    alloc_tile: int = 0                      # >1: per-tile min/max band alloc
    dda_extra_steps: int = 3
    max_coarsen_per_frame: int = 1 << 10     # variance-merge queue (the
                                             # free/realloc/reintegrate
                                             # chain costs by THIS static
                                             # capacity whenever any block
                                             # decides, not by actual work —
                                             # coarsen+reintegrate measured
                                             # ~33 ms gross at 4096, v5e)
    starve_bands: int = 1                    # >1: split each starve event
                                             # over this many consecutive
                                             # frames, one image-row band
                                             # per frame (exact per-pixel
                                             # winner; RGB-D paths only).
                                             # The one-shot event costs two
                                             # element-granular passes over
                                             # EVERY window voxel (69 ms at
                                             # ScanNet scale = 3.7x median);
                                             # banding makes each pass
                                             # O(window/bands).
    starve_band_cap: int = 0                 # compacted band window capacity
                                             # (0 = auto ~3*A/bands; overflow
                                             # blocks skip starvation this
                                             # cycle — capacity stagger)
    coarsen_tier: int = 1 << 7               # small-tier serve capacity: when
                                             # the decide count fits, the
                                             # coarsen chain dispatches at
                                             # this capacity instead of
                                             # max_coarsen_per_frame (chain
                                             # cost is O(capacity); the
                                             # steady-state trickle is a
                                             # handful of blocks).  0 = off.
    max_gc_free_per_frame: int = 1 << 10     # GC free+clear set per frame
                                             # (same capacity-cost rule)
    gc_free_tier: int = 1 << 6               # small-tier GC free capacity:
                                             # when the decide count fits,
                                             # the free+clear chain runs at
                                             # this capacity instead of
                                             # max_gc_free_per_frame (clear
                                             # row traffic is O(capacity);
                                             # steady-state frames free a
                                             # handful).  0 = off.
    low_split_chunk: int = 1 << 10           # high blocks split per refill
    sample_patch: int = 16                   # per-block image patch side
    sample_fallback: int = 1 << 16           # out-of-patch lane budget
    points_fallback: int = 1 << 14           # LiDAR out-of-patch lane budget
                                             # (near blocks form a small
                                             # ring; 32 blocks/frame, the
                                             # rest stagger — each element
                                             # lane costs ~6x a kernel lane)
    sample_mode: str = "gather"              # gather | patch | pallas | fused
    lookup_dedup_scratch: int = 1 << 15      # cells for dedup-fronted lookup
    pallas_interpret: bool = False           # run kernels interpreted (CPU)
    resident_rows: int = 0                   # >0: resident window cache size
    resident_churn: int = 1 << 9             # blocks entering residency/frame
                                             # (adopt cost ~1 ms per 1k rows
                                             # paid even at zero churn, so keep
                                             # small; overflow staggers a frame)
    resident_churn_tier: int = 1 << 7        # small-tier churn capacity: when
                                             # the entrant count fits, the
                                             # adoption flush/load runs at
                                             # this capacity instead of
                                             # resident_churn; zero-entrant
                                             # frames skip the churn entirely
                                             # (core/resident._tiered_churn).
                                             # 0 = off.
    resident_plain_rows: int = 0             # multi-res resident: slots
                                             # [0, N) cache res-0 rows, slots
                                             # [N, A) cache carve rows (kind-
                                             # segregated kernel steps); must
                                             # be a multiple of 16; 0 =
                                             # resident multi-res disabled

    @property
    def metric_block_size(self) -> float:
        return P.SDF_BLOCK_SIZE * self.virtual_voxel_size

    def dda_steps(self, max_depth: float) -> int:
        """Static DDA trip count covering the truncation band (the reference
        bounds a while-loop by max_dda_iteration_count; our band length is
        known at trace time): ceil(band_diag / metric_block) + slack."""
        t = self.sdf_truncation + self.sdf_truncation_scale * max_depth
        band = 2.0 * t * (3.0 ** 0.5)
        return int(band / self.metric_block_size + 0.999) + self.dda_extra_steps

    def dda_voxel_steps(self, max_depth: float) -> int:
        """Voxel-level trip count for integrate3D's per-voxel walk."""
        t = self.sdf_truncation + self.sdf_truncation_scale * max_depth
        band = 2.0 * t * (3.0 ** 0.5)
        return (int(band / self.virtual_voxel_size + 0.999)
                + self.dda_extra_steps)
