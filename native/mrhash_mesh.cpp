// Host-native Transvoxel mesh extraction over streamed chunk-grid payloads.
//
// TPU-native redesign of the reference's extractMesh protocol
// (mrhash/src/sdf/geowrapper.cpp:150-230: chunk-cube sweep with
// streamInToGPU / streamAllOut around each cube; marching cubes kernel
// marching_cubes.cu:71-305).  On this stack the map's streamed payloads
// already live in host RAM (core/streaming.ChunkGrid) and meshing is
// READ-ONLY, so shipping the payload back across the device tunnel twice
// (round-4: 49 s out + 59 s read-only insert of a 271 s Replica-scale
// extract) buys nothing — the sweep runs directly on the host copy in
// native code, exactly mirroring mrhash_tpu/ops/meshing.py's semantics
// (cell gate -> checkVertexVoxels -> trilinear w/ coarse-boundary blending
// -> Transvoxel tables -> vertexInterp).  Parity with the device sweep is
// asserted by tests/test_meshing.py::test_native_host_extract_matches_device.
//
// float32 arithmetic throughout to match the XLA programs.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "transvoxel_tables.h"  // generated from ops/transvoxel.py at build

namespace {

constexpr float kCoordEps = 1e-5f;  // params.py COORD_EPSILON
constexpr int BS = 8;               // SDF_BLOCK_SIZE

struct V3f {
  float v[3];
};

// sign-aware floor (ops/coords.py::_sign_aware_floor)
inline float saf(float x) {
  return x >= 0.0f ? std::floor(x + kCoordEps) : std::ceil(x - kCoordEps);
}

// Open-addressing block index (block key -> ordinal).  Same prime-xor hash
// family as the device spatial hash; linear probing, power-of-2 capacity.
struct BlockIndex {
  std::vector<int64_t> slot;
  std::vector<int32_t> kx, ky, kz;
  uint64_t mask = 0;

  static inline uint64_t mix(int32_t x, int32_t y, int32_t z) {
    uint64_t h = (uint64_t)(uint32_t)x * 73856093ULL ^
                 (uint64_t)(uint32_t)y * 19349669ULL ^
                 (uint64_t)(uint32_t)z * 83492791ULL;
    h ^= h >> 33;
    h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33;
    return h;
  }

  void build(const int32_t* bpos, int64_t n) {
    uint64_t cap = 64;
    while (cap < (uint64_t)(2 * n + 2)) cap <<= 1;
    mask = cap - 1;
    slot.assign(cap, -1);
    kx.assign(cap, 0);
    ky.assign(cap, 0);
    kz.assign(cap, 0);
    for (int64_t i = 0; i < n; ++i) {
      int32_t x = bpos[3 * i], y = bpos[3 * i + 1], z = bpos[3 * i + 2];
      uint64_t s = mix(x, y, z) & mask;
      for (;;) {
        if (slot[s] < 0) {
          slot[s] = i;
          kx[s] = x;
          ky[s] = y;
          kz[s] = z;
          break;
        }
        if (kx[s] == x && ky[s] == y && kz[s] == z) {
          slot[s] = i;  // duplicate key: last snapshot wins
          break;
        }
        s = (s + 1) & mask;
      }
    }
  }

  inline int64_t find(int32_t x, int32_t y, int32_t z) const {
    uint64_t s = mix(x, y, z) & mask;
    for (;;) {
      int64_t v = slot[s];
      if (v < 0) return -1;
      if (kx[s] == x && ky[s] == y && kz[s] == z) return v;
      s = (s + 1) & mask;
    }
  }
};

struct HostMap {
  const int32_t* bpos;
  const int32_t* bres;
  const float* sdf;    // [n,512]
  const int32_t* w;    // [n,512]
  const int32_t* rgb;  // [n,512] packed r|g<<8|b<<16
  int64_t n = 0;
  float vvs = 0.f;
  float mb[3] = {0, 0, 0};  // metric block extent per axis
  BlockIndex idx;
};

// ops/coords.py::world_point_to_virtual_voxel_pos
inline void w2v(const HostMap& m, const float p[3], int32_t pi[3]) {
  for (int a = 0; a < 3; ++a) {
    float q = p[a] / m.vvs;
    float sg = (q > 0.f) ? 1.f : ((q < 0.f) ? -1.f : 0.f);
    pi[a] = (int32_t)saf(q + sg * 0.5f);
  }
}

// ops/coords.py::virtual_voxel_pos_to_sdf_block
inline void v2b(const HostMap& m, const int32_t pi[3], int32_t blk[3]) {
  for (int a = 0; a < 3; ++a) {
    int32_t vp = pi[a] < 0 ? pi[a] - (BS - 1) : pi[a];
    float pw = (float)vp * m.vvs;
    blk[a] = (int32_t)saf(pw / m.mb[a]);
  }
}

struct Vox {
  float sdf;
  int32_t w;
  V3f rgb;
  int32_t res;
  bool found;
};

// Per-block 27-neighbor cache (mirrors ops/meshing.build_ring): every probe
// a cell's extraction can make lies within +-1 block of its owner, so the
// hash find collapses to offset arithmetic + one array read.  Out-of-ring
// probes (shouldn't happen; kept exact) fall back to the hash.
struct Ring {
  int64_t nb[27];
  int32_t bx, by, bz;
};

inline int64_t ring_or_find(const HostMap& m, const Ring* ring,
                            const int32_t blk[3]) {
  if (ring) {
    int dx = blk[0] - ring->bx, dy = blk[1] - ring->by, dz = blk[2] - ring->bz;
    if ((unsigned)(dx + 1) <= 2 && (unsigned)(dy + 1) <= 2 &&
        (unsigned)(dz + 1) <= 2)
      return ring->nb[(dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)];
  }
  return m.idx.find(blk[0], blk[1], blk[2]);
}

// ops/meshing.py::get_voxel (voxel_data_structures.cu:162-205)
inline Vox get_voxel(const HostMap& m, const float p[3],
                     const Ring* ring = nullptr) {
  int32_t pi[3], blk[3];
  w2v(m, p, pi);
  v2b(m, pi, blk);
  int64_t bi = ring_or_find(m, ring, blk);
  if (bi < 0) return {0.f, 0, {{0.f, 0.f, 0.f}}, 0, false};
  int32_t res = m.bres[bi];
  int32_t scale = 1 << res, side = BS >> res;
  int32_t lx = (((pi[0] % BS) + BS) % BS) / scale;
  int32_t ly = (((pi[1] % BS) + BS) % BS) / scale;
  int32_t lz = (((pi[2] % BS) + BS) % BS) / scale;
  int64_t o = bi * 512 + (int64_t)(lz * side * side + ly * side + lx);
  int32_t pk = m.rgb[o];
  return {m.sdf[o], m.w[o],
          {{(float)(pk & 255), (float)((pk >> 8) & 255),
            (float)((pk >> 16) & 255)}},
          res, true};
}

// ops/meshing.py::get_voxel_size (res 0 when unallocated — quirk kept)
inline float get_voxel_size(const HostMap& m, const float p[3],
                            int32_t* res_out = nullptr,
                            const Ring* ring = nullptr) {
  int32_t pi[3], blk[3];
  w2v(m, p, pi);
  v2b(m, pi, blk);
  int64_t bi = ring_or_find(m, ring, blk);
  int32_t res = bi >= 0 ? m.bres[bi] : 0;
  if (res_out) *res_out = res;
  return m.vvs * (float)(1 << res);
}

// corner bit order: bit0 -> +x, bit1 -> +y, bit2 -> +z (meshing._CORNER)
inline void corner(int k, float c[3]) {
  c[0] = (float)(k & 1);
  c[1] = (float)((k >> 1) & 1);
  c[2] = (float)((k >> 2) & 1);
}

// ops/meshing.py::trilinear_interpolation (cu:260-338 with the true-owner
// base_res deviation, DESIGN.md D5)
inline bool trilinear(const HostMap& m, const float pos[3], float* dist,
                      const Ring* ring = nullptr) {
  int32_t base_res;
  float vs = get_voxel_size(m, pos, &base_res, ring);
  float pd[3] = {pos[0] - 0.5f * vs, pos[1] - 0.5f * vs, pos[2] - 0.5f * vs};
  Vox pv = get_voxel(m, pd, ring);
  float s[8];
  bool valid = true;
  float pmax[3] = {pd[0], pd[1], pd[2]};
  for (int k = 0; k < 8; ++k) {
    float c[3];
    corner(k, c);
    float vp[3] = {pd[0] + c[0] * vs, pd[1] + c[1] * vs, pd[2] + c[2] * vs};
    Vox v = get_voxel(m, vp, ring);
    valid = valid && (v.w > 0);
    float nvs = vs * 2.0f;
    float nvp[3] = {pos[0] - 0.5f * nvs + c[0] * nvs,
                    pos[1] - 0.5f * nvs + c[1] * nvs,
                    pos[2] - 0.5f * nvs + c[2] * nvs};
    Vox cv = get_voxel(m, nvp, ring);
    s[k] = (v.res > base_res) ? (0.5f * pv.sdf + 0.5f * cv.sdf) : v.sdf;
    for (int a = 0; a < 3; ++a) pmax[a] = std::max(pmax[a], vp[a]);
  }
  float dl[3];
  for (int a = 0; a < 3; ++a) {
    float span = pmax[a] - pd[a];
    dl[a] = span > 1e-6f ? (pos[a] - pd[a]) / span : 0.5f;
  }
  float dx = dl[0], dy = dl[1], dz = dl[2];
  *dist = s[0] + (s[1] - s[0]) * dx + (s[2] - s[0]) * dy +
          (s[4] - s[0]) * dz + (s[3] - s[2] - s[1] + s[0]) * dx * dy +
          (s[6] - s[4] - s[2] + s[0]) * dy * dz +
          (s[5] - s[4] - s[1] + s[0]) * dx * dz +
          (s[7] - s[6] - s[5] - s[3] + s[1] + s[4] + s[2] - s[0]) * dx * dy *
              dz;
  return valid;
}

// ops/meshing.py::_check_vertex_voxels (marching_cubes.cu:6-69)
inline void check_vertex_voxels(const HostMap& m, const float pf[3], float vs,
                                float sp[3], float sm[3], const Ring* ring) {
  for (int axis = 0; axis < 3; ++axis) {
    float pp[3] = {pf[0], pf[1], pf[2]};
    pp[axis] += sp[axis];
    float nvs_p = get_voxel_size(m, pp, nullptr, ring);
    float pm[3] = {pf[0], pf[1], pf[2]};
    pm[axis] += sm[axis];
    float nvs_m = get_voxel_size(m, pm, nullptr, ring);
    if (nvs_p > 0.f && nvs_p < 1.0f && nvs_p != vs) sp[axis] *= 0.499f;
    if (nvs_m > 0.f && nvs_m < 1.0f && nvs_m != vs) sm[axis] *= 0.499f;
  }
}

struct MeshOut {
  std::vector<float> pos;  // [T,3,3]
  std::vector<float> col;  // [T,3,3] 0..255
};

// ops/meshing.py::extract_cells on one cell (marching_cubes.cu:71-261)
void extract_cell(const HostMap& m, const float pf[3], float mc_thr,
                  int32_t min_w, MeshOut& out, const Ring* ring) {
  float vs = get_voxel_size(m, pf, nullptr, ring);
  float half = 0.5f * vs;
  float sp[3] = {half, half, half};
  float sm[3] = {-half, -half, -half};
  check_vertex_voxels(m, pf, vs, sp, sm, ring);

  float d[8];
  V3f cols[8];
  float ppos[8][3];
  bool ok = true;
  for (int k = 0; k < 8; ++k) {
    float c[3];
    corner(k, c);
    for (int a = 0; a < 3; ++a)
      ppos[k][a] = pf[a] + (c[a] != 0.f ? sp[a] : sm[a]);
    float dist;
    bool tri_ok = trilinear(m, ppos[k], &dist, ring);
    Vox v = get_voxel(m, ppos[k], ring);
    d[k] = tri_ok ? dist : v.sdf;
    ok = ok && (tri_ok || v.w >= min_w);
    cols[k] = v.rgb;
  }
  if (!ok) return;

  // SDF-consistency filters (marching_cubes.cu:181-201)
  for (int k = 0; k < 8; ++k) {
    if (std::fabs(d[k]) > mc_thr) return;
    for (int l = 0; l < 8; ++l) {
      bool opp = d[k] * d[l] < 0.f;
      bool bad = opp ? (std::fabs(d[k]) + std::fabs(d[l]) > mc_thr)
                     : (std::fabs(d[k] - d[l]) > mc_thr);
      if (bad) return;
    }
  }

  int cube = 0;
  for (int k = 0; k < 8; ++k)
    if (d[k] < 0.f) cube |= 1 << k;
  int cls = TV_CELL_CLASS[cube];
  int tri_count = TV_CELL_GEOMETRY[cls] & 0x0F;
  if (!tri_count) return;

  float vpos[12][3];
  V3f vcol[12];
  for (int e = 0; e < 12; ++e) {
    int code = TV_VERTEX_DATA[cube][e] & 0xFF;
    int lo = code & 0x0F, hi = code >> 4;
    float d1 = d[hi], d2 = d[lo];
    float den = (d2 - d1) == 0.f ? 1.f : (d2 - d1);
    float mu = (0.f - d1) / den;
    bool u1 = std::fabs(0.f - d1) < 1e-5f || std::fabs(d1 - d2) < 1e-5f;
    bool u2 = std::fabs(0.f - d2) < 1e-5f && !u1;
    mu = u1 ? 0.f : (u2 ? 1.f : mu);
    for (int a = 0; a < 3; ++a) {
      vpos[e][a] = ppos[hi][a] + mu * (ppos[lo][a] - ppos[hi][a]);
      vcol[e].v[a] = cols[hi].v[a] + mu * (cols[lo].v[a] - cols[hi].v[a]);
    }
  }
  for (int t = 0; t < tri_count; ++t) {
    for (int vtx = 0; vtx < 3; ++vtx) {
      int e = TV_CELL_VERTEX_INDEX[cls][3 * t + vtx];
      for (int a = 0; a < 3; ++a) {
        out.pos.push_back(vpos[e][a]);
        out.col.push_back(vcol[e].v[a]);
      }
    }
  }
}

}  // namespace

extern "C" {

// Sweep every block's cells; returns an opaque handle, triangle count via
// out_tris.  ext: chunk voxel_extents (3).  Fields are the ChunkGrid block
// payload layout (core/streaming.unpack_transfer): res-1 blocks carry their
// 64 voxels dense at the front of the 512-lane row.
void* mrhash_mesh_extract(int64_t n, const int32_t* bpos, const int32_t* bres,
                          const float* sdf, const int32_t* w,
                          const int32_t* rgb, float vvs, const float* ext,
                          float mc_thr, int32_t min_w, int64_t* out_tris) {
  HostMap m;
  m.bpos = bpos;
  m.bres = bres;
  m.sdf = sdf;
  m.w = w;
  m.rgb = rgb;
  m.n = n;
  m.vvs = vvs;
  for (int a = 0; a < 3; ++a) m.mb[a] = ext[a] * (float)BS * vvs;
  m.idx.build(bpos, n);

  MeshOut* out = new MeshOut;
  out->pos.reserve(1 << 20);
  out->col.reserve(1 << 20);
  for (int64_t b = 0; b < n; ++b) {
    int res = bres[b];
    int side = BS >> res, scale = 1 << res;
    int32_t bx = bpos[3 * b] * BS, by = bpos[3 * b + 1] * BS,
            bz = bpos[3 * b + 2] * BS;
    float vsb = vvs * (float)scale;
    Ring ring;
    ring.bx = bpos[3 * b];
    ring.by = bpos[3 * b + 1];
    ring.bz = bpos[3 * b + 2];
    for (int dz = -1; dz <= 1; ++dz)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dx = -1; dx <= 1; ++dx)
          ring.nb[(dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)] =
              m.idx.find(ring.bx + dx, ring.by + dy, ring.bz + dz);
    for (int lz = 0; lz < side; ++lz) {
      for (int ly = 0; ly < side; ++ly) {
        for (int lx = 0; lx < side; ++lx) {
          float pf[3] = {(float)(bx + lx * scale) * vvs,
                         (float)(by + ly * scale) * vvs,
                         (float)(bz + lz * scale) * vvs};
          bool gate = false;
          for (int k = 0; k < 8 && !gate; ++k) {
            float c[3];
            corner(k, c);
            float vp[3] = {pf[0] + (c[0] - 0.5f) * vsb,
                           pf[1] + (c[1] - 0.5f) * vsb,
                           pf[2] + (c[2] - 0.5f) * vsb};
            gate = get_voxel(m, vp, &ring).w > 0;
          }
          if (gate) extract_cell(m, pf, mc_thr, min_w, *out, &ring);
        }
      }
    }
  }
  *out_tris = (int64_t)(out->pos.size() / 9);
  return out;
}

void mrhash_mesh_data(void* handle, float* tri_pos, float* tri_col) {
  MeshOut* out = (MeshOut*)handle;
  std::memcpy(tri_pos, out->pos.data(), out->pos.size() * sizeof(float));
  std::memcpy(tri_col, out->col.data(), out->col.size() * sizeof(float));
}

void mrhash_mesh_free(void* handle) { delete (MeshOut*)handle; }

}  // extern "C"
