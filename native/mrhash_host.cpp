// Native host runtime for mrhash-tpu.
//
// The reference implements its host-side runtime in C++ (mesh dedup/merge:
// mrhash/src/sdf/mesh_extractor.cpp:100-259; PLY output:
// geowrapper.cpp:194-229; MADtree normal estimation with std::async
// parallel subtree builds: surface_normal_estimator/mad_tree.cpp).  This
// library provides the same host-native services behind a plain C ABI
// consumed via ctypes (no pybind dependency).
//
// Build: see native/build.py (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <future>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

struct Key3 {
  int64_t x, y, z;
  bool operator==(const Key3& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};

struct Key3Hash {
  size_t operator()(const Key3& k) const {
    // same prime-xor family as the device spatial hash
    uint64_t h = (uint64_t)k.x * 73856093ULL;
    h ^= (uint64_t)k.y * 19349669ULL;
    h ^= (uint64_t)k.z * 83492791ULL;
    h ^= h >> 33;
    h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33;
    return (size_t)h;
  }
};

inline Key3 quantize(const double* v, double inv_eps) {
  return Key3{(int64_t)std::floor(v[0] * inv_eps),
              (int64_t)std::floor(v[1] * inv_eps),
              (int64_t)std::floor(v[2] * inv_eps)};
}

inline Key3 bits(const double* v) {
  Key3 k;
  std::memcpy(&k.x, &v[0], 8);
  std::memcpy(&k.y, &v[1], 8);
  std::memcpy(&k.z, &v[2], 8);
  return k;
}

}  // namespace

extern "C" {

// Duplicate-vertex removal (exact when eps == 0, epsilon-quantized grid
// otherwise).  remap[i] = new index of vertex i (first-occurrence order).
// Returns the number of unique vertices.
int64_t mrhash_dedup_vertices(const double* verts, int64_t n, double eps,
                              int64_t* remap) {
  std::unordered_map<Key3, int64_t, Key3Hash> map;
  map.reserve((size_t)n);
  int64_t unique = 0;
  const double inv_eps = eps > 0 ? 1.0 / eps : 0.0;
  for (int64_t i = 0; i < n; ++i) {
    Key3 k = eps > 0 ? quantize(verts + 3 * i, inv_eps) : bits(verts + 3 * i);
    auto it = map.find(k);
    if (it == map.end()) {
      map.emplace(k, unique);
      remap[i] = unique++;
    } else {
      remap[i] = it->second;
    }
  }
  return unique;
}

// Duplicate-face removal (exact ordered triples, first occurrence kept).
// keep[i] = 1 if face i survives.  Returns the number kept.
int64_t mrhash_dedup_faces(const int64_t* faces, int64_t n,
                           uint8_t* keep) {
  std::unordered_map<Key3, int64_t, Key3Hash> seen;
  seen.reserve((size_t)n);
  int64_t kept = 0;
  for (int64_t i = 0; i < n; ++i) {
    Key3 k{faces[3 * i], faces[3 * i + 1], faces[3 * i + 2]};
    if (k.x == k.y || k.x == k.z || k.y == k.z) {  // degenerate
      keep[i] = 0;
      continue;
    }
    auto it = seen.find(k);
    if (it == seen.end()) {
      seen.emplace(k, i);
      keep[i] = 1;
      ++kept;
    } else {
      keep[i] = 0;
    }
  }
  return kept;
}

// ASCII mesh PLY with uchar vertex colors (GeoWrapper::extractMesh layout).
int mrhash_write_mesh_ply(const char* path, const double* v, int64_t nv,
                          const uint8_t* c, const int64_t* f, int64_t nf) {
  FILE* fp = std::fopen(path, "w");
  if (!fp) return -1;
  std::fprintf(fp,
               "ply\nformat ascii 1.0\nelement vertex %lld\n"
               "property float x\nproperty float y\nproperty float z\n"
               "property uchar red\nproperty uchar green\nproperty uchar "
               "blue\nelement face %lld\n"
               "property list uchar int vertex_indices\nend_header\n",
               (long long)nv, (long long)nf);
  for (int64_t i = 0; i < nv; ++i) {
    std::fprintf(fp, "%g %g %g %u %u %u\n", v[3 * i], v[3 * i + 1],
                 v[3 * i + 2], c[3 * i], c[3 * i + 1], c[3 * i + 2]);
  }
  for (int64_t i = 0; i < nf; ++i) {
    std::fprintf(fp, "3 %lld %lld %lld\n", (long long)f[3 * i],
                 (long long)f[3 * i + 1], (long long)f[3 * i + 2]);
  }
  std::fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// MADtree surface-normal estimation (mad_tree.cpp re-derivation: median
// split along the largest covariance eigenvector, leaf when the spread
// along it drops below b_max; leaf normal = smallest eigenvector; LiDAR
// beam-divergence weight simulation).  Normals are written in the ORIGINAL
// point order (the reference scrambles correspondence — DESIGN.md D7).
// ---------------------------------------------------------------------------

namespace {

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  double norm() const { return std::sqrt(dot(*this)); }
};

// Eigen-decomposition of a symmetric 3x3 via Jacobi rotations.
// evals ascending; evecs columns match.
void eigh3(double a[3][3], double evals[3], double evecs[3][3]) {
  double v[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 24; ++sweep) {
    double off = std::abs(a[0][1]) + std::abs(a[0][2]) + std::abs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p) {
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1));
        double cth = 1.0 / std::sqrt(t * t + 1), s = t * cth;
        for (int k = 0; k < 3; ++k) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = cth * akp - s * akq;
          a[k][q] = s * akp + cth * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = cth * apk - s * aqk;
          a[q][k] = s * apk + cth * aqk;
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = cth * vkp - s * vkq;
          v[k][q] = s * vkp + cth * vkq;
        }
      }
    }
  }
  int order[3] = {0, 1, 2};
  double d[3] = {a[0][0], a[1][1], a[2][2]};
  std::sort(order, order + 3, [&](int i, int j) { return d[i] < d[j]; });
  for (int c = 0; c < 3; ++c) {
    evals[c] = d[order[c]];
    for (int r = 0; r < 3; ++r) evecs[r][c] = v[r][order[c]];
  }
}

struct TreeCtx {
  const double* pts;       // [n,3]
  std::vector<int64_t> idx;  // permutation, partitioned in place
  float* normals;          // [n,3] out, original order
  float* weights;          // [n] out
  double b_max, b_min;
};

struct NodeStats {
  Vec3 mean;
  double evecs[3][3];
  int64_t count;
};

double leafWeight(const Vec3& mean, const Vec3& normal) {
  // beam-divergence waveform simulation (mad_tree.cpp:89-147), os1 0.18deg
  const double beam_div = 0.18 * M_PI / 180.0;
  const int nb = 11;
  const double delta = beam_div / (nb - 1);
  const double rng = mean.norm();
  if (rng < 1e-9) return 0.0;
  const double az = std::atan2(mean.y, mean.x);
  const double el = std::asin(std::min(1.0, std::max(-1.0, mean.z / rng)));
  Vec3 mdir = mean * (1.0 / rng);
  double ssum = 0;
  int cnt = 0;
  for (int i = -nb / 2; i <= nb / 2; ++i) {
    for (int j = -nb / 2; j <= nb / 2; ++j) {
      double a = az + i * delta, e = el + j * delta;
      Vec3 d{std::cos(a) * std::cos(e), std::sin(a) * std::cos(e),
             std::sin(e)};
      double ang = std::acos(std::min(1.0, std::max(-1.0, d.dot(mdir))));
      if (ang >= beam_div / 2.0) continue;
      double denom = normal.dot(d);
      if (std::abs(denom) < 1e-6) continue;
      double t = normal.dot(mean) / denom;
      double r = std::abs(t);
      ssum += (r - rng) * (r - rng);
      ++cnt;
    }
  }
  if (!cnt) return 1.0;
  double stddev = std::sqrt(ssum / cnt);
  double w = std::min(stddev, 0.25) / 0.25;
  return 1.0 - w;
}

void buildNode(TreeCtx& ctx, int64_t begin, int64_t end, int level,
               const NodeStats* parent, const NodeStats* plane_pred) {
  const int64_t n = end - begin;
  NodeStats st;
  st.count = n;
  Vec3 mean;
  for (int64_t i = begin; i < end; ++i) {
    const double* p = ctx.pts + 3 * ctx.idx[i];
    mean = mean + Vec3{p[0], p[1], p[2]};
  }
  mean = mean * (1.0 / std::max<int64_t>(n, 1));
  double cov[3][3] = {};
  for (int64_t i = begin; i < end; ++i) {
    const double* p = ctx.pts + 3 * ctx.idx[i];
    double d[3] = {p[0] - mean.x, p[1] - mean.y, p[2] - mean.z};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) cov[r][c] += d[r] * d[c];
  }
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) cov[r][c] /= std::max<int64_t>(n, 1);
  double evals[3];
  eigh3(cov, evals, st.evecs);
  st.mean = mean;

  // bbox extent along the largest eigenvector
  double lo = std::numeric_limits<double>::max(), hi = -lo;
  Vec3 split{st.evecs[0][2], st.evecs[1][2], st.evecs[2][2]};
  for (int64_t i = begin; i < end; ++i) {
    const double* p = ctx.pts + 3 * ctx.idx[i];
    double t = (Vec3{p[0], p[1], p[2]} - mean).dot(split);
    lo = std::min(lo, t);
    hi = std::max(hi, t);
  }
  const double extent = (n > 0) ? hi - lo : 0.0;

  if (extent < ctx.b_max || n <= 1) {
    // leaf: resolve normal (mad_tree.cpp:66-88)
    Vec3 normal{st.evecs[0][0], st.evecs[1][0], st.evecs[2][0]};
    if (plane_pred) {
      normal = Vec3{plane_pred->evecs[0][0], plane_pred->evecs[1][0],
                    plane_pred->evecs[2][0]};
    } else if (n < 3 && parent) {
      const NodeStats* anc = parent;
      normal = Vec3{anc->evecs[0][0], anc->evecs[1][0], anc->evecs[2][0]};
    }
    // leaf mean snaps to the nearest member point
    double best = std::numeric_limits<double>::max();
    Vec3 lm = mean;
    for (int64_t i = begin; i < end; ++i) {
      const double* p = ctx.pts + 3 * ctx.idx[i];
      double d = (Vec3{p[0], p[1], p[2]} - mean).norm();
      if (d < best) {
        best = d;
        lm = Vec3{p[0], p[1], p[2]};
      }
    }
    if (lm.dot(normal) > 0) normal = normal * -1.0;  // orient to sensor
    float w = (float)leafWeight(lm, normal);
    for (int64_t i = begin; i < end; ++i) {
      int64_t o = ctx.idx[i];
      ctx.normals[3 * o] = (float)normal.x;
      ctx.normals[3 * o + 1] = (float)normal.y;
      ctx.normals[3 * o + 2] = (float)normal.z;
      ctx.weights[o] = w;
    }
    return;
  }

  NodeStats pred_store;
  const NodeStats* pred = plane_pred;
  // bbox extent along the smallest eigenvector for the plane-predecessor
  if (!pred) {
    Vec3 nrm{st.evecs[0][0], st.evecs[1][0], st.evecs[2][0]};
    double l2 = std::numeric_limits<double>::max(), h2 = -l2;
    for (int64_t i = begin; i < end; ++i) {
      const double* p = ctx.pts + 3 * ctx.idx[i];
      double t = (Vec3{p[0], p[1], p[2]} - mean).dot(nrm);
      l2 = std::min(l2, t);
      h2 = std::max(h2, t);
    }
    if (h2 - l2 < ctx.b_min) {
      pred_store = st;
      pred = &pred_store;
    }
  }

  auto it = std::partition(
      ctx.idx.begin() + begin, ctx.idx.begin() + end, [&](int64_t i) {
        const double* p = ctx.pts + 3 * i;
        return (Vec3{p[0], p[1], p[2]} - mean).dot(split) < 0.0;
      });
  int64_t mid = it - ctx.idx.begin();
  if (mid == begin || mid == end) mid = begin + n / 2;  // degenerate split

  if (level < 3 && n > 4096) {  // std::async parallel build (mad_tree:159-171)
    auto fut = std::async(std::launch::async, [&, mid]() {
      buildNode(ctx, begin, mid, level + 1, &st, pred);
    });
    buildNode(ctx, mid, end, level + 1, &st, pred);
    fut.get();
  } else {
    buildNode(ctx, begin, mid, level + 1, &st, pred);
    buildNode(ctx, mid, end, level + 1, &st, pred);
  }
}

}  // namespace

void mrhash_estimate_normals(const double* pts, int64_t n, double b_max,
                             double b_min, float* normals, float* weights) {
  if (n <= 0) return;
  TreeCtx ctx;
  ctx.pts = pts;
  ctx.idx.resize((size_t)n);
  for (int64_t i = 0; i < n; ++i) ctx.idx[(size_t)i] = i;
  ctx.normals = normals;
  ctx.weights = weights;
  ctx.b_max = b_max;
  ctx.b_min = b_min;
  buildNode(ctx, 0, n, 0, nullptr, nullptr);
}

}  // extern "C"
