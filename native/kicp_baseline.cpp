// Native CPU baseline of the Kinematic-ICP algorithm.
//
// A clean-room C++17 implementation of the reference pipeline semantics
// (documented in SURVEY.md §2a/2b from /root/reference/cpp/kinematic_icp and
// KISS-ICP v1.2.0 usage sites), built as an *honest CPU baseline* for the
// TPU framework's benchmarks: same algorithm, dynamic containers, float64,
// -O3, std::thread parallelism over points (the reference uses TBB).
//
// This is NOT in the TPU product path.  It exists so `bench.py` can report
// a compiled-CPU frames/s denominator instead of the pure-Python oracle
// (VERDICT.md round-1 item 1), and so tests can differential-check it
// against the Python float64 oracle.
//
// Pipeline per frame (reference KinematicICP.cpp:48-85 semantics):
//   conjugate odometry into lidar frame -> deskew (scan-end anchor) ->
//   range filter -> transform to base -> voxel downsample @0.5*vs ->
//   @1.5*vs -> adaptive threshold tau -> kinematically-constrained GN ICP
//   (2-DoF unicycle, re-association each iteration, adaptive beta) ->
//   threshold update -> map insert + far-voxel evict -> pose update.
//
// Harness protocol (little-endian binary, driven by
// kinematic_icp_tpu/baseline_native.py):
//   stdin/file in :
//     int64  magic = 0x4B49435042415345 ("KICPBASE")
//     f64[6] max_range min_range voxel_size fixed_threshold
//            convergence_criterion fixed_regularization
//     i64[6] max_points_per_voxel max_num_iterations use_adaptive_threshold
//            use_adaptive_regularization deskew num_threads
//     i64    apply_stationary_gate
//     f64[16] extrinsic (row-major 4x4, lidar->base)
//     i64    num_frames
//     per frame:
//       i64 n ; f64[n*3] xyz ; i64 has_ts ; f64[n] ts (iff has_ts)
//       f64[16] relative_odometry
//   file out: f64[num_frames*16] poses after each frame (row-major 4x4)
//   stdout  : one JSON line {"frames":N,"elapsed_s":t,"fps":f}
//
// Build: make -C native kicp_baseline

#include <algorithm>
#include <array>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

using V3 = std::array<double, 3>;
using M3 = std::array<double, 9>;   // row-major
using M4 = std::array<double, 16>;  // row-major

// ---------------------------------------------------------------------
// Small fixed-size linear algebra (replaces Eigen/Sophus in the reference)
// ---------------------------------------------------------------------

inline M4 mat4_mul(const M4 &a, const M4 &b) {
  M4 c{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += a[i * 4 + k] * b[k * 4 + j];
      c[i * 4 + j] = s;
    }
  return c;
}

inline M4 mat4_identity() {
  M4 m{};
  m[0] = m[5] = m[10] = m[15] = 1.0;
  return m;
}

// Rigid-transform inverse: [R t; 0 1]^-1 = [R^T -R^T t; 0 1].
inline M4 se3_inverse(const M4 &T) {
  M4 o = mat4_identity();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) o[i * 4 + j] = T[j * 4 + i];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += o[i * 4 + j] * T[j * 4 + 3];
    o[i * 4 + 3] = -s;
  }
  return o;
}

inline V3 xform(const M4 &T, const V3 &p) {
  return {T[0] * p[0] + T[1] * p[1] + T[2] * p[2] + T[3],
          T[4] * p[0] + T[5] * p[1] + T[6] * p[2] + T[7],
          T[8] * p[0] + T[9] * p[1] + T[10] * p[2] + T[11]};
}

inline M3 skew(const V3 &w) {
  return {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
}

inline M3 m3_mul(const M3 &a, const M3 &b) {
  M3 c{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[i * 3 + k] * b[k * 3 + j];
      c[i * 3 + j] = s;
    }
  return c;
}

// exp of a 6-vector twist (v, w) -> 4x4, closed form with small-angle series.
M4 se3_exp(const std::array<double, 6> &xi) {
  const V3 v{xi[0], xi[1], xi[2]}, w{xi[3], xi[4], xi[5]};
  const double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  const double th = std::sqrt(th2);
  const M3 W = skew(w), W2 = m3_mul(W, W);
  double A, B, C;
  if (th < 1e-10) {
    A = 1.0;
    B = 0.5;
    C = 1.0 / 6.0;
  } else {
    A = std::sin(th) / th;
    B = (1.0 - std::cos(th)) / th2;
    C = (1.0 - A) / th2;
  }
  M4 T = mat4_identity();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      T[i * 4 + j] = (i == j ? 1.0 : 0.0) + A * W[i * 3 + j] + B * W2[i * 3 + j];
      // V matrix for the translation column
    }
  M3 Vm{};
  for (int i = 0; i < 9; ++i)
    Vm[i] = (i % 4 == 0 ? 1.0 : 0.0) + B * W[i] + C * W2[i];
  for (int i = 0; i < 3; ++i)
    T[i * 4 + 3] = Vm[i * 3 + 0] * v[0] + Vm[i * 3 + 1] * v[1] + Vm[i * 3 + 2] * v[2];
  return T;
}

// Rotation log (rotvec) with the usual robust branches.
V3 so3_log(const M4 &T) {
  const double r00 = T[0], r01 = T[1], r02 = T[2];
  const double r10 = T[4], r11 = T[5], r12 = T[6];
  const double r20 = T[8], r21 = T[9], r22 = T[10];
  double cos_th = std::min(1.0, std::max(-1.0, (r00 + r11 + r22 - 1.0) * 0.5));
  const double th = std::acos(cos_th);
  V3 a{r21 - r12, r02 - r20, r10 - r01};  // 2 sin(th) * axis
  if (th < 1e-7) {
    // log(R) ~ (R - R^T)/2 to first order
    return {0.5 * a[0], 0.5 * a[1], 0.5 * a[2]};
  }
  if (th > M_PI - 1e-5) {
    // Near pi: axis from the diagonal; sign from the off-diagonals.
    V3 ax{std::sqrt(std::max(0.0, (r00 + 1.0) * 0.5)),
          std::sqrt(std::max(0.0, (r11 + 1.0) * 0.5)),
          std::sqrt(std::max(0.0, (r22 + 1.0) * 0.5))};
    int k = 0;
    if (ax[1] > ax[k]) k = 1;
    if (ax[2] > ax[k]) k = 2;
    if (k == 0) {
      if (r01 + r10 < 0) ax[1] = -ax[1];
      if (r02 + r20 < 0) ax[2] = -ax[2];
    } else if (k == 1) {
      if (r01 + r10 < 0) ax[0] = -ax[0];
      if (r12 + r21 < 0) ax[2] = -ax[2];
    } else {
      if (r02 + r20 < 0) ax[0] = -ax[0];
      if (r12 + r21 < 0) ax[1] = -ax[1];
    }
    // Orient so that vee(R - R^T) agrees when it is informative.
    if (a[0] * ax[0] + a[1] * ax[1] + a[2] * ax[2] < 0)
      ax = {-ax[0], -ax[1], -ax[2]};
    return {th * ax[0], th * ax[1], th * ax[2]};
  }
  const double s = th / (2.0 * std::sin(th));
  return {s * a[0], s * a[1], s * a[2]};
}

// Full SE(3) log -> (v, w).
std::array<double, 6> se3_log(const M4 &T) {
  const V3 w = so3_log(T);
  const double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  const double th = std::sqrt(th2);
  const M3 W = skew(w), W2 = m3_mul(W, W);
  M3 Vinv{};
  double c;
  if (th < 1e-10) {
    c = 1.0 / 12.0;
  } else {
    const double A = std::sin(th) / th;
    const double B = (1.0 - std::cos(th)) / th2;
    c = (1.0 - A / (2.0 * B)) / th2;
  }
  for (int i = 0; i < 9; ++i)
    Vinv[i] = (i % 4 == 0 ? 1.0 : 0.0) - 0.5 * W[i] + c * W2[i];
  const V3 t{T[3], T[7], T[11]};
  return {Vinv[0] * t[0] + Vinv[1] * t[1] + Vinv[2] * t[2],
          Vinv[3] * t[0] + Vinv[4] * t[1] + Vinv[5] * t[2],
          Vinv[6] * t[0] + Vinv[7] * t[1] + Vinv[8] * t[2],
          w[0], w[1], w[2]};
}

inline double norm6(const std::array<double, 6> &x) {
  double s = 0;
  for (double v : x) s += v * v;
  return std::sqrt(s);
}

// ---------------------------------------------------------------------
// Voxel keys + open-addressing grid containers
// ---------------------------------------------------------------------

inline int64_t voxel_key(const V3 &p, double inv_vs) {
  const int64_t x = (int64_t)std::floor(p[0] * inv_vs);
  const int64_t y = (int64_t)std::floor(p[1] * inv_vs);
  const int64_t z = (int64_t)std::floor(p[2] * inv_vs);
  return ((x & 0x1FFFFF) << 42) | ((y & 0x1FFFFF) << 21) | (z & 0x1FFFFF);
}

inline int64_t key_from_coords(int64_t x, int64_t y, int64_t z) {
  return ((x & 0x1FFFFF) << 42) | ((y & 0x1FFFFF) << 21) | (z & 0x1FFFFF);
}

inline size_t key_hash(int64_t k) {
  // splitmix64 finalizer — good avalanche for packed coords.
  uint64_t z = (uint64_t)k + 0x9E3779B97F4A7C15ull;
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return (size_t)(z ^ (z >> 31));
}

constexpr int64_t KEY_EMPTY = INT64_MIN;
constexpr int64_t KEY_TOMB = INT64_MIN + 1;

// Insertion-order-preserving "first point per voxel" set, used by the
// double downsample.  Open addressing, power-of-two capacity.
class VoxelSet {
 public:
  explicit VoxelSet(size_t expect) { reset(expect); }

  void reset(size_t expect) {
    cap_ = 64;
    while (cap_ < expect * 2) cap_ <<= 1;
    keys_.assign(cap_, KEY_EMPTY);
    size_ = 0;
  }

  // Returns true iff the key was newly inserted.
  bool insert(int64_t k) {
    if ((size_ + 1) * 2 > cap_) grow();
    size_t i = key_hash(k) & (cap_ - 1);
    while (true) {
      int64_t cur = keys_[i];
      if (cur == KEY_EMPTY) {
        keys_[i] = k;
        ++size_;
        return true;
      }
      if (cur == k) return false;
      i = (i + 1) & (cap_ - 1);
    }
  }

 private:
  void grow() {
    std::vector<int64_t> old;
    old.swap(keys_);
    cap_ <<= 1;
    keys_.assign(cap_, KEY_EMPTY);
    for (int64_t k : old)
      if (k != KEY_EMPTY) {
        size_t i = key_hash(k) & (cap_ - 1);
        while (keys_[i] != KEY_EMPTY) i = (i + 1) & (cap_ - 1);
        keys_[i] = k;
      }
  }

  std::vector<int64_t> keys_;
  size_t cap_ = 0, size_ = 0;
};

// First point per voxel, preserving input order (matches the Python oracle's
// dict semantics; the reference's robin_map order is hash-dependent but the
// algorithm is order-insensitive at trajectory level).
std::vector<V3> voxel_downsample(const std::vector<V3> &pts, double vs) {
  VoxelSet seen(pts.size());
  std::vector<V3> out;
  out.reserve(pts.size() / 2 + 8);
  const double inv = 1.0 / vs;
  for (const V3 &p : pts)
    if (seen.insert(voxel_key(p, inv))) out.push_back(p);
  return out;
}

// The local map: open-addressing hash grid of fixed-capacity voxel blocks
// (robin_map<Voxel, VoxelBlock> analog; first-come-kept inserts, far-voxel
// eviction keyed on each block's FIRST point — KISS-ICP v1.2.0 semantics).
class VoxelGrid {
 public:
  VoxelGrid(double voxel_size, double max_distance, int max_ppv)
      : vs_(voxel_size), inv_vs_(1.0 / voxel_size), max_d2_(max_distance * max_distance),
        max_ppv_(max_ppv) {
    clear();
  }

  void clear() {
    cap_ = 1 << 12;
    keys_.assign(cap_, KEY_EMPTY);
    slot_.assign(cap_, -1);
    blocks_n_.clear();
    blocks_p_.clear();
    live_ = 0;
    used_ = 0;
  }

  bool empty() const { return live_ == 0; }

  size_t size() const { return live_; }

  void insert_points(const std::vector<V3> &pts) {
    for (const V3 &p : pts) {
      const int64_t k = voxel_key(p, inv_vs_);
      int32_t b = find_or_create(k);
      int &n = blocks_n_[b];
      if (n < max_ppv_) {
        std::memcpy(&blocks_p_[(size_t)b * max_ppv_ * 3 + (size_t)n * 3],
                    p.data(), sizeof(double) * 3);
        ++n;
      }
    }
  }

  void remove_far(const V3 &origin) {
    for (size_t i = 0; i < cap_; ++i) {
      const int64_t k = keys_[i];
      if (k == KEY_EMPTY || k == KEY_TOMB) continue;
      const double *p0 = &blocks_p_[(size_t)slot_[i] * max_ppv_ * 3];
      const double dx = p0[0] - origin[0], dy = p0[1] - origin[1],
                   dz = p0[2] - origin[2];
      if (dx * dx + dy * dy + dz * dz > max_d2_) {
        keys_[i] = KEY_TOMB;
        free_blocks_.push_back(slot_[i]);
        slot_[i] = -1;
        --live_;
      }
    }
    if (used_ * 2 > cap_ && live_ * 4 < cap_) rehash(cap_);  // purge tombstones
  }

  void update(const std::vector<V3> &pts, const M4 &pose) {
    std::vector<V3> world(pts.size());
    for (size_t i = 0; i < pts.size(); ++i) world[i] = xform(pose, pts[i]);
    insert_points(world);
    remove_far({pose[3], pose[7], pose[11]});
  }

  // Closest stored point within the 27-voxel neighborhood of q.
  // Returns squared distance HUGE if none.
  double closest(const V3 &q, V3 *out) const {
    const int64_t qx = (int64_t)std::floor(q[0] * inv_vs_);
    const int64_t qy = (int64_t)std::floor(q[1] * inv_vs_);
    const int64_t qz = (int64_t)std::floor(q[2] * inv_vs_);
    double best = 1e300;
    const double *bp = nullptr;
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          const int32_t b = find(key_from_coords(qx + dx, qy + dy, qz + dz));
          if (b < 0) continue;
          const int n = blocks_n_[b];
          const double *pts = &blocks_p_[(size_t)b * max_ppv_ * 3];
          for (int i = 0; i < n; ++i) {
            const double ex = pts[i * 3] - q[0], ey = pts[i * 3 + 1] - q[1],
                         ez = pts[i * 3 + 2] - q[2];
            const double d2 = ex * ex + ey * ey + ez * ez;
            if (d2 < best) {
              best = d2;
              bp = &pts[i * 3];
            }
          }
        }
    if (bp) *out = {bp[0], bp[1], bp[2]};
    return best;
  }

  std::vector<V3> pointcloud() const {
    std::vector<V3> out;
    for (size_t i = 0; i < cap_; ++i) {
      const int64_t k = keys_[i];
      if (k == KEY_EMPTY || k == KEY_TOMB) continue;
      const int32_t b = slot_[i];
      for (int j = 0; j < blocks_n_[b]; ++j) {
        const double *p = &blocks_p_[(size_t)b * max_ppv_ * 3 + (size_t)j * 3];
        out.push_back({p[0], p[1], p[2]});
      }
    }
    return out;
  }

 private:
  int32_t find(int64_t k) const {
    size_t i = key_hash(k) & (cap_ - 1);
    while (true) {
      const int64_t cur = keys_[i];
      if (cur == k) return slot_[i];
      if (cur == KEY_EMPTY) return -1;
      i = (i + 1) & (cap_ - 1);
    }
  }

  int32_t find_or_create(int64_t k) {
    if ((used_ + 1) * 2 > cap_) rehash(cap_ * 2);
    size_t i = key_hash(k) & (cap_ - 1);
    size_t first_tomb = SIZE_MAX;
    while (true) {
      const int64_t cur = keys_[i];
      if (cur == k) return slot_[i];
      if (cur == KEY_TOMB && first_tomb == SIZE_MAX) first_tomb = i;
      if (cur == KEY_EMPTY) {
        size_t at = i;
        if (first_tomb != SIZE_MAX)
          at = first_tomb;  // reuse tombstone; used_ unchanged
        else
          ++used_;
        keys_[at] = k;
        slot_[at] = alloc_block();
        ++live_;
        return slot_[at];
      }
      i = (i + 1) & (cap_ - 1);
    }
  }

  int32_t alloc_block() {
    if (!free_blocks_.empty()) {
      const int32_t b = free_blocks_.back();
      free_blocks_.pop_back();
      blocks_n_[b] = 0;
      return b;
    }
    blocks_n_.push_back(0);
    blocks_p_.resize(blocks_p_.size() + (size_t)max_ppv_ * 3);
    return (int32_t)(blocks_n_.size() - 1);
  }

  void rehash(size_t new_cap) {
    std::vector<int64_t> ok;
    std::vector<int32_t> os;
    ok.swap(keys_);
    os.swap(slot_);
    cap_ = new_cap;
    keys_.assign(cap_, KEY_EMPTY);
    slot_.assign(cap_, -1);
    used_ = 0;
    for (size_t i = 0; i < ok.size(); ++i) {
      const int64_t k = ok[i];
      if (k == KEY_EMPTY || k == KEY_TOMB) continue;
      size_t j = key_hash(k) & (cap_ - 1);
      while (keys_[j] != KEY_EMPTY) j = (j + 1) & (cap_ - 1);
      keys_[j] = k;
      slot_[j] = os[i];
      ++used_;
    }
  }

  double vs_, inv_vs_, max_d2_;
  int max_ppv_;
  size_t cap_ = 0, live_ = 0, used_ = 0;  // used_ = live + tombstoned probes
  std::vector<int64_t> keys_;
  std::vector<int32_t> slot_;
  std::vector<int> blocks_n_;
  std::vector<double> blocks_p_;  // blocks_p_[b*max_ppv*3 ...]
  std::vector<int32_t> free_blocks_;
};

// ---------------------------------------------------------------------
// Tiny parallel_for (the reference uses TBB; std::thread is dependency-free)
// ---------------------------------------------------------------------

template <typename F>
void parallel_for(size_t n, int nthreads, F &&body) {
  if (nthreads <= 1 || n < 2048) {
    body(0, n, 0);
    return;
  }
  std::vector<std::thread> ts;
  const size_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 1; t < nthreads; ++t) {
    const size_t lo = chunk * t, hi = std::min(n, chunk * (t + 1));
    if (lo < hi) ts.emplace_back([&, lo, hi, t] { body(lo, hi, t); });
  }
  body(0, std::min(n, chunk), 0);
  for (auto &th : ts) th.join();
}

// ---------------------------------------------------------------------
// Kinematic registration (2-DoF unicycle GN, re-association per iteration)
// ---------------------------------------------------------------------

struct Cfg {
  double max_range, min_range, voxel_size, fixed_threshold,
      convergence_criterion, fixed_regularization;
  int max_ppv, max_iters;
  bool adaptive_threshold, adaptive_reg, deskew;
  int nthreads;
  double map_resolution() const {
    return voxel_size / std::sqrt((double)max_ppv);
  }
};

M4 unicycle(double rho, double theta) {
  const double tiny = 2.2250738585072014e-308;  // DBL_MIN, matches oracle eps
  std::array<double, 6> dx{rho * std::sin(theta) / (theta + tiny),
                           rho * (1.0 - std::cos(theta)) / (theta + tiny),
                           0.0, 0.0, 0.0, theta};
  return se3_exp(dx);
}

struct AssocReduce {
  double s01 = 0, s11 = 0, r0 = 0, r1 = 0, sse = 0;
  int64_t n = 0;
};

// One fused pass: associate every source point against the map at pose T,
// keep pairs with distance < tau, and accumulate the 2-DoF normal equations
// (and residual SSE for the beta regularizer).  Jacobian columns are
// j0 = R e_x and j1 = R (-s_y, s_x, 0) per the reference.
AssocReduce associate_reduce(const std::vector<V3> &src, const VoxelGrid &map,
                             const M4 &T, double tau, int nthreads) {
  const double tau2 = tau * tau;
  const V3 j0{T[0], T[4], T[8]};          // R column 0
  const V3 rc1{T[1], T[5], T[9]};         // R column 1
  std::vector<AssocReduce> parts(std::max(1, nthreads));
  parallel_for(src.size(), nthreads, [&](size_t lo, size_t hi, int tid) {
    AssocReduce acc;
    for (size_t i = lo; i < hi; ++i) {
      const V3 &s = src[i];
      const V3 w = xform(T, s);
      V3 q{};
      const double d2 = map.closest(w, &q);
      if (d2 >= tau2) continue;
      const V3 res{w[0] - q[0], w[1] - q[1], w[2] - q[2]};
      const V3 j1{-s[1] * j0[0] + s[0] * rc1[0], -s[1] * j0[1] + s[0] * rc1[1],
                  -s[1] * j0[2] + s[0] * rc1[2]};
      acc.s01 += j1[0] * j0[0] + j1[1] * j0[1] + j1[2] * j0[2];
      acc.s11 += j1[0] * j1[0] + j1[1] * j1[1] + j1[2] * j1[2];
      acc.r0 += res[0] * j0[0] + res[1] * j0[1] + res[2] * j0[2];
      acc.r1 += res[0] * j1[0] + res[1] * j1[1] + res[2] * j1[2];
      acc.sse += d2;
      ++acc.n;
    }
    parts[tid] = acc;
  });
  AssocReduce total;
  for (const auto &p : parts) {
    total.s01 += p.s01;
    total.s11 += p.s11;
    total.r0 += p.r0;
    total.r1 += p.r1;
    total.sse += p.sse;
    total.n += p.n;
  }
  return total;
}

M4 compute_robot_motion(const std::vector<V3> &src, const VoxelGrid &map,
                        const M4 &last_pose, const M4 &rel_odom, double tau,
                        const Cfg &cfg) {
  M4 current = mat4_mul(last_pose, rel_odom);
  if (map.empty()) return current;
  const double tiny = 2.2250738585072014e-308;
  AssocReduce a = associate_reduce(src, map, current, tau, cfg.nthreads);
  double beta;
  if (cfg.adaptive_reg) {
    const double mean_sq = a.n > 0 ? a.sse / (double)a.n : 0.0;
    beta = a.n > 0 ? 1.0 / (mean_sq + tiny) : 0.0;
  } else {
    beta = cfg.fixed_regularization;
  }
  for (int it = 0; it < cfg.max_iters; ++it) {
    double rho = 0, theta = 0;
    if (a.n > 0) {
      const double n = (double)a.n;
      // JTJ/N + diag(beta, 0); note j0.j0 == 1 (unit rotation column).
      const double h00 = 1.0 + beta, h01 = a.s01 / n, h11 = a.s11 / n;
      const double g0 = a.r0 / n, g1 = a.r1 / n;
      const double det = h00 * h11 - h01 * h01;
      rho = -(h11 * g0 - h01 * g1) / det;
      theta = -(h00 * g1 - h01 * g0) / det;
    }
    current = mat4_mul(current, unicycle(rho, theta));
    if (std::sqrt(rho * rho + theta * theta) < cfg.convergence_criterion)
      break;
    a = associate_reduce(src, map, current, tau, cfg.nthreads);
  }
  return current;
}

// ---------------------------------------------------------------------
// Full pipeline state (KinematicICP + CorrespondenceThreshold)
// ---------------------------------------------------------------------

struct Pipeline {
  Cfg cfg;
  M4 last_pose = mat4_identity();
  VoxelGrid map;
  double odom_sse = 0.0, num_samples = 1e-8;

  explicit Pipeline(const Cfg &c)
      : cfg(c), map(c.voxel_size, c.max_range, c.max_ppv) {}

  double compute_threshold() const {
    if (!cfg.adaptive_threshold) return cfg.fixed_threshold;
    return 3.0 * (cfg.map_resolution() + std::sqrt(odom_sse / num_samples));
  }

  void update_odometry_error(const M4 &err) {
    if (!cfg.adaptive_threshold) return;
    const V3 w = so3_log(err);
    const double th = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
    const double e = std::sqrt(err[3] * err[3] + err[7] * err[7] +
                               err[11] * err[11]) +
                     2.0 * cfg.max_range * std::sin(th / 2.0);
    odom_sse += e * e;
    num_samples += 1.0;
  }

  void register_frame(const std::vector<V3> &frame,
                      const std::vector<double> &ts, bool has_ts,
                      const M4 &extrinsic, const M4 &rel_odom) {
    // Conjugate odometry into the lidar frame.
    const M4 rel_lidar =
        mat4_mul(mat4_mul(se3_inverse(extrinsic), rel_odom), extrinsic);
    // Deskew (scan-end anchor) + range filter, threaded over points.
    std::vector<V3> pre(frame.size());
    std::vector<uint8_t> keep(frame.size());
    const bool do_deskew = cfg.deskew && has_ts && ts.size() == frame.size();
    std::array<double, 6> omega{};
    if (do_deskew) omega = se3_log(rel_lidar);
    const double minr2 = cfg.min_range * cfg.min_range;
    const double maxr2 = cfg.max_range * cfg.max_range;
    parallel_for(frame.size(), cfg.nthreads, [&](size_t lo, size_t hi, int) {
      for (size_t i = lo; i < hi; ++i) {
        V3 p = frame[i];
        if (do_deskew) {
          std::array<double, 6> s;
          const double f = ts[i] - 1.0;
          for (int k = 0; k < 6; ++k) s[k] = f * omega[k];
          p = xform(se3_exp(s), p);
        }
        const double r2 = p[0] * p[0] + p[1] * p[1] + p[2] * p[2];
        keep[i] = (r2 < maxr2 && r2 > minr2) ? 1 : 0;
        pre[i] = p;
      }
    });
    std::vector<V3> pre_base;
    pre_base.reserve(frame.size());
    for (size_t i = 0; i < frame.size(); ++i)
      if (keep[i]) pre_base.push_back(xform(extrinsic, pre[i]));
    // Double downsample.
    const std::vector<V3> frame_ds =
        voxel_downsample(pre_base, cfg.voxel_size * 0.5);
    const std::vector<V3> source =
        voxel_downsample(frame_ds, cfg.voxel_size * 1.5);
    // Register.
    const double tau = compute_threshold();
    const M4 new_pose =
        compute_robot_motion(source, map, last_pose, rel_odom, tau, cfg);
    const M4 err =
        mat4_mul(se3_inverse(mat4_mul(last_pose, rel_odom)), new_pose);
    update_odometry_error(err);
    map.update(frame_ds, new_pose);
    last_pose = new_pose;
  }
};

// ---------------------------------------------------------------------
// Binary harness
// ---------------------------------------------------------------------

template <typename T>
bool read_exact(std::FILE *f, T *dst, size_t count) {
  return std::fread(dst, sizeof(T), count, f) == count;
}

int run(const char *in_path, const char *out_path) {
  std::FILE *f = std::fopen(in_path, "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", in_path);
    return 2;
  }
  int64_t magic = 0;
  if (!read_exact(f, &magic, 1) || magic != 0x4B49435042415345ll) {
    std::fprintf(stderr, "bad magic\n");
    return 2;
  }
  double d6[6];
  int64_t i6[6], gate_flag;
  M4 extrinsic;
  int64_t num_frames;
  if (!read_exact(f, d6, 6) || !read_exact(f, i6, 6) ||
      !read_exact(f, &gate_flag, 1) || !read_exact(f, extrinsic.data(), 16) ||
      !read_exact(f, &num_frames, 1)) {
    std::fprintf(stderr, "bad header\n");
    return 2;
  }
  Cfg cfg;
  cfg.max_range = d6[0];
  cfg.min_range = d6[1];
  cfg.voxel_size = d6[2];
  cfg.fixed_threshold = d6[3];
  cfg.convergence_criterion = d6[4];
  cfg.fixed_regularization = d6[5];
  cfg.max_ppv = (int)i6[0];
  cfg.max_iters = (int)i6[1];
  cfg.adaptive_threshold = i6[2] != 0;
  cfg.adaptive_reg = i6[3] != 0;
  cfg.deskew = i6[4] != 0;
  cfg.nthreads = (int)i6[5];
  if (cfg.nthreads <= 0)
    cfg.nthreads = (int)std::max(1u, std::thread::hardware_concurrency());
  const bool gate = gate_flag != 0;

  std::vector<std::vector<V3>> frames((size_t)num_frames);
  std::vector<std::vector<double>> tss((size_t)num_frames);
  std::vector<uint8_t> has_ts((size_t)num_frames);
  std::vector<M4> rels((size_t)num_frames);
  for (int64_t k = 0; k < num_frames; ++k) {
    int64_t n = 0;
    if (!read_exact(f, &n, 1)) return 2;
    frames[k].resize((size_t)n);
    if (!read_exact(f, (double *)frames[k].data(), (size_t)n * 3)) return 2;
    int64_t ht = 0;
    if (!read_exact(f, &ht, 1)) return 2;
    has_ts[k] = (uint8_t)ht;
    if (ht) {
      tss[k].resize((size_t)n);
      if (!read_exact(f, tss[k].data(), (size_t)n)) return 2;
    }
    if (!read_exact(f, rels[k].data(), 16)) return 2;
  }
  std::fclose(f);

  Pipeline pipe(cfg);
  std::vector<M4> poses((size_t)num_frames);
  const auto t0 = std::chrono::steady_clock::now();
  for (int64_t k = 0; k < num_frames; ++k) {
    bool moved = true;
    if (gate) moved = norm6(se3_log(rels[k])) > 1e-3;
    if (moved)
      pipe.register_frame(frames[k], tss[k], has_ts[k] != 0, extrinsic,
                          rels[k]);
    poses[k] = pipe.last_pose;
  }
  const double elapsed =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();

  std::FILE *out = std::fopen(out_path, "wb");
  if (!out) {
    std::fprintf(stderr, "cannot open %s\n", out_path);
    return 2;
  }
  for (const M4 &p : poses) std::fwrite(p.data(), sizeof(double), 16, out);
  std::fclose(out);
  std::printf("{\"frames\": %lld, \"elapsed_s\": %.6f, \"fps\": %.3f, "
              "\"threads\": %d}\n",
              (long long)num_frames, elapsed,
              (double)num_frames / elapsed, cfg.nthreads);
  return 0;
}

}  // namespace

int main(int argc, char **argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s <input.bin> <poses_out.bin>\n", argv[0]);
    return 2;
  }
  return run(argv[1], argv[2]);
}
