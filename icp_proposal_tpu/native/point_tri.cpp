// Host-side native kernels for offline/context-build geometry prep.
//
// The TPU compute path is JAX/XLA/Pallas; these C++ kernels cover the
// host-side O(V·F) work the reference delegates to scalismo's JVM BVH
// construction (reference call sites: the closestPointOnSurface machinery
// behind NonRigidIcpProposal.scala:97 and
// IndependentPointDistanceEvaluator.scala:43).  The shortlist-index build
// (ops/surface_index.py) needs exact point→triangle distances from every
// vertex to every face plus a top-K selection per vertex; chunked numpy
// takes ~30 s at femur scale (1.6k×3.2k) and minutes at dense-scan scale,
// while this OpenMP kernel does femur scale in tens of milliseconds.
//
// Exposed C ABI (ctypes-loaded by icp_proposal_tpu/native/__init__.py):
//   icp_shortlist_topk(queries[N,3], tri[F,3,3], N, F, K,
//                      out_idx[N,K], out_d2[N,K])
//     → per query, indices of the K nearest faces by exact point-triangle
//       squared distance, ascending.
//   icp_point_tri_d2(queries[N,3], tri[F,3,3], N, F, out_d2[N,F])
//     → the full exact distance matrix (validation / small problems).
//
// All buffers are contiguous float64 (row-major); caller allocates outputs.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Vec3 {
  double x, y, z;
};

static inline Vec3 sub(const Vec3 &a, const Vec3 &b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
static inline double dot(const Vec3 &a, const Vec3 &b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

// Exact squared distance from point p to triangle (a,b,c) — Ericson,
// "Real-Time Collision Detection" §5.1.5 closest-point region cascade.
// Same math as ops/closest_point.closest_point_on_triangle (the jit kernel)
// and ops/surface_index._np_point_tri_dist2 (the numpy fallback).
static inline double point_tri_d2(const Vec3 &p, const Vec3 &a, const Vec3 &b,
                                  const Vec3 &c) {
  const Vec3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
  const double d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0.0 && d2 <= 0.0) {
    const Vec3 d = ap;
    return dot(d, d);  // vertex region A
  }
  const Vec3 bp = sub(p, b);
  const double d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0.0 && d4 <= d3) {
    const Vec3 d = bp;
    return dot(d, d);  // vertex region B
  }
  const double vc = d1 * d4 - d3 * d2;
  if (vc <= 0.0 && d1 >= 0.0 && d3 <= 0.0) {
    const double v = d1 / (d1 - d3);  // edge AB
    const Vec3 d = {ap.x - v * ab.x, ap.y - v * ab.y, ap.z - v * ab.z};
    return dot(d, d);
  }
  const Vec3 cp = sub(p, c);
  const double d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0.0 && d5 <= d6) {
    const Vec3 d = cp;
    return dot(d, d);  // vertex region C
  }
  const double vb = d5 * d2 - d1 * d6;
  if (vb <= 0.0 && d2 >= 0.0 && d6 <= 0.0) {
    const double w = d2 / (d2 - d6);  // edge AC
    const Vec3 d = {ap.x - w * ac.x, ap.y - w * ac.y, ap.z - w * ac.z};
    return dot(d, d);
  }
  const double va = d3 * d6 - d5 * d4;
  if (va <= 0.0 && (d4 - d3) >= 0.0 && (d5 - d6) >= 0.0) {
    const double w = (d4 - d3) / ((d4 - d3) + (d5 - d6));  // edge BC
    const Vec3 bc = sub(c, b);
    const Vec3 d = {bp.x - w * bc.x, bp.y - w * bc.y, bp.z - w * bc.z};
    return dot(d, d);
  }
  // face interior
  const double denom = 1.0 / (va + vb + vc);
  const double v = vb * denom, w = vc * denom;
  const Vec3 d = {ap.x - v * ab.x - w * ac.x, ap.y - v * ab.y - w * ac.y,
                  ap.z - v * ab.z - w * ac.z};
  return dot(d, d);
}

}  // namespace

extern "C" {

void icp_point_tri_d2(const double *queries, const double *tri, int64_t n,
                      int64_t f, double *out_d2) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const Vec3 p = {queries[3 * i], queries[3 * i + 1], queries[3 * i + 2]};
    for (int64_t j = 0; j < f; ++j) {
      const double *t = tri + 9 * j;
      const Vec3 a = {t[0], t[1], t[2]}, b = {t[3], t[4], t[5]},
                 c = {t[6], t[7], t[8]};
      out_d2[i * f + j] = point_tri_d2(p, a, b, c);
    }
  }
}

void icp_shortlist_topk(const double *queries, const double *tri, int64_t n,
                        int64_t f, int64_t k, int32_t *out_idx,
                        double *out_d2) {
  if (k > f) k = f;
#pragma omp parallel
  {
    std::vector<double> d2(f);
    std::vector<int32_t> ord(f);
#pragma omp for schedule(dynamic, 16)
    for (int64_t i = 0; i < n; ++i) {
      const Vec3 p = {queries[3 * i], queries[3 * i + 1], queries[3 * i + 2]};
      for (int64_t j = 0; j < f; ++j) {
        const double *t = tri + 9 * j;
        const Vec3 a = {t[0], t[1], t[2]}, b = {t[3], t[4], t[5]},
                   c = {t[6], t[7], t[8]};
        d2[j] = point_tri_d2(p, a, b, c);
      }
      for (int64_t j = 0; j < f; ++j) ord[j] = static_cast<int32_t>(j);
      // partial top-K ascending by (distance, index) — the index tiebreak
      // matches the numpy build's deterministic stable ordering
      auto cmp = [&](int32_t x, int32_t y) {
        return d2[x] < d2[y] || (d2[x] == d2[y] && x < y);
      };
      std::partial_sort(ord.begin(), ord.begin() + k, ord.end(), cmp);
      for (int64_t j = 0; j < k; ++j) {
        out_idx[i * k + j] = ord[j];
        out_d2[i * k + j] = d2[ord[j]];
      }
    }
  }
}

}  // extern "C"
