// Shared single-threaded NDT grid core for the native tools:
// baseline_matcher.cpp (the bench baseline) and reference_pipeline.cpp (the
// reference-shaped full-SLAM trajectory oracle).
//
// From-scratch flat-array implementation of the reference's NDT math
// (cf. /root/reference/src/ndt_model.cpp): incremental cell moments,
// covariance with the small-eigenvalue floor, n>=3 compute / n>=5 score.

#pragma once

#include <cmath>
#include <cstdint>
#include <vector>

namespace ndt2d_native {

struct CellStats {
  int n = 0;
  double sx = 0.0, sy = 0.0;        // sums
  double sxx = 0.0, sxy = 0.0, syy = 0.0;
  // finalized
  double mx = 0.0, my = 0.0;
  double i00 = 0.0, i01 = 0.0, i11 = 0.0;
  bool scorable = false;
};

struct Grid {
  double ox, oy, cell;
  int w, h;
  std::vector<CellStats> cells;

  int index(double x, double y) const {
    if (x < ox || y < oy) return -1;
    int ix = static_cast<int>((x - ox) / cell);
    int iy = static_cast<int>((y - oy) / cell);
    if (ix >= w || iy >= h) return -1;
    return iy * w + ix;
  }
};

inline void finalize(Grid& g) {
  for (auto& c : g.cells) {
    if (c.n < 3) continue;
    const double n = c.n;
    c.mx = c.sx / n;
    c.my = c.sy / n;
    const double scale = n / (n - 1.0);
    const double c00 = (c.sxx / n - c.mx * c.mx) * scale;
    const double c01 = (c.sxy / n - c.mx * c.my) * scale;
    const double c11 = (c.syy / n - c.my * c.my) * scale;
    // closed-form symmetric 2x2 eigenvalues; floor the small one.
    const double ht = 0.5 * (c00 + c11);
    double det = c00 * c11 - c01 * c01;
    const double disc = std::sqrt(std::max(ht * ht - det, 0.0));
    const double large = ht + disc;
    const double small = ht - disc;
    if (small < 0.001 * large) det = (0.001 * large) * large;
    if (std::fabs(det) < 1e-20) det = 1e-20;
    c.i00 = c11 / det;
    c.i01 = -c01 / det;
    c.i11 = c00 / det;
    c.scorable = c.n >= 5;
  }
}

inline double score_point(const Grid& g, double x, double y) {
  const int idx = g.index(x, y);
  if (idx < 0) return 0.0;
  const CellStats& c = g.cells[idx];
  if (!c.scorable) return 0.0;
  const double qx = x - c.mx, qy = y - c.my;
  double e = -0.5 * (c.i00 * qx * qx + 2.0 * c.i01 * qx * qy + c.i11 * qy * qy);
  if (e > 0.0) e = 0.0;
  return std::exp(e);
}

}  // namespace ndt2d_native
