// Native host-side utilities for cluster_generator_tpu.
//
// TPU-native equivalents of the reference's Cython extension modules
// (cluster_generator.opt.structures / opt.cython_utils — SURVEY.md §2.2):
// the hot on-device math lives in JAX/XLA, but the *host* runtime around it
// (chunk-index construction, out-of-core grid painting for exporters,
// spline evaluation feeding format writers) is plain C++ here, exposed via
// a C ABI consumed with ctypes (ops/native.py).
//
// Build: `make -C native` -> cluster_generator_tpu/ops/libcg_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// construct_chunks: chunkmap uint32[3, 2, n_chunks] of per-chunk (start, end)
// cell indices tiling the domain in cubes of `chunksize` (reference
// opt.structures.construct_chunks, called at data_structures.py:238).
// Chunk order: i-major (x slow, z fast) to match the numpy fallback.
// Returns the number of chunks written.
int64_t cg_construct_chunks(const uint32_t dd[3], uint32_t chunksize,
                            uint32_t* out /* [3*2*n] */) {
  const uint32_t nx = dd[0] / chunksize;
  const uint32_t ny = dd[1] / chunksize;
  const uint32_t nz = dd[2] / chunksize;
  const int64_t n = (int64_t)nx * ny * nz;
  // layout: out[axis*2*n + minmax*n + chunk]
  int64_t c = 0;
  for (uint32_t i = 0; i < nx; ++i)
    for (uint32_t j = 0; j < ny; ++j)
      for (uint32_t k = 0; k < nz; ++k, ++c) {
        const uint32_t s[3] = {i * chunksize, j * chunksize, k * chunksize};
        for (int ax = 0; ax < 3; ++ax) {
          out[(int64_t)ax * 2 * n + 0 * n + c] = s[ax];
          out[(int64_t)ax * 2 * n + 1 * n + c] = s[ax] + chunksize;
        }
      }
  return n;
}

// ---------------------------------------------------------------------------
// Binary-search interval locate — THE bracket convention for every spline
// path in this file (evaluators must call this, never re-implement it, so
// a convention change cannot diverge the paths).
static inline int64_t spline_locate(const double* xs, int64_t n, double q) {
  if (q <= xs[0]) return 0;
  if (q >= xs[n - 1]) return n - 2;
  int64_t lo = 0, hi = n - 2;
  while (lo < hi) {
    int64_t mid = (lo + hi + 1) >> 1;
    if (xs[mid] <= q)
      lo = mid;
    else
      hi = mid - 1;
  }
  return lo;
}

// Cubic-spline evaluation with the same per-interval representation as
// core/interp.py (y = a + b t + c t^2 + d t^3, t = x - knot[i]);
// out-of-range queries extrapolate with the boundary polynomial.
static inline double spline_one(const double* xs, const double* a,
                                const double* b, const double* cc,
                                const double* d, int64_t n, double q) {
  const int64_t lo = spline_locate(xs, n, q);
  const double t = q - xs[lo];
  return a[lo] + t * (b[lo] + t * (cc[lo] + t * d[lo]));
}

// Hint-based interval search: r varies smoothly between adjacent grid
// cells (at most a few knots per step), so walking the bracket from the
// previous cell's interval touches only neighboring knots — O(1)
// amortized and L1-resident, where a fresh binary search over a
// ~1000-knot table streams the whole xs array through cache per query.
static inline int64_t spline_locate_hinted(const double* xs, int64_t n,
                                           double q, int64_t hint) {
  if (q <= xs[0]) return 0;
  if (q >= xs[n - 1]) return n - 2;
  int64_t lo = hint;
  while (q < xs[lo]) --lo;
  while (q >= xs[lo + 1]) ++lo;
  return lo;
}

void cg_spline_eval(const double* xs, const double* a, const double* b,
                    const double* c, const double* d, int64_t n,
                    const double* q, int64_t nq, double* out) {
  const unsigned nt =
      std::max(1u, std::min(std::thread::hardware_concurrency(), 16u));
  if (nq < 4096 || nt == 1) {
    for (int64_t i = 0; i < nq; ++i)
      out[i] = spline_one(xs, a, b, c, d, n, q[i]);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t per = (nq + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    const int64_t s = t * per, e = std::min<int64_t>(nq, s + per);
    if (s >= e) break;
    threads.emplace_back([=]() {
      for (int64_t i = s; i < e; ++i)
        out[i] = spline_one(xs, a, b, c, d, n, q[i]);
    });
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// paint_radial_chunks: evaluate a radial spline field on the cell centers of
// a run of chunks (host fallback / exporter path of the reference's
// opt.structures.dump_field_to_hdf5, data_structures.py:399).
//   starts: int64[nchunks*3] first-cell indices
//   out:    double[nchunks * cs^3]
void cg_paint_radial_chunks(const double* xs, const double* a,
                            const double* b, const double* c, const double* d,
                            int64_t n, const int64_t* starts, int64_t nchunks,
                            int64_t cs, const double deltas[3],
                            const double left[3], double* out) {
  // Interleave the per-interval data (knot, a, b, c, d) so each cell's
  // coefficient fetch is one cache line instead of five scattered
  // streams (measured ~1.5x on the 512^3 paint).  There are n knots but
  // only n-1 intervals — the coefficient arrays stop at n-2 (and only
  // intervals 0..n-2 are ever looked up below).
  std::vector<double> packed(5 * (n - 1));
  for (int64_t i = 0; i < n - 1; ++i) {
    packed[5 * i + 0] = xs[i];
    packed[5 * i + 1] = a[i];
    packed[5 * i + 2] = b[i];
    packed[5 * i + 3] = c[i];
    packed[5 * i + 4] = d[i];
  }
  const double* pk = packed.data();
  const double x_lo = xs[0], x_hi = xs[n - 1];

  const unsigned nt =
      std::max(1u, std::min(std::thread::hardware_concurrency(), 16u));
  std::vector<std::thread> threads;
  const int64_t per = (nchunks + nt - 1) / nt;
  auto work = [=](int64_t c0, int64_t c1) {
    std::vector<double> r_row(cs);
    std::vector<int64_t> ix_row(cs);
    for (int64_t ci = c0; ci < c1; ++ci) {
      const int64_t sx = starts[ci * 3 + 0];
      const int64_t sy = starts[ci * 3 + 1];
      const int64_t sz = starts[ci * 3 + 2];
      double* blk = out + ci * cs * cs * cs;
      // on-disk z-first layout blk[k][j][i] = f(x_i, y_j, z_k) (matches
      // data_structures._paint_chunk / the reference reader's transpose)
      // seed the interval hint once per chunk with a binary search, then
      // walk it cell-to-cell (r is unimodal along each row and changes
      // slowly between rows, so the walk is a handful of comparisons)
      int64_t hint = -1;
      for (int64_t k = 0; k < cs; ++k) {
        const double z = left[2] + (sz + k + 0.5) * deltas[2];
        for (int64_t j = 0; j < cs; ++j) {
          const double y = left[1] + (sy + j + 0.5) * deltas[1];
          const double z2y2 = z * z + y * y;
          // phase 1 (vectorizable): radii, clamped to the knot range —
          // boundary value, not extrapolation (matches _paint_chunk;
          // the reference extrapolates and can paint NEGATIVE densities
          // in bbox corners)
          for (int64_t i = 0; i < cs; ++i) {
            const double x = left[0] + (sx + i + 0.5) * deltas[0];
            const double r = std::sqrt(z2y2 + x * x);
            r_row[i] = std::min(std::max(r, x_lo), x_hi);
          }
          // phase 2 (scalar, ~1 comparison/cell): hint-walked intervals
          for (int64_t i = 0; i < cs; ++i) {
            hint = hint < 0 ? spline_locate(xs, n, r_row[i])
                            : spline_locate_hinted(xs, n, r_row[i], hint);
            ix_row[i] = hint;
          }
          // phase 3: one interleaved row per cell -> FMA chain
          double* row_out = blk + (k * cs + j) * cs;
          for (int64_t i = 0; i < cs; ++i) {
            const double* p = pk + 5 * ix_row[i];
            const double t = r_row[i] - p[0];
            row_out[i] = p[1] + t * (p[2] + t * (p[3] + t * p[4]));
          }
        }
      }
    }
  };
  for (unsigned t = 0; t < nt; ++t) {
    const int64_t s = t * per, e = std::min<int64_t>(nchunks, s + per);
    if (s >= e) break;
    threads.emplace_back(work, s, e);
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Trilinear interpolation of a (nx, ny, nz) field at arbitrary points with
// zero fill outside (host path of fields.py map_field_to_particles).
void cg_trilinear(const double* xs, int64_t nx, const double* ys, int64_t ny,
                  const double* zs, int64_t nz, const double* field,
                  const double* pts /* [np*3] */, int64_t np, double* out) {
  auto locate = [](const double* cs, int64_t n, double p, int64_t* idx,
                   double* w) -> bool {
    // n < 2: no interval exists — treat the whole axis as "outside"
    // (reading cs[1] / field[(ix+1)...] would be out of bounds)
    if (n < 2 || p < cs[0] || p > cs[n - 1]) return false;
    int64_t lo = 0, hi = n - 2;
    while (lo < hi) {
      int64_t mid = (lo + hi + 1) >> 1;
      if (cs[mid] <= p)
        lo = mid;
      else
        hi = mid - 1;
    }
    *idx = lo;
    *w = (p - cs[lo]) / (cs[lo + 1] - cs[lo]);
    return true;
  };
  const unsigned nt =
      std::max(1u, std::min(std::thread::hardware_concurrency(), 16u));
  std::vector<std::thread> threads;
  const int64_t per = (np + nt - 1) / nt;
  auto work = [=](int64_t s, int64_t e) {
    for (int64_t p = s; p < e; ++p) {
      int64_t ix, iy, iz;
      double wx, wy, wz;
      if (!locate(xs, nx, pts[p * 3 + 0], &ix, &wx) ||
          !locate(ys, ny, pts[p * 3 + 1], &iy, &wy) ||
          !locate(zs, nz, pts[p * 3 + 2], &iz, &wz)) {
        out[p] = 0.0;
        continue;
      }
      const int64_t s00 = (ix * ny + iy) * nz + iz;
      const int64_t s01 = s00 + 1;
      const int64_t s10 = s00 + nz;
      const int64_t s11 = s10 + 1;
      const int64_t t00 = ((ix + 1) * ny + iy) * nz + iz;
      const int64_t t01 = t00 + 1;
      const int64_t t10 = t00 + nz;
      const int64_t t11 = t10 + 1;
      const double c00 = field[s00] * (1 - wz) + field[s01] * wz;
      const double c01 = field[s10] * (1 - wz) + field[s11] * wz;
      const double c10 = field[t00] * (1 - wz) + field[t01] * wz;
      const double c11 = field[t10] * (1 - wz) + field[t11] * wz;
      const double c0 = c00 * (1 - wy) + c01 * wy;
      const double c1 = c10 * (1 - wy) + c11 * wy;
      out[p] = c0 * (1 - wx) + c1 * wx;
    }
  };
  for (unsigned t = 0; t < nt; ++t) {
    const int64_t s = t * per, e = std::min<int64_t>(np, s + per);
    if (s >= e) break;
    threads.emplace_back(work, s, e);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
