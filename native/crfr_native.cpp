// crfr native host-side preprocessing library.
//
// The reference repo leans on vendored native code (cv2.resize SIMD bicubic,
// cv2.warpAffine, PIL's C resampling) for its host-side image path
// (SURVEY.md §2.2). This library provides the same capabilities natively for
// the rebuild's host stages — dataset packing, alignment-at-pack-time, and
// grain-worker preprocessing — with EXACTLY the same numerics as the
// framework's JAX ops (crfr/ops/bicubic.py, similarity.py, warp.py), so a
// sample preprocessed on the host matches the on-device path bit-for-bit at
// uint8 resolution.
//
// Exposed C ABI (see crfr/native/__init__.py ctypes bindings):
//   crfr_resize_bicubic_f32  — separable bicubic, PIL (a=-0.5, antialias on
//                              downscale) or cv2 (a=-0.75) semantics, float
//   crfr_resize_bicubic_u8   — PIL's 8bpc pipeline: horizontal-first with a
//                              round-half-up uint8 intermediate
//   crfr_warp_affine_f32     — inverse-map bilinear warp (cv2.warpAffine
//                              BORDER_CONSTANT 0 convention)
//   crfr_solve_similarity    — centered closed-form 5-pt similarity solve
//   crfr_align_crop_u8       — fused: solve + warp + crop to out_size
//   crfr_normalize_u8        — (x - 127.5) / 128 → float32
//
// Build: native/Makefile (g++ -O3 -fPIC -shared). No external deps.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline double cubic(double x, double a) {
  double ax = std::fabs(x);
  if (ax <= 1.0) return ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0;
  if (ax < 2.0) return (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a;
  return 0.0;
}

// One row of the 1-D resampling operator; returns (xmin, taps).
// Mirrors crfr/ops/bicubic.py::_pil_matrix / _cv2_matrix exactly.
void pil_row(int in_size, int out_size, int o, int* xmin_out,
             std::vector<double>* w) {
  const double a = -0.5;
  const double scale = double(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;
  const double center = (o + 0.5) * scale;
  int xmin = std::max(int(center - support + 0.5), 0);
  int xmax = std::min(int(center + support + 0.5), in_size);
  w->clear();
  double sum = 0.0;
  for (int x = xmin; x < xmax; ++x) {
    double wt = cubic((x + 0.5 - center) / filterscale, a);
    w->push_back(wt);
    sum += wt;
  }
  if (sum != 0.0)
    for (auto& wt : *w) wt /= sum;
  *xmin_out = xmin;
}

void cv2_row(int in_size, int out_size, int o, int* xmin_out,
             std::vector<double>* w) {
  const double a = -0.75;
  const double scale = double(in_size) / out_size;
  const double fx = (o + 0.5) * scale - 0.5;
  const int sx = int(std::floor(fx));
  const double frac = fx - sx;
  // replicate border: accumulate out-of-range taps onto edge pixels
  int xmin = std::min(std::max(sx - 1, 0), in_size - 1);
  int xmax = std::min(std::max(sx + 2, 0), in_size - 1);
  *xmin_out = xmin;
  w->assign(size_t(xmax - xmin + 1), 0.0);
  const double taps[4] = {1.0 + frac, frac, 1.0 - frac, 2.0 - frac};
  for (int k = 0; k < 4; ++k) {
    int t = sx - 1 + k;
    int tc = std::min(std::max(t, 0), in_size - 1);
    (*w)[size_t(tc - xmin)] += cubic(taps[k], a);
  }
}

struct Op1D {
  std::vector<int> xmin;                // per output index
  std::vector<std::vector<double>> w;   // per output index
};

Op1D build_op(int in_size, int out_size, int mode) {
  Op1D op;
  op.xmin.resize(size_t(out_size));
  op.w.resize(size_t(out_size));
  for (int o = 0; o < out_size; ++o) {
    if (mode == 0)
      pil_row(in_size, out_size, o, &op.xmin[size_t(o)], &op.w[size_t(o)]);
    else
      cv2_row(in_size, out_size, o, &op.xmin[size_t(o)], &op.w[size_t(o)]);
  }
  return op;
}

inline uint8_t clip8_half_up(double v) {
  // PIL fixed-point clip8: round half UP, clamp to [0, 255].
  double r = std::floor(v + 0.5);
  return uint8_t(std::min(std::max(r, 0.0), 255.0));
}

}  // namespace

extern "C" {

// src (sh, sw, c) f32 → dst (dh, dw, c) f32. mode: 0=pil, 1=cv2.
void crfr_resize_bicubic_f32(const float* src, int sh, int sw, int c,
                             float* dst, int dh, int dw, int mode) {
  Op1D row_op = build_op(sh, dh, mode);
  Op1D col_op = build_op(sw, dw, mode);
  // horizontal pass → tmp (sh, dw, c)
  std::vector<double> tmp(size_t(sh) * dw * c);
  for (int i = 0; i < sh; ++i)
    for (int o = 0; o < dw; ++o) {
      const auto& w = col_op.w[size_t(o)];
      const int x0 = col_op.xmin[size_t(o)];
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (size_t k = 0; k < w.size(); ++k)
          acc += w[k] * src[(size_t(i) * sw + x0 + k) * c + ch];
        tmp[(size_t(i) * dw + o) * c + ch] = acc;
      }
    }
  // vertical pass
  for (int o = 0; o < dh; ++o) {
    const auto& w = row_op.w[size_t(o)];
    const int y0 = row_op.xmin[size_t(o)];
    for (int j = 0; j < dw; ++j)
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (size_t k = 0; k < w.size(); ++k)
          acc += w[k] * tmp[((y0 + k) * size_t(dw) + j) * c + ch];
        dst[(size_t(o) * dw + j) * c + ch] = float(acc);
      }
  }
}

// PIL 8bpc semantics: horizontal-first with uint8 intermediate (half-up).
void crfr_resize_bicubic_u8(const uint8_t* src, int sh, int sw, int c,
                            uint8_t* dst, int dh, int dw, int mode) {
  Op1D row_op = build_op(sh, dh, mode);
  Op1D col_op = build_op(sw, dw, mode);
  std::vector<uint8_t> tmp(size_t(sh) * dw * c);
  for (int i = 0; i < sh; ++i)
    for (int o = 0; o < dw; ++o) {
      const auto& w = col_op.w[size_t(o)];
      const int x0 = col_op.xmin[size_t(o)];
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (size_t k = 0; k < w.size(); ++k)
          acc += w[k] * src[(size_t(i) * sw + x0 + k) * c + ch];
        tmp[(size_t(i) * dw + o) * c + ch] = clip8_half_up(acc);
      }
    }
  for (int o = 0; o < dh; ++o) {
    const auto& w = row_op.w[size_t(o)];
    const int y0 = row_op.xmin[size_t(o)];
    for (int j = 0; j < dw; ++j)
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (size_t k = 0; k < w.size(); ++k)
          acc += w[k] * tmp[((y0 + k) * size_t(dw) + j) * c + ch];
        dst[(size_t(o) * dw + j) * c + ch] = clip8_half_up(acc);
      }
  }
}

// Inverse-map bilinear warp; m is the FORWARD 2x3 matrix (src→dst), row
// major [a b tx; c d ty]; border constant 0 — matches crfr/ops/warp.py.
void crfr_warp_affine_f32(const float* src, int sh, int sw, int c,
                          const float* m, float* dst, int dh, int dw) {
  const double a = m[0], b = m[1], tx = m[2];
  const double cc = m[3], d = m[4], ty = m[5];
  const double det = a * d - b * cc;
  const double ia = d / det, ib = -b / det;
  const double ic = -cc / det, id = a / det;
  const double itx = -(ia * tx + ib * ty);
  const double ity = -(ic * tx + id * ty);
  for (int y = 0; y < dh; ++y)
    for (int x = 0; x < dw; ++x) {
      const double xs = ia * x + ib * y + itx;
      const double ys = ic * x + id * y + ity;
      const int x0 = int(std::floor(xs));
      const int y0 = int(std::floor(ys));
      const double fx = xs - x0, fy = ys - y0;
      for (int ch = 0; ch < c; ++ch) {
        auto fetch = [&](int yy, int xx) -> double {
          if (yy < 0 || yy >= sh || xx < 0 || xx >= sw) return 0.0;
          return src[(size_t(yy) * sw + xx) * c + ch];
        };
        const double top = fetch(y0, x0) * (1 - fx) + fetch(y0, x0 + 1) * fx;
        const double bot =
            fetch(y0 + 1, x0) * (1 - fx) + fetch(y0 + 1, x0 + 1) * fx;
        dst[(size_t(y) * dw + x) * c + ch] = float(top * (1 - fy) + bot * fy);
      }
    }
}

// Centered closed-form non-reflective similarity solve (matches
// crfr/ops/similarity.py::_solve_nonreflective). src, dst: (n, 2) f32;
// out: 2x3 row-major forward matrix.
void crfr_solve_similarity(const float* src, const float* dst, int n,
                           float* out) {
  double msx = 0, msy = 0, mdx = 0, mdy = 0;
  for (int i = 0; i < n; ++i) {
    msx += src[2 * i];
    msy += src[2 * i + 1];
    mdx += dst[2 * i];
    mdy += dst[2 * i + 1];
  }
  msx /= n; msy /= n; mdx /= n; mdy /= n;
  double num_a = 0, num_b = 0, den = 0;
  for (int i = 0; i < n; ++i) {
    const double x = src[2 * i] - msx, y = src[2 * i + 1] - msy;
    const double u = dst[2 * i] - mdx, v = dst[2 * i + 1] - mdy;
    num_a += x * u + y * v;
    num_b += x * v - y * u;
    den += x * x + y * y;
  }
  const double a = num_a / den, b = num_b / den;
  out[0] = float(a);
  out[1] = float(-b);
  out[2] = float(mdx - (a * msx - b * msy));
  out[3] = float(b);
  out[4] = float(a);
  out[5] = float(mdy - (b * msx + a * msy));
}

// Fused 5-pt alignment: landmarks (5,2) vs template (5,2) → warp src u8
// image into out (out_size, out_size, c) u8 (values rounded half-up).
void crfr_align_crop_u8(const uint8_t* src, int sh, int sw, int c,
                        const float* landmarks, const float* tmpl,
                        uint8_t* out, int out_size) {
  float m[6];
  crfr_solve_similarity(landmarks, tmpl, 5, m);
  std::vector<float> srcf(size_t(sh) * sw * c);
  for (size_t i = 0; i < srcf.size(); ++i) srcf[i] = float(src[i]);
  std::vector<float> dstf(size_t(out_size) * out_size * c);
  crfr_warp_affine_f32(srcf.data(), sh, sw, c, m, dstf.data(), out_size,
                       out_size);
  for (size_t i = 0; i < dstf.size(); ++i) out[i] = clip8_half_up(dstf[i]);
}

void crfr_normalize_u8(const uint8_t* src, long long n, float* dst) {
  constexpr float kScale = 1.0f / 128.0f;
  for (long long i = 0; i < n; ++i) dst[i] = (float(src[i]) - 127.5f) * kScale;
}

int crfr_native_abi_version() { return 1; }

}  // extern "C"
