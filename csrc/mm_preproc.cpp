// Native multimodal image preprocessing.
//
// Ref: rust/sglang-mm (native image pipeline: decode -> resize ->
// normalize, off the Python GIL) and HF image processors'
// PIL-resample semantics. This implements PIL's exact fixed-point
// separable resampling (ImagingResampleHorizontal_8bpc /
// precompute_coeffs from Pillow's Resample.c algorithm, re-derived
// from the published algorithm description) so the native path is
// byte-identical to the PIL path the parity tests pin against, plus
// a fused u8 HWC -> f32 CHW mean/std normalize.
//
// Exposed C ABI (ctypes, see sglang_tpu/multimodal/native.py):
//   mm_resize_u8(in, ih, iw, c, out, oh, ow, filter)   filter: 0=bilinear 1=bicubic
//   mm_normalize_chw(in u8 HWC, h, w, c, mean[c], std[c], out f32 CHW)
//
// Threaded over rows with a tiny pool: preprocessing runs on the host
// while the TPU computes; wall clock here is pure latency.

#include <cmath>
#include <cstdint>
#include <functional>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

constexpr int PRECISION_BITS = 32 - 8 - 2;  // PIL's 8bpc fixed point

static inline double filt_bilinear(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

static inline double filt_bicubic(double x) {
  // Keys cubic, a = -0.5 (PIL's BICUBIC)
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Coeffs {
  std::vector<int> bounds;  // [out, 2] = (xmin, xcount)
  std::vector<int32_t> kk;  // [out, ksize] fixed-point weights
  int ksize = 0;
};

// PIL precompute_coeffs for the full-image box.
static Coeffs precompute(int in_size, int out_size, int filter) {
  double support0 = filter == 1 ? 2.0 : 1.0;
  double (*ff)(double) = filter == 1 ? filt_bicubic : filt_bilinear;
  double scale = (double)in_size / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = support0 * filterscale;
  int ksize = (int)std::ceil(support) * 2 + 1;

  Coeffs co;
  co.ksize = ksize;
  co.bounds.resize(out_size * 2);
  co.kk.assign((size_t)out_size * ksize, 0);
  std::vector<double> k(ksize);
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = (int)std::max(0.0, std::floor(center - support));
    int xmax = (int)std::min((double)in_size, std::ceil(center + support));
    int n = xmax - xmin;
    for (int x = 0; x < n; x++) {
      double w = ff((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (int x = 0; x < n; x++) {
      if (ww != 0.0) k[x] /= ww;
      co.kk[(size_t)xx * ksize + x] =
          (int32_t)(k[x] < 0 ? -0.5 + k[x] * (1 << PRECISION_BITS)
                             : 0.5 + k[x] * (1 << PRECISION_BITS));
    }
    co.bounds[xx * 2] = xmin;
    co.bounds[xx * 2 + 1] = n;
  }
  return co;
}

static inline uint8_t clip8(int64_t v) {
  v >>= PRECISION_BITS;
  return (uint8_t)std::min<int64_t>(255, std::max<int64_t>(0, v));
}

static void run_rows(int nrows, const std::function<void(int, int)>& body) {
  unsigned hw = std::thread::hardware_concurrency();
  int nthreads = (int)std::min<unsigned>(hw ? hw : 1, 8);
  if (nrows < 64 || nthreads <= 1) {
    body(0, nrows);
    return;
  }
  std::vector<std::thread> ts;
  int chunk = (nrows + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; t++) {
    int lo = t * chunk, hi = std::min(nrows, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(body, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// in: u8 [ih, iw, c] -> out: u8 [oh, ow, c]; filter 0=bilinear 1=bicubic.
// Returns 0 on success.
int mm_resize_u8(const uint8_t* in, int ih, int iw, int c, uint8_t* out,
                 int oh, int ow, int filter) {
  if (ih <= 0 || iw <= 0 || oh <= 0 || ow <= 0 || c <= 0 || c > 16)
    return -1;
  // Horizontal pass: [ih, iw, c] -> [ih, ow, c]
  std::vector<uint8_t> tmp;
  const uint8_t* hsrc = in;
  int th = ih;
  bool need_h = (ow != iw);
  bool need_v = (oh != ih);
  if (need_h) {
    Coeffs co = precompute(iw, ow, filter);
    tmp.resize((size_t)ih * ow * c);
    uint8_t* dst = need_v ? tmp.data() : out;
    if (!need_v) dst = out;
    run_rows(ih, [&](int lo, int hi) {
      for (int y = lo; y < hi; y++) {
        const uint8_t* row = in + (size_t)y * iw * c;
        uint8_t* orow = dst + (size_t)y * ow * c;
        for (int xx = 0; xx < ow; xx++) {
          int xmin = co.bounds[xx * 2], n = co.bounds[xx * 2 + 1];
          const int32_t* k = &co.kk[(size_t)xx * co.ksize];
          for (int ch = 0; ch < c; ch++) {
            int64_t ss = 1 << (PRECISION_BITS - 1);
            for (int x = 0; x < n; x++)
              ss += (int64_t)row[(size_t)(x + xmin) * c + ch] * k[x];
            orow[(size_t)xx * c + ch] = clip8(ss);
          }
        }
      }
    });
    hsrc = need_v ? tmp.data() : out;
  }
  int tw = need_h ? ow : iw;
  if (need_v) {
    Coeffs co = precompute(ih, oh, filter);
    run_rows(oh, [&](int lo, int hi) {
      for (int yy = lo; yy < hi; yy++) {
        int ymin = co.bounds[yy * 2], n = co.bounds[yy * 2 + 1];
        const int32_t* k = &co.kk[(size_t)yy * co.ksize];
        uint8_t* orow = out + (size_t)yy * ow * c;
        for (int x = 0; x < tw * c; x++) {
          int64_t ss = 1 << (PRECISION_BITS - 1);
          for (int y = 0; y < n; y++)
            ss += (int64_t)hsrc[(size_t)(y + ymin) * tw * c + x] * k[y];
          orow[x] = clip8(ss);
        }
      }
    });
  } else if (!need_h) {
    std::memcpy(out, in, (size_t)ih * iw * c);
  }
  return 0;
}

// u8 [h, w, c] -> f32 [c, h, w], out[ch] = (px/255 - mean[ch]) / std[ch]
int mm_normalize_chw(const uint8_t* in, int h, int w, int c,
                     const float* mean, const float* stdv, float* out) {
  if (h <= 0 || w <= 0 || c <= 0 || c > 16) return -1;
  // Per-channel LUT: 256 entries beats recomputing the affine per pixel.
  std::vector<float> lut((size_t)c * 256);
  for (int ch = 0; ch < c; ch++) {
    float inv = 1.0f / stdv[ch];
    for (int v = 0; v < 256; v++)
      lut[(size_t)ch * 256 + v] = ((float)v / 255.0f - mean[ch]) * inv;
  }
  run_rows(h, [&](int lo, int hi) {
    for (int y = lo; y < hi; y++) {
      const uint8_t* row = in + (size_t)y * w * c;
      for (int ch = 0; ch < c; ch++) {
        const float* l = &lut[(size_t)ch * 256];
        float* orow = out + ((size_t)ch * h + y) * w;
        for (int x = 0; x < w; x++) orow[x] = l[row[(size_t)x * c + ch]];
      }
    }
  });
  return 0;
}

}  // extern "C"
