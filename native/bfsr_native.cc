// bfsr_native: C++ host-side data-pipeline kernels.
//
// The reference feeds its GPU from torch DataLoader worker processes doing
// PIL/interpolate work in Python (LINF-LP/train.py:36, wrappers.py).  On
// TPU VMs the input pipeline runs on host CPU and must keep up with the
// accelerator; these kernels implement the wrapper hot loops natively
// (OpenMP, GIL released via ctypes) behind numpy-compatible C ABI calls:
//
//   * bilinear_resize_f32   — torch F.interpolate(bilinear) semantics
//   * updownup_residual_f32 — the fused lr_up / up-down-up residual chain
//                             (wrappers.py:132-134) in one pass
//   * bicubic_resize_f32    — MATLAB-imresize (antialiased) float path
//
// Build: make -C native   (g++ -O3 -fopenmp -shared)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

namespace {

struct AxisTap {
  int i0, i1;
  float w1;
};

// torch align_corners=false mapping: src = (i + 0.5) * in/out - 0.5
static void make_axis_taps(int in_size, int out_size, bool align_corners,
                           std::vector<AxisTap>& taps) {
  taps.resize(out_size);
  for (int i = 0; i < out_size; ++i) {
    double src;
    if (align_corners && out_size > 1) {
      src = static_cast<double>(i) * (in_size - 1) / (out_size - 1);
    } else {
      src = (i + 0.5) * (static_cast<double>(in_size) / out_size) - 0.5;
    }
    src = std::min(std::max(src, 0.0), static_cast<double>(in_size - 1));
    int i0 = static_cast<int>(std::floor(src));
    int i1 = std::min(i0 + 1, in_size - 1);
    taps[i] = {i0, i1, static_cast<float>(src - i0)};
  }
}

}  // namespace

// src: (H, W, C) f32 row-major -> dst: (OH, OW, C)
void bilinear_resize_f32(const float* src, int H, int W, int C, float* dst,
                         int OH, int OW, int align_corners) {
  std::vector<AxisTap> ty, tx;
  make_axis_taps(H, OH, align_corners != 0, ty);
  make_axis_taps(W, OW, align_corners != 0, tx);
#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < OH; ++oy) {
    const AxisTap& ay = ty[oy];
    const float* row0 = src + static_cast<int64_t>(ay.i0) * W * C;
    const float* row1 = src + static_cast<int64_t>(ay.i1) * W * C;
    float* out = dst + static_cast<int64_t>(oy) * OW * C;
    for (int ox = 0; ox < OW; ++ox) {
      const AxisTap& ax = tx[ox];
      const float wy = ay.w1, wx = ax.w1;
      const float* p00 = row0 + ax.i0 * C;
      const float* p01 = row0 + ax.i1 * C;
      const float* p10 = row1 + ax.i0 * C;
      const float* p11 = row1 + ax.i1 * C;
      for (int c = 0; c < C; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        out[ox * C + c] = top + (bot - top) * wy;
      }
    }
  }
}

// Fused residual chain: given normalized LR (h, w, C) produce
// lr_up (H, W, C) and residual = lr_up - up(down(lr_up)) in one call.
void updownup_residual_f32(const float* lr, int h, int w, int C, int H, int W,
                           float* lr_up, float* residual) {
  bilinear_resize_f32(lr, h, w, C, lr_up, H, W, 0);
  std::vector<float> down(static_cast<size_t>(h) * w * C);
  bilinear_resize_f32(lr_up, H, W, C, down.data(), h, w, 0);
  std::vector<float> up2(static_cast<size_t>(H) * W * C);
  bilinear_resize_f32(down.data(), h, w, C, up2.data(), H, W, 0);
  const int64_t n = static_cast<int64_t>(H) * W * C;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) residual[i] = lr_up[i] - up2[i];
}

namespace {

static double cubic_kernel(double x) {
  double ax = std::fabs(x);
  if (ax <= 1.0) return 1.5 * ax * ax * ax - 2.5 * ax * ax + 1.0;
  if (ax <= 2.0) return -0.5 * ax * ax * ax + 2.5 * ax * ax - 4.0 * ax + 2.0;
  return 0.0;
}

struct MatlabTaps {
  std::vector<int> idx;     // (out, taps)
  std::vector<double> wts;  // (out, taps)
  int taps;
};

// MATLAB contributions (antialiased bicubic), symmetric boundary.
static void matlab_contributions(int in_len, int out_len, double scale,
                                 MatlabTaps& t) {
  const double kw = scale < 1.0 ? 4.0 / scale : 4.0;
  const int P = static_cast<int>(std::ceil(kw)) + 2;
  t.taps = P;
  t.idx.resize(static_cast<size_t>(out_len) * P);
  t.wts.resize(static_cast<size_t>(out_len) * P);
  for (int o = 0; o < out_len; ++o) {
    double u = (o + 1) / scale + 0.5 * (1.0 - 1.0 / scale);
    double left = std::floor(u - kw / 2.0);
    double sum = 0.0;
    for (int p = 0; p < P; ++p) {
      int ind = static_cast<int>(left) + p - 1;
      double x = u - ind - 1;
      double wv = scale < 1.0 ? scale * cubic_kernel(scale * x) : cubic_kernel(x);
      t.wts[o * P + p] = wv;
      sum += wv;
      // symmetric (mirror-no-repeat) boundary
      int m = ind;
      int period = 2 * in_len;
      m = ((m % period) + period) % period;
      if (m >= in_len) m = period - 1 - m;
      t.idx[o * P + p] = m;
    }
    for (int p = 0; p < P; ++p) t.wts[o * P + p] /= sum;
  }
}

}  // namespace

// MATLAB-imresize bicubic on (H, W, C) f32 -> (OH, OW, C).
void bicubic_resize_f32(const float* src, int H, int W, int C, float* dst,
                        int OH, int OW) {
  const double sy = static_cast<double>(OH) / H;
  const double sx = static_cast<double>(OW) / W;
  MatlabTaps ty, tx;
  matlab_contributions(H, OH, sy, ty);
  matlab_contributions(W, OW, sx, tx);

  // process smaller-scale axis first (matches the reference order)
  const bool rows_first = sy <= sx;
  std::vector<float> tmp;
  if (rows_first) {
    tmp.resize(static_cast<size_t>(OH) * W * C);
#pragma omp parallel for schedule(static)
    for (int oy = 0; oy < OH; ++oy) {
      for (int x = 0; x < W; ++x) {
        for (int c = 0; c < C; ++c) {
          double acc = 0;
          for (int p = 0; p < ty.taps; ++p) {
            acc += ty.wts[oy * ty.taps + p] *
                   src[(static_cast<int64_t>(ty.idx[oy * ty.taps + p]) * W + x) * C + c];
          }
          tmp[(static_cast<int64_t>(oy) * W + x) * C + c] = static_cast<float>(acc);
        }
      }
    }
#pragma omp parallel for schedule(static)
    for (int oy = 0; oy < OH; ++oy) {
      for (int ox = 0; ox < OW; ++ox) {
        for (int c = 0; c < C; ++c) {
          double acc = 0;
          for (int p = 0; p < tx.taps; ++p) {
            acc += tx.wts[ox * tx.taps + p] *
                   tmp[(static_cast<int64_t>(oy) * W + tx.idx[ox * tx.taps + p]) * C + c];
          }
          dst[(static_cast<int64_t>(oy) * OW + ox) * C + c] = static_cast<float>(acc);
        }
      }
    }
  } else {
    tmp.resize(static_cast<size_t>(H) * OW * C);
#pragma omp parallel for schedule(static)
    for (int y = 0; y < H; ++y) {
      for (int ox = 0; ox < OW; ++ox) {
        for (int c = 0; c < C; ++c) {
          double acc = 0;
          for (int p = 0; p < tx.taps; ++p) {
            acc += tx.wts[ox * tx.taps + p] *
                   src[(static_cast<int64_t>(y) * W + tx.idx[ox * tx.taps + p]) * C + c];
          }
          tmp[(static_cast<int64_t>(y) * OW + ox) * C + c] = static_cast<float>(acc);
        }
      }
    }
#pragma omp parallel for schedule(static)
    for (int oy = 0; oy < OH; ++oy) {
      for (int ox = 0; ox < OW; ++ox) {
        for (int c = 0; c < C; ++c) {
          double acc = 0;
          for (int p = 0; p < ty.taps; ++p) {
            acc += ty.wts[oy * ty.taps + p] *
                   tmp[(static_cast<int64_t>(ty.idx[oy * ty.taps + p]) * OW + ox) * C + c];
          }
          dst[(static_cast<int64_t>(oy) * OW + ox) * C + c] = static_cast<float>(acc);
        }
      }
    }
  }
}

int bfsr_native_version() { return 1; }

}  // extern "C"
