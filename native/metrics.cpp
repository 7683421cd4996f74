// Native PSNR/SSIM metric kernels (OpenMP).
//
// TPU-native framework runtime component: the reference computes its
// headline PSNR/SSIM metrics with skimage inside a python ThreadPool
// (reference: evaluate.py:53-65). skimage's C loops are replaced here by a
// standalone C++ kernel (separable box filters, OpenMP over images in the
// batch) bound via ctypes — no skimage dependency, identical math:
//   * PSNR: 10*log10(R^2 / MSE) over all pixels, data_range R
//   * SSIM: uniform 7x7 window, unbiased covariance (N/(N-1)),
//     K1=0.01, K2=0.03, 'reflect' (symmetric) padding, border crop win/2,
//     channel-averaged (multichannel=True)
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC metrics.cpp -o libstitchax_metrics.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// separable box filter with symmetric ("reflect") padding, window w (odd)
void box_filter(const double* src, double* dst, int H, int W, int win,
                double* tmp) {
  const int r = win / 2;
  // horizontal pass -> tmp
  for (int y = 0; y < H; ++y) {
    const double* row = src + (size_t)y * W;
    double* out = tmp + (size_t)y * W;
    double acc = 0.0;
    // initial window covering x in [-r, r] with symmetric reflect
    for (int k = -r; k <= r; ++k) {
      int x = k < 0 ? -k - 1 : k;
      if (x >= W) x = 2 * W - x - 1;
      acc += row[x];
    }
    out[0] = acc;
    for (int x = 1; x < W; ++x) {
      int add = x + r;
      if (add >= W) add = 2 * W - add - 1;
      int sub = x - r - 1;
      if (sub < 0) sub = -sub - 1;
      acc += row[add] - row[sub];
      out[x] = acc;
    }
  }
  // vertical pass -> dst
  std::vector<double> col_acc(W, 0.0);
  for (int x = 0; x < W; ++x) col_acc[x] = 0.0;
  for (int k = -r; k <= r; ++k) {
    int y = k < 0 ? -k - 1 : k;
    if (y >= H) y = 2 * H - y - 1;
    const double* row = tmp + (size_t)y * W;
    for (int x = 0; x < W; ++x) col_acc[x] += row[x];
  }
  const double inv = 1.0 / ((double)win * win);
  for (int x = 0; x < W; ++x) dst[x] = col_acc[x] * inv;
  for (int y = 1; y < H; ++y) {
    int add = y + r;
    if (add >= H) add = 2 * H - add - 1;
    int sub = y - r - 1;
    if (sub < 0) sub = -sub - 1;
    const double* radd = tmp + (size_t)add * W;
    const double* rsub = tmp + (size_t)sub * W;
    double* out = dst + (size_t)y * W;
    for (int x = 0; x < W; ++x) {
      col_acc[x] += radd[x] - rsub[x];
      out[x] = col_acc[x] * inv;
    }
  }
}

double ssim_channel(const double* a, const double* b, int H, int W, int win,
                    double data_range) {
  const size_t n = (size_t)H * W;
  std::vector<double> ux(n), uy(n), uxx(n), uyy(n), uxy(n), tmp(n), prod(n);

  box_filter(a, ux.data(), H, W, win, tmp.data());
  box_filter(b, uy.data(), H, W, win, tmp.data());
  for (size_t i = 0; i < n; ++i) prod[i] = a[i] * a[i];
  box_filter(prod.data(), uxx.data(), H, W, win, tmp.data());
  for (size_t i = 0; i < n; ++i) prod[i] = b[i] * b[i];
  box_filter(prod.data(), uyy.data(), H, W, win, tmp.data());
  for (size_t i = 0; i < n; ++i) prod[i] = a[i] * b[i];
  box_filter(prod.data(), uxy.data(), H, W, win, tmp.data());

  const double NP = (double)win * win;
  const double cov_norm = NP / (NP - 1.0);
  const double C1 = (0.01 * data_range) * (0.01 * data_range);
  const double C2 = (0.03 * data_range) * (0.03 * data_range);

  const int pad = (win - 1) / 2;
  double sum = 0.0;
  size_t cnt = 0;
  for (int y = pad; y < H - pad; ++y) {
    for (int x = pad; x < W - pad; ++x) {
      const size_t i = (size_t)y * W + x;
      const double vx = cov_norm * (uxx[i] - ux[i] * ux[i]);
      const double vy = cov_norm * (uyy[i] - uy[i] * uy[i]);
      const double vxy = cov_norm * (uxy[i] - ux[i] * uy[i]);
      const double A1 = 2.0 * ux[i] * uy[i] + C1;
      const double A2 = 2.0 * vxy + C2;
      const double B1 = ux[i] * ux[i] + uy[i] * uy[i] + C1;
      const double B2 = vx + vy + C2;
      sum += (A1 * A2) / (B1 * B2);
      ++cnt;
    }
  }
  return cnt ? sum / (double)cnt : 0.0;
}

}  // namespace

extern "C" {

// img1/img2: uint8 (B, H, W, C); out: (B,) doubles
void psnr_u8_batch(const uint8_t* img1, const uint8_t* img2, int B, int H,
                   int W, int C, double data_range, double* out) {
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < B; ++b) {
    const size_t n = (size_t)H * W * C;
    const uint8_t* a = img1 + (size_t)b * n;
    const uint8_t* c = img2 + (size_t)b * n;
    double mse = 0.0;
    for (size_t i = 0; i < n; ++i) {
      const double d = (double)a[i] - (double)c[i];
      mse += d * d;
    }
    mse /= (double)n;
    out[b] = mse <= 0.0 ? INFINITY
                        : 10.0 * std::log10(data_range * data_range / mse);
  }
}

void ssim_u8_batch(const uint8_t* img1, const uint8_t* img2, int B, int H,
                   int W, int C, int win, double data_range, double* out) {
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < B; ++b) {
    const size_t plane = (size_t)H * W;
    std::vector<double> a(plane), c(plane);
    double total = 0.0;
    for (int ch = 0; ch < C; ++ch) {
      const uint8_t* p1 = img1 + ((size_t)b * plane * C);
      const uint8_t* p2 = img2 + ((size_t)b * plane * C);
      for (size_t i = 0; i < plane; ++i) {
        a[i] = (double)p1[i * C + ch];
        c[i] = (double)p2[i * C + ch];
      }
      total += ssim_channel(a.data(), c.data(), H, W, win, data_range);
    }
    out[b] = total / (double)C;
  }
}

}  // extern "C"
