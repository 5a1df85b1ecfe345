// Native data-pipeline kernels for semi_seg_ecg_tpu.
//
// The per-sample host preprocessing the framework runs between disk and the
// TPU (SURVEY hot-loop #5: scipy sosfiltfilt / FFT resampling inside
// __getitem__) is implemented here as a dependency-free C++17 shared
// library, exposed to Python over ctypes (semi_seg_ecg_tpu/data/native.py).
// Semantics mirror the scipy functions the transform library specifies:
//
//   ecg_sosfiltfilt       == scipy.signal.sosfiltfilt (odd padding, default
//                            padlen, sosfilt_zi steady-state init)
//   ecg_resample_fourier  == scipy.signal.resample for real input (rfft,
//                            spectrum truncate/zero-pad with Nyquist
//                            handling, irfft, num/Nx scaling); arbitrary
//                            lengths via Bluestein chirp-z FFT
//   ecg_resample_nearest/_zero == scipy.interpolate.interp1d kind=
//                            'nearest'/'zero' sampled at linspace(0, n-1, m)
//   ecg_standardize       == transforms.Standardize (z-norm, 0-where-std-0)
//
// Build: `make -C native` → libecgdata.so. Correctness is pinned by
// tests/test_native.py golden comparisons against scipy.

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

using cplx = std::complex<double>;
static const double PI = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// FFT: iterative radix-2 + Bluestein for arbitrary sizes
// ---------------------------------------------------------------------------

static void fft_pow2(std::vector<cplx>& a, bool invert) {
  const size_t n = a.size();
  if (n <= 1) return;
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2 * PI / double(len) * (invert ? 1 : -1);
    const cplx wlen(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      cplx w(1.0);
      for (size_t k = 0; k < len / 2; k++) {
        cplx u = a[i + k];
        cplx v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (invert) {
    for (auto& x : a) x /= double(n);
  }
}

static bool is_pow2(size_t n) { return n && !(n & (n - 1)); }

// arbitrary-length DFT via Bluestein's chirp-z transform
static void fft_any(std::vector<cplx>& a, bool invert) {
  const size_t n = a.size();
  if (n <= 1) return;
  if (is_pow2(n)) {
    fft_pow2(a, invert);
    return;
  }
  const double sign = invert ? 1.0 : -1.0;
  // chirp: w[k] = exp(sign * i * pi * k^2 / n)
  std::vector<cplx> w(n);
  for (size_t k = 0; k < n; k++) {
    // k^2 mod 2n to keep the angle accurate for large k
    const uint64_t k2 = (uint64_t(k) * k) % (2 * uint64_t(n));
    const double ang = sign * PI * double(k2) / double(n);
    w[k] = cplx(std::cos(ang), std::sin(ang));
  }
  size_t m = 1;
  while (m < 2 * n - 1) m <<= 1;
  std::vector<cplx> fa(m, cplx(0)), fb(m, cplx(0));
  for (size_t k = 0; k < n; k++) fa[k] = a[k] * w[k];
  fb[0] = std::conj(w[0]);
  for (size_t k = 1; k < n; k++) {
    fb[k] = fb[m - k] = std::conj(w[k]);
  }
  fft_pow2(fa, false);
  fft_pow2(fb, false);
  for (size_t k = 0; k < m; k++) fa[k] *= fb[k];
  fft_pow2(fa, true);
  for (size_t k = 0; k < n; k++) a[k] = fa[k] * w[k];
  if (invert) {
    for (auto& x : a) x /= double(n);
  }
}

// ---------------------------------------------------------------------------
// Fourier resampling (scipy.signal.resample, real path)
// ---------------------------------------------------------------------------

extern "C" void ecg_resample_fourier(const double* x, int64_t n, double* out,
                                     int64_t m) {
  if (n == m) {
    std::memcpy(out, x, size_t(n) * sizeof(double));
    return;
  }
  // rfft of x (via complex fft; fine for the few-thousand-sample signals)
  std::vector<cplx> X(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; i++) X[size_t(i)] = cplx(x[i], 0.0);
  fft_any(X, false);

  const int64_t nhalf = n / 2 + 1;
  const int64_t mhalf = m / 2 + 1;
  std::vector<cplx> Y(static_cast<size_t>(mhalf), cplx(0));
  const int64_t N = std::min(n, m);
  const int64_t nyq = N / 2 + 1;
  for (int64_t i = 0; i < nyq && i < nhalf; i++) Y[size_t(i)] = X[size_t(i)];
  if (N % 2 == 0) {
    if (m < n) {
      // fold the retained Nyquist bin (scipy: Y[N/2] += conj-symmetric half)
      Y[size_t(N / 2)] *= 2.0;
      // select the real part of the folded bin
      Y[size_t(N / 2)] = cplx(Y[size_t(N / 2)].real(), 0.0);
    } else {  // m > n: split the original Nyquist bin
      Y[size_t(N / 2)] *= 0.5;
    }
  }
  // irfft(Y, m): build the full hermitian spectrum and inverse-FFT
  std::vector<cplx> full(static_cast<size_t>(m), cplx(0));
  for (int64_t i = 0; i < mhalf; i++) full[size_t(i)] = Y[size_t(i)];
  for (int64_t i = 1; i < mhalf - ((m % 2 == 0) ? 1 : 0); i++) {
    full[size_t(m - i)] = std::conj(Y[size_t(i)]);
  }
  if (m % 2 == 0) {
    // Nyquist bin must be real in a hermitian spectrum
    full[size_t(m / 2)] = cplx(full[size_t(m / 2)].real(), 0.0);
  }
  fft_any(full, true);
  const double scale = double(m) / double(n);
  for (int64_t i = 0; i < m; i++) out[i] = full[size_t(i)].real() * scale;
}

// ---------------------------------------------------------------------------
// SOS filtering (scipy.signal.sosfilt / sosfilt_zi / sosfiltfilt)
// ---------------------------------------------------------------------------

// one direct-form-II-transposed pass over the cascade; zi shape (nsec, 2)
static void sosfilt_inplace(const double* sos, int nsec, double* x, int64_t n,
                            double* zi) {
  for (int s = 0; s < nsec; s++) {
    const double b0 = sos[s * 6 + 0], b1 = sos[s * 6 + 1], b2 = sos[s * 6 + 2];
    const double a1 = sos[s * 6 + 4], a2 = sos[s * 6 + 5];
    double z0 = zi[s * 2 + 0], z1 = zi[s * 2 + 1];
    for (int64_t i = 0; i < n; i++) {
      const double xi = x[i];
      const double yi = b0 * xi + z0;
      z0 = b1 * xi - a1 * yi + z1;
      z1 = b2 * xi - a2 * yi;
      x[i] = yi;
    }
    zi[s * 2 + 0] = z0;
    zi[s * 2 + 1] = z1;
  }
}

// steady-state initial conditions per section (scipy.signal.sosfilt_zi)
static void sosfilt_zi(const double* sos, int nsec, double* zi) {
  double scale = 1.0;
  for (int s = 0; s < nsec; s++) {
    const double b0 = sos[s * 6 + 0], b1 = sos[s * 6 + 1], b2 = sos[s * 6 + 2];
    const double a1 = sos[s * 6 + 4], a2 = sos[s * 6 + 5];
    const double h = (b0 + b1 + b2) / (1.0 + a1 + a2);  // DC gain
    // steady state of DF2T with x == 1, y == h
    const double z1 = b2 - a2 * h;
    const double z0 = b1 - a1 * h + z1;
    zi[s * 2 + 0] = scale * z0;
    zi[s * 2 + 1] = scale * z1;
    scale *= h;
  }
}

extern "C" void ecg_sosfiltfilt(const double* sos, int nsec, const double* x,
                                int64_t n, double* out) {
  // default padlen (scipy _validate_pad for sosfiltfilt)
  int nz_b = 0, nz_a = 0;
  for (int s = 0; s < nsec; s++) {
    if (sos[s * 6 + 2] == 0.0) nz_b++;
    if (sos[s * 6 + 5] == 0.0) nz_a++;
  }
  const int64_t padlen = 3 * (2 * int64_t(nsec) + 1 - std::min(nz_b, nz_a));
  const int64_t ext_n = n + 2 * padlen;
  std::vector<double> ext(static_cast<size_t>(ext_n));
  // odd extension: 2*x[0] - x[padlen..1], x, 2*x[n-1] - x[n-2..]
  for (int64_t i = 0; i < padlen; i++) {
    ext[size_t(i)] = 2.0 * x[0] - x[padlen - i];
  }
  std::memcpy(ext.data() + padlen, x, size_t(n) * sizeof(double));
  for (int64_t i = 0; i < padlen; i++) {
    ext[size_t(n + padlen + i)] = 2.0 * x[n - 1] - x[n - 2 - i];
  }

  std::vector<double> zi0(static_cast<size_t>(nsec) * 2), zi(static_cast<size_t>(nsec) * 2);
  sosfilt_zi(sos, nsec, zi0.data());
  // forward pass
  for (int s = 0; s < nsec; s++) {
    zi[s * 2] = zi0[s * 2] * ext[0];
    zi[s * 2 + 1] = zi0[s * 2 + 1] * ext[0];
  }
  sosfilt_inplace(sos, nsec, ext.data(), ext_n, zi.data());
  // reverse
  std::reverse(ext.begin(), ext.end());
  for (int s = 0; s < nsec; s++) {
    zi[s * 2] = zi0[s * 2] * ext[0];
    zi[s * 2 + 1] = zi0[s * 2 + 1] * ext[0];
  }
  sosfilt_inplace(sos, nsec, ext.data(), ext_n, zi.data());
  std::reverse(ext.begin(), ext.end());
  std::memcpy(out, ext.data() + padlen, size_t(n) * sizeof(double));
}

// ---------------------------------------------------------------------------
// Label resizing (interp1d 'nearest' / 'zero' at linspace(0, n-1, m))
// ---------------------------------------------------------------------------

extern "C" void ecg_resample_nearest(const double* y, int64_t n, double* out,
                                     int64_t m) {
  const double step = (m > 1) ? double(n - 1) / double(m - 1) : 0.0;
  for (int64_t i = 0; i < m; i++) {
    const double t = double(i) * step;
    // scipy 'nearest': boundaries at midpoints, searchsorted side='left'
    // → exact midpoints resolve to the LEFT neighbour
    int64_t idx = int64_t(std::ceil(t - 0.5));
    idx = std::max<int64_t>(0, std::min<int64_t>(n - 1, idx));
    out[i] = y[idx];
  }
}

extern "C" void ecg_resample_zero(const double* y, int64_t n, double* out,
                                  int64_t m) {
  // positions follow np.linspace(0, n-1, m): compute each as a single
  // product-quotient so the LAST position is exactly n-1 — the factored
  // form i*((n-1)/(m-1)) can round a hair below and pick y[n-2] where
  // scipy's interp1d(kind='zero') picks y[n-1]
  for (int64_t i = 0; i < m; i++) {
    double t = (m > 1) ? double(i) * double(n - 1) / double(m - 1) : 0.0;
    if (i == m - 1) t = double(n - 1);
    int64_t idx = int64_t(std::floor(t));
    idx = std::max<int64_t>(0, std::min<int64_t>(n - 1, idx));
    out[i] = y[idx];
  }
}

// ---------------------------------------------------------------------------
// Standardize (z-norm with zero-std guard) → float32
// ---------------------------------------------------------------------------

extern "C" void ecg_standardize(const double* x, int64_t n, double* out) {
  double mean = 0.0;
  for (int64_t i = 0; i < n; i++) mean += x[i];
  mean /= double(n);
  double var = 0.0;
  for (int64_t i = 0; i < n; i++) {
    const double d = x[i] - mean;
    var += d * d;
  }
  var /= double(n);
  const double std = std::sqrt(var);
  if (std == 0.0) {
    std::memset(out, 0, size_t(n) * sizeof(double));
    return;
  }
  const double inv = 1.0 / std;
  for (int64_t i = 0; i < n; i++) out[i] = (x[i] - mean) * inv;
}

extern "C" int ecg_native_abi_version() { return 1; }
