// bumpnative — native (C++) runtime kernels for bumpcosmology_tpu.
//
// The reference's only native-code dependency is LALSuite (C), used for the
// per-injection frequency-domain waveform + SNR evaluation inside a fork pool
// (reference src/scripts/mock_injections.py:51-78,142).  This library is the
// framework's native equivalent:
//
//   * phenom-A amplitude + analytic design PSDs + multi-detector network SNR
//     over an injection batch (OpenMP-parallel) — used as a CPU oracle to
//     cross-check the on-device JAX/XLA kernel, and as a host fallback when
//     no accelerator is attached;
//   * an O(1)-per-draw alias-method weighted resampler for 10^7-scale
//     importance resampling at ingestion (reference weighting.py:102,164
//     uses numpy rng.choice with p=..., which materializes a full CDF per
//     call).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
//
// Build: make -C native   (produces native/build/libbumpnative.so)

#include <cmath>
#include <cstdint>
#include <random>
#include <vector>

namespace {

constexpr double kMsunS = 4.925490947641267e-6;  // G Msun / c^3 [s]
constexpr double kCSi = 2.99792458e8;            // [m/s]
constexpr double kGpcM = 3.0856775814913673e25;  // [m]
constexpr double kPi = 3.14159265358979323846;

// PhenomA transition-frequency polynomials (Ajith et al. 2008, Table I):
// f_X = (a eta^2 + b eta + c) / (pi M_total[s]).
struct Poly3 {
  double a, b, c;
  double operator()(double eta, double m_total_s) const {
    return (a * eta * eta + b * eta + c) / (kPi * m_total_s);
  }
};
constexpr Poly3 kFMerg{2.9740e-1, 4.4810e-2, 9.5560e-2};
constexpr Poly3 kFRing{5.9411e-1, 8.9794e-2, 1.9111e-1};
constexpr Poly3 kSigma{5.0801e-1, 7.7515e-2, 2.2369e-2};
constexpr Poly3 kFCut{8.4845e-1, 1.2848e-1, 2.7299e-1};

// aLIGO design analytic fit (Ajith 2011), amplitude-calibrated to the
// published P1200087 BNS range (kAligoRangeCalibration = (220/181)^2 —
// must match bumpcosmology_tpu/mock/psd.py::_ALIGO_RANGE_CALIBRATION).
constexpr double kAligoRangeCalibration = (220.0 / 181.0) * (220.0 / 181.0);

double aligo_psd(double f, double f_low) {
  if (f < f_low) return INFINITY;
  const double x = f / 215.0;
  const double x2 = x * x;
  const double s =
      1e-49 * kAligoRangeCalibration *
      (std::pow(x, -4.14) - 5.0 / x2 +
       111.0 * (1.0 - x2 + 0.5 * x2 * x2) / (1.0 + 0.5 * x2));
  return s > 0 ? s : INFINITY;
}

constexpr double kAdvAmplitudeRatio = 0.55;  // AdV/aLIGO design range ratio

// |h(f)| of the PhenomA piecewise amplitude, optimally oriented [1/Hz].
double phenom_a_amp(double f, double m1, double m2, double dl_gpc) {
  const double m_total = m1 + m2;
  const double eta = m1 * m2 / (m_total * m_total);
  const double m_total_s = m_total * kMsunS;
  const double mc_s = std::pow(m1 * m2, 0.6) / std::pow(m_total, 0.2) * kMsunS;

  const double f_merg = kFMerg(eta, m_total_s);
  const double f_ring = kFRing(eta, m_total_s);
  const double sigma = kSigma(eta, m_total_s);
  const double f_cut = kFCut(eta, m_total_s);
  if (f <= 0.0 || f >= f_cut) return 0.0;

  const double a_newt = std::sqrt(5.0 / 24.0) * std::pow(kPi, -2.0 / 3.0) *
                        std::pow(mc_s, 5.0 / 6.0) * (kCSi / (dl_gpc * kGpcM));
  const double x = f / f_merg;
  double shape;
  if (f < f_merg) {
    shape = std::pow(x, -7.0 / 6.0);
  } else if (f < f_ring) {
    shape = std::pow(x, -2.0 / 3.0);
  } else {
    const double hw = 0.5 * sigma;
    const double lor = hw * hw / ((f - f_ring) * (f - f_ring) + hw * hw);
    shape = std::pow(f_ring / f_merg, -2.0 / 3.0) * lor;
  }
  return a_newt * std::pow(f_merg, -7.0 / 6.0) * shape;
}

struct Vec3 {
  double x, y, z;
};

Vec3 arm_vector(double lat, double lon, double azi) {
  // azimuth clockwise from North (compass), radians
  const double east_x = -std::sin(lon), east_y = std::cos(lon), east_z = 0.0;
  const double north_x = -std::sin(lat) * std::cos(lon);
  const double north_y = -std::sin(lat) * std::sin(lon);
  const double north_z = std::cos(lat);
  const double c = std::cos(azi), s = std::sin(azi);
  return {north_x * c + east_x * s, north_y * c + east_y * s,
          north_z * c + east_z * s};
}

struct Detector {
  double d[3][3];  // response tensor
};

Detector make_detector(double lat_deg, double lon_deg, double xazi_deg,
                       double yazi_deg) {
  const double deg = kPi / 180.0;
  const Vec3 u = arm_vector(lat_deg * deg, lon_deg * deg, xazi_deg * deg);
  const Vec3 v = arm_vector(lat_deg * deg, lon_deg * deg, yazi_deg * deg);
  const double uu[3] = {u.x, u.y, u.z};
  const double vv[3] = {v.x, v.y, v.z};
  Detector out{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      out.d[i][j] = 0.5 * (uu[i] * uu[j] - vv[i] * vv[j]);
  return out;
}

// Same site parameters as bumpcosmology_tpu/mock/detector.py
const Detector kDetectors[3] = {
    make_detector(46.4552, -119.4077, 324.0006, 234.0006),  // H1
    make_detector(30.5629, -90.7742, 252.2835, 162.2835),   // L1
    make_detector(43.6314, 10.5045, 70.5674, 160.5674),     // V1
};

void antenna_pattern(const Detector& det, double ra, double dec, double psi,
                     double gmst, double* fplus, double* fcross) {
  const double ell = ra - gmst;
  const double sd = std::sin(dec), cd = std::cos(dec);
  const double sl = std::sin(ell), cl = std::cos(ell);
  const double u[3] = {-sd * cl, -sd * sl, cd};
  const double v[3] = {-sl, cl, 0.0};
  const double cp = std::cos(psi), sp = std::sin(psi);
  double ex[3], ey[3];
  for (int i = 0; i < 3; ++i) {
    ex[i] = u[i] * cp + v[i] * sp;
    ey[i] = -u[i] * sp + v[i] * cp;
  }
  double dx[3] = {0, 0, 0}, dy[3] = {0, 0, 0};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      dx[i] += ex[j] * det.d[j][i];
      dy[i] += ey[j] * det.d[j][i];
    }
  double fp = 0, fc = 0;
  for (int i = 0; i < 3; ++i) {
    fp += dx[i] * ex[i] - dy[i] * ey[i];
    fc += dx[i] * ey[i] + dy[i] * ex[i];
  }
  *fplus = fp;
  *fcross = fc;
}

}  // namespace

extern "C" {

// Network SNR for a batch of injections on a log-spaced frequency grid.
// Inputs are length-n arrays; out_snr is (n, 4): H1, L1, V1, network.
void bumpnative_network_snr(const double* m1_det, const double* m2_det,
                            const double* dl_gpc, const double* iota,
                            const double* ra, const double* dec,
                            const double* psi, const double* gmst,
                            int64_t n, double f_min, double f_max, int n_f,
                            double* out_snr) {
  std::vector<double> f(n_f), df(n_f - 1);
  const double log_lo = std::log(f_min), log_hi = std::log(f_max);
  for (int k = 0; k < n_f; ++k)
    f[k] = std::exp(log_lo + (log_hi - log_lo) * k / (n_f - 1));
  for (int k = 0; k + 1 < n_f; ++k) df[k] = f[k + 1] - f[k];

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    // frequency integral of A(f)^2 / S_det(f), per detector family
    double integral_aligo = 0.0;
    std::vector<double> integrand(n_f);
    for (int k = 0; k < n_f; ++k) {
      const double a = phenom_a_amp(f[k], m1_det[i], m2_det[i], dl_gpc[i]);
      const double s = aligo_psd(f[k], f_min);
      integrand[k] = std::isinf(s) ? 0.0 : a * a / s;
    }
    for (int k = 0; k + 1 < n_f; ++k)
      integral_aligo += 0.5 * df[k] * (integrand[k] + integrand[k + 1]);
    const double integral_v1 =
        integral_aligo * (kAdvAmplitudeRatio * kAdvAmplitudeRatio);

    const double ci = std::cos(iota[i]);
    const double plus_fac = 0.25 * (1.0 + ci * ci) * (1.0 + ci * ci);
    const double cross_fac = ci * ci;

    double net2 = 0.0;
    for (int d = 0; d < 3; ++d) {
      double fp, fc;
      antenna_pattern(kDetectors[d], ra[i], dec[i], psi[i], gmst[i], &fp, &fc);
      const double proj = fp * fp * plus_fac + fc * fc * cross_fac;
      const double integral = (d == 2) ? integral_v1 : integral_aligo;
      const double rho2 = 4.0 * proj * integral;
      out_snr[i * 4 + d] = std::sqrt(rho2);
      net2 += rho2;
    }
    out_snr[i * 4 + 3] = std::sqrt(net2);
  }
}

// Walker alias-method weighted sampling: draw k indices from weights[0..n).
// O(n) setup + O(1) per draw; deterministic given seed.
void bumpnative_alias_sample(const double* weights, int64_t n, int64_t k,
                             uint64_t seed, int64_t* out_idx) {
  double total = 0.0;
  for (int64_t i = 0; i < n; ++i) total += weights[i];

  std::vector<double> prob(n);
  std::vector<int64_t> alias(n, 0);
  std::vector<int64_t> small, large;
  small.reserve(n);
  large.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    prob[i] = weights[i] * n / total;
    (prob[i] < 1.0 ? small : large).push_back(i);
  }
  while (!small.empty() && !large.empty()) {
    const int64_t s = small.back();
    small.pop_back();
    const int64_t l = large.back();
    large.pop_back();
    alias[s] = l;
    prob[l] = (prob[l] + prob[s]) - 1.0;
    (prob[l] < 1.0 ? small : large).push_back(l);
  }
  while (!large.empty()) {
    prob[large.back()] = 1.0;
    large.pop_back();
  }
  while (!small.empty()) {
    prob[small.back()] = 1.0;
    small.pop_back();
  }

  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  for (int64_t j = 0; j < k; ++j) {
    const int64_t i = static_cast<int64_t>(unif(rng) * n) % n;
    out_idx[j] = unif(rng) < prob[i] ? i : alias[i];
  }
}

// Library version tag (for binding sanity checks).
int bumpnative_abi_version() { return 1; }

}  // extern "C"
