// Native host-side ingestion kernels: batched RPC Newton localization,
// RPC projection, and the Karney-Krueger UTM forward series.
//
// Why native: dataset ingestion evaluates the inverse RPC for EVERY pixel
// of every image (two altitudes per ray — reference semantics:
// datasets/satellite_rgb_dep.py:46-61 call rpcm.localization per pixel).
// The NumPy path (geo/rpc.localization_np) already blocks the solve into
// cache-resident GEMMs, but it still materializes a (P,20) monomial design
// matrix + ~15 temporaries per Newton iteration.  Here each iteration is
// register-resident: points are processed in SIMD-width lanes (fixed-size
// inner loops the compiler vectorizes) with per-block early exit, and
// blocks fan out over OpenMP threads on multi-core hosts.
//
// Math parity: term order and normalization follow geo/rpc._poly20
// (RPC00B convention, x=nlat y=nlon z=nalt — rpcm apply_poly order), the
// Jacobian is the same quotient-rule analytic form, and the UTM series
// uses the identical 6th-order alpha coefficients (geo/geodesy._ALPHA) —
// equality vs the NumPy twins is asserted in tests/test_native.py.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC (driven lazily by
// brdfnerf_tpu/native/__init__.py; any failure falls back to NumPy).

#include <cmath>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kLanes = 8;  // points per SIMD-friendly inner loop

// RPC00B cubic + d/dx + d/dy at one normalized point (x=nlat, y=nlon,
// z=nalt).  ~60 fused ops; everything stays in registers.
inline void poly20_vjp(const double* __restrict c, double x, double y,
                       double z, double& p, double& px, double& py) {
  const double xy = x * y, yz = y * z, xz = x * z;
  const double xx = x * x, yy = y * y, zz = z * z;
  p = c[0] + c[1] * y + c[2] * x + c[3] * z + c[4] * xy + c[5] * yz +
      c[6] * xz + c[7] * yy + c[8] * xx + c[9] * zz + c[10] * xy * z +
      c[11] * yy * y + c[12] * y * xx + c[13] * y * zz + c[14] * yy * x +
      c[15] * xx * x + c[16] * x * zz + c[17] * yy * z + c[18] * xx * z +
      c[19] * zz * z;
  px = c[2] + c[4] * y + c[6] * z + 2.0 * c[8] * x + c[10] * yz +
       2.0 * c[12] * xy + c[14] * yy + 3.0 * c[15] * xx + c[16] * zz +
       2.0 * c[18] * xz;
  py = c[1] + c[4] * x + c[5] * z + 2.0 * c[7] * y + c[10] * xz +
       3.0 * c[11] * yy + c[12] * xx + c[13] * zz + 2.0 * c[14] * xy +
       2.0 * c[17] * yz;
}

inline double poly20(const double* __restrict c, double x, double y,
                     double z) {
  const double xy = x * y, yz = y * z, xz = x * z;
  const double xx = x * x, yy = y * y, zz = z * z;
  return c[0] + c[1] * y + c[2] * x + c[3] * z + c[4] * xy + c[5] * yz +
         c[6] * xz + c[7] * yy + c[8] * xx + c[9] * zz + c[10] * xy * z +
         c[11] * yy * y + c[12] * y * xx + c[13] * y * zz + c[14] * yy * x +
         c[15] * xx * x + c[16] * x * zz + c[17] * yy * z + c[18] * xx * z +
         c[19] * zz * z;
}

}  // namespace

extern "C" {

// coeffs: [col_num | col_den | row_num | row_den], 80 doubles.
// offs_scales: {col_off, col_scl, row_off, row_scl,
//               lon_off, lon_scl, lat_off, lat_scl, alt_off, alt_scl}.
// Writes lon/lat in degrees.  Matches geo/rpc.localization_np (Newton,
// analytic Jacobian, identical det regularization + convergence rule).
void rpc_localization_f64(const double* __restrict coeffs,
                          const double* __restrict offs_scales,
                          const double* __restrict col,
                          const double* __restrict row,
                          const double* __restrict alt, int64_t n, int iters,
                          double tol, double* __restrict lon,
                          double* __restrict lat) {
  const double* cn = coeffs + 0;
  const double* cd = coeffs + 20;
  const double* rn = coeffs + 40;
  const double* rd = coeffs + 60;
  const double col_off = offs_scales[0], col_scl = offs_scales[1];
  const double row_off = offs_scales[2], row_scl = offs_scales[3];
  const double lon_off = offs_scales[4], lon_scl = offs_scales[5];
  const double lat_off = offs_scales[6], lat_scl = offs_scales[7];
  const double alt_off = offs_scales[8], alt_scl = offs_scales[9];

#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t base = 0; base < n; base += kLanes) {
    const int m = static_cast<int>(n - base < kLanes ? n - base : kLanes);
    double tc[kLanes], tr[kLanes], z[kLanes], x[kLanes], y[kLanes];
    for (int k = 0; k < m; ++k) {
      tc[k] = (col[base + k] - col_off) / col_scl;
      tr[k] = (row[base + k] - row_off) / row_scl;
      z[k] = (alt[base + k] - alt_off) / alt_scl;
      x[k] = 0.0;
      y[k] = 0.0;
    }
    for (int it = 0; it < iters; ++it) {
      double maxd = 0.0;
      for (int k = 0; k < m; ++k) {
        double ncn, ncn_x, ncn_y, ncd, ncd_x, ncd_y;
        double nrn, nrn_x, nrn_y, nrd, nrd_x, nrd_y;
        poly20_vjp(cn, x[k], y[k], z[k], ncn, ncn_x, ncn_y);
        poly20_vjp(cd, x[k], y[k], z[k], ncd, ncd_x, ncd_y);
        poly20_vjp(rn, x[k], y[k], z[k], nrn, nrn_x, nrn_y);
        poly20_vjp(rd, x[k], y[k], z[k], nrd, nrd_x, nrd_y);
        const double fc = ncn / ncd - tc[k];
        const double fr = nrn / nrd - tr[k];
        const double j_cx = (ncn_x * ncd - ncn * ncd_x) / (ncd * ncd);
        const double j_cy = (ncn_y * ncd - ncn * ncd_y) / (ncd * ncd);
        const double j_rx = (nrn_x * nrd - nrn * nrd_x) / (nrd * nrd);
        const double j_ry = (nrn_y * nrd - nrn * nrd_y) / (nrd * nrd);
        double det = j_cy * j_rx - j_cx * j_ry;
        if (std::fabs(det) < 1e-30) det = 1e-30;
        const double dy = (fc * j_rx - fr * j_cx) / det;
        const double dx = (fr * j_cy - fc * j_ry) / det;
        y[k] -= dy;
        x[k] -= dx;
        const double ad = std::fabs(dx), ady = std::fabs(dy);
        const double d = ad > ady ? ad : ady;
        if (d > maxd) maxd = d;
      }
      if (maxd < tol) break;  // block-level early exit (NumPy twin rule)
    }
    for (int k = 0; k < m; ++k) {
      lon[base + k] = y[k] * lon_scl + lon_off;
      lat[base + k] = x[k] * lat_scl + lat_off;
    }
  }
}

// Direct RPC projection: ground (lon, lat, alt) -> image (col, row).
void rpc_projection_f64(const double* __restrict coeffs,
                        const double* __restrict offs_scales,
                        const double* __restrict lon,
                        const double* __restrict lat,
                        const double* __restrict alt, int64_t n,
                        double* __restrict col, double* __restrict row) {
  const double* cn = coeffs + 0;
  const double* cd = coeffs + 20;
  const double* rn = coeffs + 40;
  const double* rd = coeffs + 60;
  const double col_off = offs_scales[0], col_scl = offs_scales[1];
  const double row_off = offs_scales[2], row_scl = offs_scales[3];
  const double lon_off = offs_scales[4], lon_scl = offs_scales[5];
  const double lat_off = offs_scales[6], lat_scl = offs_scales[7];
  const double alt_off = offs_scales[8], alt_scl = offs_scales[9];

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double y = (lon[i] - lon_off) / lon_scl;
    const double x = (lat[i] - lat_off) / lat_scl;
    const double z = (alt[i] - alt_off) / alt_scl;
    col[i] = poly20(cn, x, y, z) / poly20(cd, x, y, z) * col_scl + col_off;
    row[i] = poly20(rn, x, y, z) / poly20(rd, x, y, z) * row_scl + row_off;
  }
}

// Karney-Krueger 6th-order forward UTM series (geo/geodesy.utm_from_latlon
// math, same alpha coefficients passed in from Python so the two paths
// share one source of truth).  lon0_rad = central meridian; a_cap = k0 *
// rectifying radius; e = WGS84 first eccentricity.
void utm_forward_f64(const double* __restrict lat_deg,
                     const double* __restrict lon_deg, int64_t n,
                     double lon0_rad, double e, double k0_a_cap,
                     const double* __restrict alpha,  // 6 coefficients
                     double false_northing, double* __restrict east,
                     double* __restrict north) {
  constexpr double kDeg2Rad = 0.017453292519943295;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double phi = lat_deg[i] * kDeg2Rad;
    const double lam = lon_deg[i] * kDeg2Rad - lon0_rad;
    const double sp = std::sin(phi);
    const double t = std::sinh(std::atanh(sp) - e * std::atanh(e * sp));
    const double cl = std::cos(lam);
    const double xi_p = std::atan2(t, cl);
    const double eta_p = std::asinh(std::sin(lam) / std::sqrt(t * t + cl * cl));
    // angle-addition recurrence over sin/cos(2j xi_p), sinh/cosh(2j eta_p)
    const double s2 = std::sin(2.0 * xi_p), c2 = std::cos(2.0 * xi_p);
    const double sh2 = std::sinh(2.0 * eta_p), ch2 = std::cosh(2.0 * eta_p);
    double sj = s2, cj = c2, shj = sh2, chj = ch2;
    double xi = xi_p, eta = eta_p;
    for (int j = 0; j < 6; ++j) {
      if (j > 0) {
        const double sn = sj * c2 + cj * s2;
        cj = cj * c2 - sj * s2;
        sj = sn;
        const double shn = shj * ch2 + chj * sh2;
        chj = chj * ch2 + shj * sh2;
        shj = shn;
      }
      xi += alpha[j] * sj * chj;
      eta += alpha[j] * cj * shj;
    }
    east[i] = k0_a_cap * eta + 500000.0;
    north[i] = k0_a_cap * xi + false_northing;
  }
}

// NaN-aware masked sums for the DSM-registration NCC search
// (geo/registration.py — the TPU-native twin of the reference's ONLY
// numba-native component, dsmr.py:6-135).  For every candidate shift
// (dx, dy) in the (2*irange+1)^2 window around (dx0, dy0), accumulates
// over the jointly-finite overlap of u[j, i] and v[j + dy, i + dx]:
//   out[s * 6 + {0..5}] = {count, sum_u, sum_v, sum_uu, sum_vv, sum_uv}
// Python computes means/sigmas/NCC and the argmax from these, preserving
// the reference's scan order and strict-greater tie-breaking.  Shifts fan
// out over OpenMP threads; each shift is ONE fused pass over the overlap
// (the NumPy path pays ~6 masked-reduction passes plus two boolean
// fancy-index copies per shift).
void ncc_masked_sums_f64(const double* __restrict u, int64_t uh, int64_t uw,
                         const double* __restrict v, int64_t vh, int64_t vw,
                         int dx0, int dy0, int irange,
                         double* __restrict out) {
  const int side = 2 * irange + 1;
  const int nshift = side * side;
#pragma omp parallel for schedule(dynamic, 1)
  for (int s = 0; s < nshift; ++s) {
    const int dy = dy0 - irange + s / side;
    const int dx = dx0 - irange + s % side;
    // overlap bounds (geo/registration._overlap semantics)
    const int64_t ui0 = dx < 0 ? -dx : 0;
    const int64_t ui1 = uw < vw - dx ? uw : vw - dx;
    const int64_t uj0 = dy < 0 ? -dy : 0;
    const int64_t uj1 = uh < vh - dy ? uh : vh - dy;
    double cnt = 0.0, su = 0.0, sv = 0.0, suu = 0.0, svv = 0.0, suv = 0.0;
    if (ui1 > ui0 && uj1 > uj0) {
      for (int64_t j = uj0; j < uj1; ++j) {
        const double* __restrict ur = u + j * uw;
        const double* __restrict vr = v + (j + dy) * vw + dx;
        for (int64_t i = ui0; i < ui1; ++i) {
          const double a = ur[i];
          const double b = vr[i];
          if (std::isfinite(a) && std::isfinite(b)) {
            cnt += 1.0;
            su += a;
            sv += b;
            suu += a * a;
            svv += b * b;
            suv += a * b;
          }
        }
      }
    }
    double* o = out + static_cast<int64_t>(s) * 6;
    o[0] = cnt;
    o[1] = su;
    o[2] = sv;
    o[3] = suu;
    o[4] = svv;
    o[5] = suv;
  }
}

int brdfnerf_native_abi_version() { return 2; }

}  // extern "C"
