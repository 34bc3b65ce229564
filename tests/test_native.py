"""Native (C++) ingestion kernels == their float64 NumPy sources of truth.

The NumPy implementations in geo/rpc.py and geo/geodesy.py stay the
reference semantics (they are what the parity suite validates against the
upstream math); brdfnerf_tpu.native re-implements the hot ones in C++ and
these tests pin the two paths together.  Skips cleanly when the native
library cannot build (no g++ / BRDFNERF_NO_NATIVE=1)."""

import numpy as np
import pytest

from brdfnerf_tpu.geo import rpc as rpc_mod
from brdfnerf_tpu.geo import geodesy

from test_geo import _pleiades_like_rpc

native = pytest.importorskip("brdfnerf_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native kernel library unavailable")


@pytest.fixture(scope="module")
def rpc():
    return _pleiades_like_rpc()[0]


def _force_numpy(monkeypatch):
    """Disable the native dispatch inside geo/rpc so the NumPy body runs."""
    monkeypatch.setattr(rpc_mod, "_native_kernels", lambda n: None)


def test_localization_native_equals_numpy(rpc, monkeypatch):
    rng = np.random.default_rng(0)
    col = rng.uniform(0.0, 40000.0, 4096)
    row = rng.uniform(0.0, 40000.0, 4096)
    alt = rng.uniform(600.0, 1100.0, 4096)
    lon_n, lat_n = native.localization(rpc, col, row, alt)
    _force_numpy(monkeypatch)
    lon_p, lat_p = rpc_mod.localization_np(rpc, col, row, alt)
    # both Newton solves converge to tol=1e-12 normalized; 1e-11 deg is
    # ~1 micrometre on the ground (observed agreement ~1e-14)
    np.testing.assert_allclose(lon_n, lon_p, atol=1e-11, rtol=0)
    np.testing.assert_allclose(lat_n, lat_p, atol=1e-11, rtol=0)


def test_localization_scalar_alt_broadcast(rpc, monkeypatch):
    col = np.linspace(100.0, 39000.0, 2048)
    row = np.linspace(200.0, 38000.0, 2048)
    lon_n, lat_n = native.localization(rpc, col, row, 850.0)
    _force_numpy(monkeypatch)
    lon_p, lat_p = rpc_mod.localization_np(rpc, col, row, 850.0)
    np.testing.assert_allclose(lon_n, lon_p, atol=1e-11, rtol=0)
    np.testing.assert_allclose(lat_n, lat_p, atol=1e-11, rtol=0)


def test_localization_scalar_row_broadcast(rpc, monkeypatch):
    """A scalar row with a large col batch must broadcast, not read past
    the 1-element buffer (review finding r3)."""
    col = np.linspace(100.0, 39000.0, 2048)
    lon_n, lat_n = rpc_mod.localization_np(rpc, col, 512.5, 800.0)
    _force_numpy(monkeypatch)
    lon_p, lat_p = rpc_mod.localization_np(rpc, col, 512.5, 800.0)
    np.testing.assert_allclose(lon_n, lon_p, atol=1e-11, rtol=0)
    np.testing.assert_allclose(lat_n, lat_p, atol=1e-11, rtol=0)


def test_localization_numpy_scalar_row_above_block(rpc, monkeypatch):
    """NumPy fallback with a scalar row and a batch LARGER than the
    blocking size: the mutual broadcast must happen before the block
    split or the second block slices an empty row array (review r3)."""
    _force_numpy(monkeypatch)
    col = np.linspace(100.0, 39000.0, 5000)
    lon, lat = rpc_mod.localization_np(rpc, col, 512.5, 800.0, block=4096)
    lon_1, lat_1 = rpc_mod.localization_np(
        rpc, col, np.full_like(col, 512.5), 800.0, block=4096)
    np.testing.assert_array_equal(lon, lon_1)
    np.testing.assert_array_equal(lat, lat_1)


def test_utm_mutual_broadcast():
    """(N,1) lats x (M,) lons broadcast to a grid through the native
    dispatch exactly like the NumPy path (review finding r3)."""
    lats = np.linspace(10.9, 11.4, 64).reshape(-1, 1)
    lons = np.linspace(42.5, 43.0, 32)
    e_n, n_n = geodesy.utm_from_latlon(lats, lons, zone=38, southern=False)
    assert e_n.shape == (64, 32)
    # forced-NumPy truth via small slices (size < dispatch threshold)
    e_p, n_p = geodesy.utm_from_latlon(lats[:8], lons, zone=38,
                                       southern=False)
    np.testing.assert_allclose(e_n[:8], e_p, atol=1e-6, rtol=0)
    np.testing.assert_allclose(n_n[:8], n_p, atol=1e-6, rtol=0)


def test_projection_native_equals_numpy(rpc, monkeypatch):
    rng = np.random.default_rng(1)
    lon = rpc.lon_offset + rpc.lon_scale * rng.uniform(-1, 1, 4096)
    lat = rpc.lat_offset + rpc.lat_scale * rng.uniform(-1, 1, 4096)
    alt = rpc.alt_offset + rpc.alt_scale * rng.uniform(-1, 1, 4096)
    c_n, r_n = native.projection(rpc, lon, lat, alt)
    _force_numpy(monkeypatch)
    c_p, r_p = rpc_mod.projection_np(rpc, lon, lat, alt)
    np.testing.assert_allclose(c_n, c_p, atol=1e-9, rtol=0)
    np.testing.assert_allclose(r_n, r_p, atol=1e-9, rtol=0)


def test_native_roundtrip_subpixel(rpc):
    """localization -> projection closes to far below a pixel through the
    native path alone (the inversion contract, not just twin equality)."""
    rng = np.random.default_rng(2)
    col = rng.uniform(0.0, 40000.0, 2048)
    row = rng.uniform(0.0, 40000.0, 2048)
    alt = rng.uniform(600.0, 1100.0, 2048)
    lon, lat = native.localization(rpc, col, row, alt)
    c2, r2 = native.projection(rpc, lon, lat, alt)
    assert np.max(np.abs(c2 - col)) < 1e-6
    assert np.max(np.abs(r2 - row)) < 1e-6


def test_dispatch_path_is_engaged(rpc):
    """localization_np on a big batch goes through the native kernel (the
    production ingestion path) and still matches a small-batch (NumPy)
    evaluation point-for-point."""
    assert rpc_mod._native_kernels(4096) is not None
    col = np.linspace(500.0, 39500.0, 1024)
    row = np.linspace(400.0, 39400.0, 1024)
    lon_big, lat_big = rpc_mod.localization_np(rpc, col, row, 900.0)
    # below _NATIVE_MIN_POINTS the same call runs the NumPy body
    lon_s, lat_s = rpc_mod.localization_np(rpc, col[:256], row[:256], 900.0)
    np.testing.assert_allclose(lon_big[:256], lon_s, atol=1e-11, rtol=0)
    np.testing.assert_allclose(lat_big[:256], lat_s, atol=1e-11, rtol=0)


def _bumpy_dsm_pair(size=160, nan_frac=0.08, seed=0):
    rng = np.random.default_rng(seed)
    a = np.cumsum(rng.standard_normal((size, size)), axis=0) / 8.0 + 900.0
    b = np.roll(a, (2, -3), (0, 1)) + rng.standard_normal((size, size)) * 0.05
    a = a.copy()
    a[rng.random((size, size)) < nan_frac] = np.nan
    b[rng.random((size, size)) < nan_frac] = np.nan
    return a, b


def test_registration_native_equals_numpy(monkeypatch):
    """compute_shift through the native NCC kernel == forced-NumPy path:
    identical integer shift, z-mapping (a, b) to fp-rounding."""
    from brdfnerf_tpu.geo import registration as reg
    u, v = _bumpy_dsm_pair()
    assert reg._native_kernels(u.size) is not None  # dispatch engaged
    s_nat = reg.compute_shift(u, v)
    monkeypatch.setattr(reg, "_native_kernels", lambda n: None)
    s_np = reg.compute_shift(u, v)
    assert (s_nat[0], s_nat[1]) == (s_np[0], s_np[1])
    np.testing.assert_allclose(s_nat[2], s_np[2], rtol=1e-10)
    np.testing.assert_allclose(s_nat[3], s_np[3], atol=1e-8)


def test_masked_stats_native_equals_numpy(monkeypatch):
    from brdfnerf_tpu.geo import registration as reg
    u, v = _bumpy_dsm_pair(seed=3)
    got = reg.masked_stats(u, v, dx=2, dy=-1)
    monkeypatch.setattr(reg, "_native_kernels", lambda n: None)
    want = reg.masked_stats(u, v, dx=2, dy=-1)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_registration_native_unequal_shapes(monkeypatch):
    """u and v of different shapes (the gdal-crop path can produce these)
    agree with the NumPy overlap semantics."""
    from brdfnerf_tpu.geo import registration as reg
    u, v = _bumpy_dsm_pair(size=170, seed=5)
    v = v[:150, :162]
    got = reg.search_shift(u, v, irange=4)
    monkeypatch.setattr(reg, "_native_kernels", lambda n: None)
    want = reg.search_shift(u, v, irange=4)
    assert got == want


def test_registration_all_nan_overlap():
    """Degenerate all-NaN input returns without dividing by zero."""
    from brdfnerf_tpu.geo import registration as reg
    u = np.full((160, 160), np.nan)
    v = np.full((160, 160), np.nan)
    stats = reg.masked_stats(u, v)
    assert stats == (0.0, 0.0, 0.0, 0.0, 0.0)


@pytest.mark.parametrize("southern", [False, True])
def test_utm_forward_native_equals_numpy(southern):
    rng = np.random.default_rng(3)
    sign = -1.0 if southern else 1.0
    lats = sign * rng.uniform(10.5, 11.7, 2048)
    lons = rng.uniform(42.2, 43.3, 2048)
    zone, _ = geodesy.utm_zone_from_latlon(float(lats[0]), float(lons[0]))
    lon0 = np.radians(zone * 6.0 - 183.0)
    e_n, n_n = native.utm_forward(
        lats, lons, lon0, geodesy._E, geodesy._K0 * geodesy._A_CAP,
        np.asarray(geodesy._ALPHA), 10000000.0 if southern else 0.0)
    # NumPy source of truth: small batch avoids the dispatch (size < 512)
    e_p = np.empty_like(e_n)
    n_p = np.empty_like(n_n)
    for i in range(0, lats.size, 256):
        s = slice(i, i + 256)
        e_p[s], n_p[s] = geodesy.utm_from_latlon(
            lats[s], lons[s], zone=zone, southern=southern)
    np.testing.assert_allclose(e_n, e_p, atol=1e-6, rtol=0)
    np.testing.assert_allclose(n_n, n_p, atol=1e-6, rtol=0)


def test_utm_dispatch_path(monkeypatch):
    """utm_from_latlon dispatches big batches natively with identical
    results to the forced-NumPy evaluation."""
    lats = np.linspace(10.9, 11.4, 1024)
    lons = np.linspace(42.5, 43.0, 1024)
    e_n, n_n = geodesy.utm_from_latlon(lats, lons, zone=38, southern=False)

    import brdfnerf_tpu.native as nat
    monkeypatch.setattr(nat, "available", lambda: False)
    e_p, n_p = geodesy.utm_from_latlon(lats, lons, zone=38, southern=False)
    np.testing.assert_allclose(e_n, e_p, atol=1e-6, rtol=0)
    np.testing.assert_allclose(n_n, n_p, atol=1e-6, rtol=0)
