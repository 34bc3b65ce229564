"""Geodesy + RPC tests: round-trips and closed-form oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from brdfnerf_tpu.geo import (
    latlon_to_ecef, ecef_to_latlon, utm_from_latlon, latlon_from_utm,
    utm_zone_from_latlon, sun_direction, scaling_params, rpc_from_dict,
)
from brdfnerf_tpu.geo import rpc as rpc_mod


def test_ecef_latlon_roundtrip():
    lats = np.asarray([0.0, 45.0, -33.5, 48.8462])
    lons = np.asarray([0.0, 2.35, 151.2, 2.3464])
    alts = np.asarray([0.0, 100.0, 1500.0, 35.0])
    # float64 NumPy inputs: these are the HOST-side geodesy functions
    # whose documented contract is f64 (|ECEF| ~ 6.4e6 m exceeds f32
    # precision); jnp inputs would downcast and test the wrong regime
    x, y, z = latlon_to_ecef(lats, lons, alts)
    la, lo, al = ecef_to_latlon(x, y, z)
    np.testing.assert_allclose(np.asarray(la), lats, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lo), lons, atol=1e-9)
    np.testing.assert_allclose(np.asarray(al), alts, atol=1e-4)


def test_ecef_known_point():
    # equator/greenwich at 0 alt -> (a, 0, 0)
    x, y, z = latlon_to_ecef(jnp.asarray(0.0), jnp.asarray(0.0),
                             jnp.asarray(0.0))
    np.testing.assert_allclose(float(x), 6378137.0, rtol=1e-9)
    np.testing.assert_allclose(float(y), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(z), 0.0, atol=1e-6)


def test_utm_zone():
    assert utm_zone_from_latlon(48.85, 2.35)[0] == 31
    assert utm_zone_from_latlon(40.7, -74.0)[0] == 18
    assert utm_zone_from_latlon(-33.9, 151.2)[0] == 56


def test_utm_roundtrip_and_known_values():
    # well-known control point: zone 31N, lat 48.8462 lon 2.3464 (Paris)
    e, n = utm_from_latlon(jnp.asarray([48.8462]), jnp.asarray([2.3464]))
    # oracle: Snyder ellipsoidal TM formulas evaluated in float64
    # (E=452047.162, N=5410564.737); float32 rounding dominates tolerance
    np.testing.assert_allclose(float(e[0]), 452047.16, atol=3.0)
    np.testing.assert_allclose(float(n[0]), 5410564.74, atol=3.0)
    la, lo = latlon_from_utm(e, n, 31, northern=True)
    np.testing.assert_allclose(float(la[0]), 48.8462, atol=1e-4)
    np.testing.assert_allclose(float(lo[0]), 2.3464, atol=1e-4)


def test_utm_southern_hemisphere_roundtrip():
    e, n = utm_from_latlon(jnp.asarray([-33.9]), jnp.asarray([151.2]))
    assert float(n[0]) > 6e6  # false northing applied
    la, lo = latlon_from_utm(e, n, 56, northern=False)
    np.testing.assert_allclose(float(la[0]), -33.9, atol=1e-4)
    np.testing.assert_allclose(float(lo[0]), 151.2, atol=1e-4)


def test_sun_direction_formula():
    d = np.asarray(sun_direction(30.0, 45.0))
    el, az = np.radians(30.0), np.radians(45.0)
    ref = np.asarray([np.sin(az) * np.cos(el), np.cos(az) * np.cos(el),
                      np.sin(el)])
    np.testing.assert_allclose(d, ref / np.linalg.norm(ref), rtol=1e-6)


def test_scaling_params():
    s, o = scaling_params([0.0, 10.0, 4.0])
    assert s == 5.0 and o == 5.0


def _affine_rpc():
    """Synthetic RPC that is exactly affine: col = 1000 + 5000*nlon,
    row = 1000 - 5000*nlat (denominators == 1)."""
    num_col = [0.0] * 20
    num_col[1] = 1.0   # y = nlon
    num_row = [0.0] * 20
    num_row[2] = -1.0  # x = nlat
    den = [0.0] * 20
    den[0] = 1.0
    return rpc_from_dict(dict(
        row_offset=1000.0, col_offset=1000.0, lat_offset=48.0,
        lon_offset=2.0, alt_offset=100.0, row_scale=5000.0, col_scale=5000.0,
        lat_scale=0.1, lon_scale=0.1, alt_scale=500.0,
        row_num=num_row, row_den=den, col_num=num_col, col_den=den))


def test_rpc_projection_affine_oracle():
    rpc = _affine_rpc()
    col, row = rpc_mod.projection(rpc, jnp.asarray(2.05), jnp.asarray(47.95),
                                  jnp.asarray(100.0))
    # float32 eval of the rational polynomial: ~1e-5 relative rounding
    np.testing.assert_allclose(float(col), 1000.0 + 5000.0 * 0.5, rtol=5e-5)
    np.testing.assert_allclose(float(row), 1000.0 + 5000.0 * 0.5, rtol=5e-5)


def test_rpc_localization_inverts_projection():
    rpc = _affine_rpc()
    lon0 = jnp.asarray([2.03, 1.98, 2.0])
    lat0 = jnp.asarray([48.01, 47.99, 48.05])
    alt = jnp.asarray([120.0, 80.0, 100.0])
    col, row = rpc_mod.projection(rpc, lon0, lat0, alt)
    lon, lat = rpc_mod.localization(rpc, col, row, alt)
    np.testing.assert_allclose(np.asarray(lon), np.asarray(lon0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat0), atol=1e-6)


def test_rpc_localization_nonlinear():
    """Add mild nonlinear terms; Newton should still invert to sub-pixel."""
    rpc = _affine_rpc()
    num_col = np.asarray(rpc.col_num).copy()
    num_col[4] = 0.01   # y*x cross term
    num_col[7] = 0.02   # y^2
    rpc = rpc._replace(col_num=jnp.asarray(num_col))
    lon0 = jnp.asarray([2.02, 1.97])
    lat0 = jnp.asarray([48.03, 47.96])
    alt = jnp.asarray([100.0, 150.0])
    col, row = rpc_mod.projection(rpc, lon0, lat0, alt)
    lon, lat = rpc_mod.localization(rpc, col, row, alt)
    col2, row2 = rpc_mod.projection(rpc, lon, lat, alt)
    np.testing.assert_allclose(np.asarray(col2), np.asarray(col), atol=1e-3)
    np.testing.assert_allclose(np.asarray(row2), np.asarray(row), atol=1e-3)


def test_rpc_rescale():
    rpc = _affine_rpc()
    r2 = rpc_mod.rescale_rpc(rpc, 0.5)
    assert float(r2.col_scale) == 2500.0
    assert float(r2.row_offset) == 500.0
