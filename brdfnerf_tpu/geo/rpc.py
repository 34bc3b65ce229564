"""RPC (rational polynomial coefficient) satellite camera model — batched jnp.

The reference delegates RPC math to the external `rpcm` wheel and calls it
pixel-by-pixel on the host (datasets/satellite.py:18-65 uses
`rpc.localization`), which is the dominant dataset-ingestion cost
(SURVEY.md 3.4).  Here the full model is a jit/vmap-able pytree:

  * projection   : (lon, lat, alt) -> (col, row)   — direct rational polys
  * localization : (col, row, alt) -> (lon, lat)   — Newton inversion with an
    *autodiff* Jacobian (jax.jacfwd of the normalized projection), fixed
    iteration count for static shapes.

Polynomial term ordering and normalization follow the standard RPC00B
convention used by rpcm's `apply_poly` (x=nlat, y=nlon, z=nalt), so RPC
dicts written by the reference's generate_dataset.py (its per-image JSON
"rpc" field, generate_dataset.py:152-163) are consumed unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RPCModel(NamedTuple):
    """All fields are scalars except the four (20,) coefficient vectors."""

    row_offset: jnp.ndarray
    col_offset: jnp.ndarray
    lat_offset: jnp.ndarray
    lon_offset: jnp.ndarray
    alt_offset: jnp.ndarray
    row_scale: jnp.ndarray
    col_scale: jnp.ndarray
    lat_scale: jnp.ndarray
    lon_scale: jnp.ndarray
    alt_scale: jnp.ndarray
    row_num: jnp.ndarray
    row_den: jnp.ndarray
    col_num: jnp.ndarray
    col_den: jnp.ndarray


def rpc_from_dict(d: dict) -> RPCModel:
    """Build from an rpcm-format dict (the JSON "rpc" field).

    Fields are kept as FLOAT64 NumPy arrays: the host-side _np paths
    (ray ingestion, DSM tooling) need full precision — an f32-quantized
    lat/lon offset shifts an image's georeference by up to ~0.4 m,
    independently per view.  The jittable device twins downcast at trace
    time (f32 unless jax_enable_x64), which only affects on-device users."""
    import numpy as np

    def arr(k):
        return np.asarray(d[k], dtype=np.float64)
    return RPCModel(
        row_offset=arr("row_offset"), col_offset=arr("col_offset"),
        lat_offset=arr("lat_offset"), lon_offset=arr("lon_offset"),
        alt_offset=arr("alt_offset"),
        row_scale=arr("row_scale"), col_scale=arr("col_scale"),
        lat_scale=arr("lat_scale"), lon_scale=arr("lon_scale"),
        alt_scale=arr("alt_scale"),
        row_num=arr("row_num"), row_den=arr("row_den"),
        col_num=arr("col_num"), col_den=arr("col_den"),
    )


_RPC00B_FIELD_MAP = {
    # RPC00B / IKONOS-sidecar field -> rpcm-style dict key.  LINE = image
    # row, SAMP = image column; LONG = longitude (the spec's 'L' poly
    # variable), LAT = latitude ('P'), HEIGHT = altitude ('H').
    "LINE_OFF": "row_offset", "SAMP_OFF": "col_offset",
    "LAT_OFF": "lat_offset", "LONG_OFF": "lon_offset",
    "HEIGHT_OFF": "alt_offset",
    "LINE_SCALE": "row_scale", "SAMP_SCALE": "col_scale",
    "LAT_SCALE": "lat_scale", "LONG_SCALE": "lon_scale",
    "HEIGHT_SCALE": "alt_scale",
}
_RPC00B_COEFF_MAP = {
    "LINE_NUM_COEFF": "row_num", "LINE_DEN_COEFF": "row_den",
    "SAMP_NUM_COEFF": "col_num", "SAMP_DEN_COEFF": "col_den",
}


def rpc_dict_from_rpc00b_text(text: str) -> dict:
    """Parse the `_RPC.TXT` sidecar format (IKONOS/WorldView/GeoEye
    vendor products; what rpcm's rpc_from_rpc_file reads) into the
    rpcm-style dict `rpc_from_dict` consumes.

    Lines look like `LINE_OFF: +002486.00 pixels` and
    `LINE_NUM_COEFF_1: +1.154810E-03`; trailing unit words and arbitrary
    whitespace are ignored, keys are case-insensitive, and the 20
    coefficients of each polynomial may appear in any order (indexed by
    their _j suffix, 1-based as in the spec)."""
    scalars: dict = {}
    coeffs = {k: [None] * 20 for k in _RPC00B_COEFF_MAP}
    for line in text.splitlines():
        line = line.strip()
        if not line or ":" not in line:
            continue
        key, _, rest = line.partition(":")
        key = key.strip().upper()
        tok = rest.split()
        if not tok:
            continue
        try:
            val = float(tok[0])
        except ValueError:
            continue
        if key in _RPC00B_FIELD_MAP:
            scalars[_RPC00B_FIELD_MAP[key]] = val
        else:
            base, _, idx = key.rpartition("_")
            if base in _RPC00B_COEFF_MAP and idx.isdigit():
                j = int(idx)
                if 1 <= j <= 20:
                    coeffs[base][j - 1] = val
    missing = [k for k in _RPC00B_FIELD_MAP.values() if k not in scalars]
    for base, vals in coeffs.items():
        holes = [j + 1 for j, v in enumerate(vals) if v is None]
        if holes:
            missing.append(f"{base}_{{{holes[0]}..}}")
    if missing:
        raise ValueError(f"RPC00B sidecar is missing fields: {missing}")
    d = dict(scalars)
    for base, key in _RPC00B_COEFF_MAP.items():
        d[key] = [float(v) for v in coeffs[base]]
    return d


def rpc_dict_from_dimap_xml(path: str) -> dict:
    """Parse a Pléiades/SPOT DIMAP v2 RPC XML (`RPC_*.XML` shipped next to
    the imagery) into the rpcm-style dict.

    Uses the Inverse_Model (ground -> image) coefficients — the direction
    the RPC00B rational polynomials define — plus the RFM_Validity
    offsets/scales.  DIMAP pixel indices are 1-based (first pixel centre
    is (1, 1)); like rpcm's DIMAP loader, LINE_OFF/SAMP_OFF are shifted by
    -1 so projections land in the 0-based pixel grid the datasets use."""
    import xml.etree.ElementTree as ET
    root = ET.parse(path).getroot()

    def find_val(tag):
        el = root.find(f".//{tag}")
        if el is None or el.text is None:
            raise ValueError(f"{path}: DIMAP RPC missing <{tag}>")
        return float(el.text)

    d = {}
    for f, key in _RPC00B_FIELD_MAP.items():
        d[key] = find_val(f)
    d["row_offset"] -= 1.0
    d["col_offset"] -= 1.0
    # Inverse_Model holds SAMP_/LINE_ coefficient tags; scope the search
    # under it when present (some products also carry a Direct_Model with
    # clashing-free names LON_/LAT_, but be defensive)
    scope = root.find(".//Inverse_Model")
    scope = scope if scope is not None else root
    for base, key in _RPC00B_COEFF_MAP.items():
        vals = []
        for j in range(1, 21):
            el = scope.find(f".//{base}_{j}")
            if el is None or el.text is None:
                raise ValueError(f"{path}: DIMAP RPC missing <{base}_{j}>")
            vals.append(float(el.text))
        d[key] = vals
    return d


def rpc_dict_from_geotiff(path: str) -> dict:
    """Read the RPC coefficient tag (50844) embedded in a GeoTIFF, as
    vendor products carry it (the reference reads these via
    rpcm.rpc_from_geotiff, generate_dataset.py:152-163).  Parses the IFD
    only — pixel data is not decoded."""
    from ..utils.geotiff import read_tiff_header, _rpc_dict_from_tag, _T_RPC
    with open(path, "rb") as f:
        buf = f.read()
    _, tags = read_tiff_header(path, buf)
    if _T_RPC not in tags:
        raise ValueError(f"{path}: no RPC coefficient tag (50844)")
    return _rpc_dict_from_tag(tags[_T_RPC])


def rescale_rpc(rpc: RPCModel, alpha: float) -> RPCModel:
    """Scale for an image resize by factor alpha (sat_utils.py:90-108)."""
    return rpc._replace(
        row_scale=rpc.row_scale * alpha, col_scale=rpc.col_scale * alpha,
        row_offset=rpc.row_offset * alpha, col_offset=rpc.col_offset * alpha)


def _poly20(c, x, y, z):
    """RPC00B cubic polynomial; x=nlat, y=nlon, z=nalt (rpcm apply_poly)."""
    return (c[0]
            + c[1] * y + c[2] * x + c[3] * z
            + c[4] * y * x + c[5] * y * z + c[6] * x * z
            + c[7] * y * y + c[8] * x * x + c[9] * z * z
            + c[10] * x * y * z
            + c[11] * y * y * y
            + c[12] * y * x * x + c[13] * y * z * z + c[14] * y * y * x
            + c[15] * x * x * x
            + c[16] * x * z * z + c[17] * y * y * z + c[18] * x * x * z
            + c[19] * z * z * z)


def _projection_normalized(rpc: RPCModel, nlon, nlat, nalt):
    ncol = _poly20(rpc.col_num, nlat, nlon, nalt) / _poly20(rpc.col_den, nlat, nlon, nalt)
    nrow = _poly20(rpc.row_num, nlat, nlon, nalt) / _poly20(rpc.row_den, nlat, nlon, nalt)
    return ncol, nrow


def projection(rpc: RPCModel, lon, lat, alt):
    """Ground (deg, deg, m) -> image (col, row). Fully broadcast."""
    nlon = (lon - rpc.lon_offset) / rpc.lon_scale
    nlat = (lat - rpc.lat_offset) / rpc.lat_scale
    nalt = (alt - rpc.alt_offset) / rpc.alt_scale
    ncol, nrow = _projection_normalized(rpc, nlon, nlat, nalt)
    return ncol * rpc.col_scale + rpc.col_offset, nrow * rpc.row_scale + rpc.row_offset


def _poly20_np(c, x, y, z):
    """Float64 NumPy twin of _poly20 for host-side ingestion."""
    import numpy as np  # local: keep jnp the default in this module
    c = np.asarray(c, dtype=np.float64)
    return (c[0]
            + c[1] * y + c[2] * x + c[3] * z
            + c[4] * y * x + c[5] * y * z + c[6] * x * z
            + c[7] * y * y + c[8] * x * x + c[9] * z * z
            + c[10] * x * y * z
            + c[11] * y * y * y
            + c[12] * y * x * x + c[13] * y * z * z + c[14] * y * y * x
            + c[15] * x * x * x
            + c[16] * x * z * z + c[17] * y * y * z + c[18] * x * x * z
            + c[19] * z * z * z)


def _monomials20_np(x, y, z):
    """(P, 20) float64 monomial design matrix in _poly20's term order.

    The host hot paths (`localization_np`, `projection_np`) evaluate the
    four rational polynomials of an RPC as ONE (P,20)@(20,4) GEMM over
    this matrix instead of ~40 elementwise numpy temporaries per poly —
    the ingestion profile is memory-traffic-bound, and BLAS turns it into
    a single multithreaded pass (measured ~5x on the Newton loop)."""
    import numpy as np
    x = np.ascontiguousarray(x, np.float64).ravel()
    y = np.ascontiguousarray(y, np.float64).ravel()
    z = np.ascontiguousarray(z, np.float64).ravel()
    # stored transposed — (20, P) with CONTIGUOUS rows — because strided
    # writes into the columns of a (P, 20) array are ~3x slower at image
    # scale; BLAS consumes the .T view natively (op(A) in dgemm)
    m = np.empty((20, x.shape[0]), np.float64)
    m[0] = 1.0
    m[1] = y
    m[2] = x
    m[3] = z
    np.multiply(y, x, out=m[4])
    np.multiply(y, z, out=m[5])
    np.multiply(x, z, out=m[6])
    np.multiply(y, y, out=m[7])
    np.multiply(x, x, out=m[8])
    np.multiply(z, z, out=m[9])
    np.multiply(m[4], z, out=m[10])   # xyz
    np.multiply(m[7], y, out=m[11])   # y^3
    np.multiply(m[8], y, out=m[12])   # y x^2
    np.multiply(m[9], y, out=m[13])   # y z^2
    np.multiply(m[7], x, out=m[14])   # y^2 x
    np.multiply(m[8], x, out=m[15])   # x^3
    np.multiply(m[9], x, out=m[16])   # x z^2
    np.multiply(m[7], z, out=m[17])   # y^2 z
    np.multiply(m[8], z, out=m[18])   # x^2 z
    np.multiply(m[9], z, out=m[19])   # z^3
    return m.T


def _deriv_coeff_np(c):
    """(10, 2) coefficient matrix giving [d/dx, d/dy] of a 20-term RPC00B
    cubic over the quadratic monomial basis — the FIRST TEN columns of
    `_monomials20_np` ([1, y, x, z, xy, yz, xz, y², x², z²]).  The same
    design-matrix prefix therefore evaluates every Jacobian entry of the
    Newton solve by GEMM (matches `_poly20_np_dx` / `_poly20_np_dy`)."""
    import numpy as np
    c = np.asarray(c, np.float64)
    dx = np.array([c[2], c[4], 2 * c[8], c[6], 2 * c[12], c[10],
                   2 * c[18], c[14], 3 * c[15], c[16]], np.float64)
    dy = np.array([c[1], 2 * c[7], c[4], c[5], 2 * c[14], 2 * c[17],
                   c[10], 3 * c[11], c[12], c[13]], np.float64)
    return np.stack([dx, dy], axis=-1)


def _poly20_np_dx(c, x, y, z):
    """d/dx (x = nlat) of the RPC00B cubic."""
    import numpy as np
    c = np.asarray(c, dtype=np.float64)
    return (c[2] + c[4] * y + c[6] * z + 2.0 * c[8] * x + c[10] * y * z
            + 2.0 * c[12] * y * x + c[14] * y * y + 3.0 * c[15] * x * x
            + c[16] * z * z + 2.0 * c[18] * x * z)


def _poly20_np_dy(c, x, y, z):
    """d/dy (y = nlon) of the RPC00B cubic."""
    import numpy as np
    c = np.asarray(c, dtype=np.float64)
    return (c[1] + c[4] * x + c[5] * z + 2.0 * c[7] * y + c[10] * x * z
            + 3.0 * c[11] * y * y + c[12] * x * x + c[13] * z * z
            + 2.0 * c[14] * y * x + c[17] * 2.0 * y * z)


def _native_kernels(n_points: int):
    """The native (C++) kernel module when usable for an n-point call,
    else None — any import/build failure falls back to NumPy silently."""
    try:
        from .. import native
        return native.usable(n_points)
    except Exception:
        return None


def projection_np(rpc: RPCModel, lon, lat, alt):
    """Float64 host-side projection (dataset ingestion / DSM eval paths,
    where |UTM| ~ 5e6 m exceeds float32; matches rpcm.projection).

    Large batches dispatch to the native C++ kernel (brdfnerf_tpu.native,
    bit-identical to ~1e-12 px, measured ~45x on the host); the NumPy
    body below is the source of truth and the fallback."""
    import numpy as np
    n_bcast = int(np.prod(np.broadcast_shapes(
        np.shape(lon), np.shape(lat), np.shape(alt)), dtype=np.int64))
    nat = _native_kernels(n_bcast)
    if nat is not None:
        return nat.projection(rpc, lon, lat, alt)
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    alt = np.asarray(alt, np.float64)
    shape = np.broadcast_shapes(lon.shape, lat.shape, alt.shape)
    nlon = np.broadcast_to(
        (lon - float(rpc.lon_offset)) / float(rpc.lon_scale), shape)
    nlat = np.broadcast_to(
        (lat - float(rpc.lat_offset)) / float(rpc.lat_scale), shape)
    nalt = np.broadcast_to(
        (alt - float(rpc.alt_offset)) / float(rpc.alt_scale), shape)
    coeff = np.stack([np.asarray(rpc.col_num, np.float64),
                      np.asarray(rpc.col_den, np.float64),
                      np.asarray(rpc.row_num, np.float64),
                      np.asarray(rpc.row_den, np.float64)], axis=-1)
    vals = _monomials20_np(nlat, nlon, nalt) @ coeff   # (P, 4)
    ncol = (vals[:, 0] / vals[:, 1]).reshape(shape)
    nrow = (vals[:, 2] / vals[:, 3]).reshape(shape)
    return (ncol * float(rpc.col_scale) + float(rpc.col_offset),
            nrow * float(rpc.row_scale) + float(rpc.row_offset))


def localization_np(rpc: RPCModel, col, row, alt, iters: int = 20,
                    tol: float = 1e-12, block: int = 4096):
    """Float64 host-side inverse RPC: (col, row, alt) -> (lon, lat) degrees.

    Vectorized Newton with the analytic 2x2 Jacobian of the rational
    polynomials; replaces rpcm.localization in the ingestion hot loop
    (satellite_rgb_dep.py:46-61 semantics) at sub-1e-9 normalized
    accuracy.  Inputs are processed in `block`-point slices so the
    monomial design matrix and the iteration's temporaries stay
    cache-resident (a whole-image solve streams ~160 MB per iteration
    from DRAM; 4096-point blocks measure ~2.5x faster at 1 Mpx), and
    each block early-exits on its own convergence.

    Large batches dispatch to the native C++ kernel (same Newton update,
    analytic Jacobian, and convergence rule, register-resident per point;
    equality to ~1e-14 deg is tested in tests/test_native.py); the NumPy
    body below is the source of truth and the fallback.
    """
    import numpy as np
    n_bcast = int(np.prod(np.broadcast_shapes(
        np.shape(col), np.shape(row), np.shape(alt)), dtype=np.int64))
    nat = _native_kernels(n_bcast)
    if nat is not None:
        lon, lat = nat.localization(rpc, np.atleast_1d(col),
                                    np.atleast_1d(row), alt,
                                    iters=iters, tol=tol)
        return lon, lat
    # mutual broadcast BEFORE the block split: scalar row/alt against a
    # large col must not slice a size-1 array into empty blocks
    bshape = np.broadcast_shapes(np.shape(col), np.shape(row), np.shape(alt))
    col = np.atleast_1d(np.broadcast_to(np.asarray(col, np.float64), bshape))
    row = np.atleast_1d(np.broadcast_to(np.asarray(row, np.float64), bshape))
    alt = np.atleast_1d(np.broadcast_to(np.asarray(alt, np.float64), bshape))
    if col.size > block:
        c, r, a = col.ravel(), row.ravel(), alt.ravel()
        lon = np.empty_like(c)
        lat = np.empty_like(c)
        for i in range(0, c.size, block):
            s = slice(i, i + block)
            lon[s], lat[s] = localization_np(rpc, c[s], r[s], a[s],
                                             iters=iters, tol=tol)
        return lon.reshape(col.shape), lat.reshape(col.shape)
    tc = (col - float(rpc.col_offset)) / float(rpc.col_scale)
    tr = (row - float(rpc.row_offset)) / float(rpc.row_scale)
    z = (alt - float(rpc.alt_offset)) / float(rpc.alt_scale)

    cn = np.asarray(rpc.col_num, np.float64)
    cd = np.asarray(rpc.col_den, np.float64)
    rn = np.asarray(rpc.row_num, np.float64)
    rd = np.asarray(rpc.row_den, np.float64)
    # (20, 4) value + (10, 8) Jacobian coefficient matrices: each Newton
    # iteration is then two GEMMs over one monomial design matrix instead
    # of ~180 elementwise numpy temporaries (memory-bound at image scale)
    coeff = np.stack([cn, cd, rn, rd], axis=-1)
    dcoeff = np.concatenate([_deriv_coeff_np(c) for c in (cn, cd, rn, rd)],
                            axis=-1)   # columns: [cx cy] per poly

    shape = tc.shape
    tc, tr, z = tc.ravel(), tr.ravel(), z.ravel()
    x = np.zeros_like(tc)   # nlat
    y = np.zeros_like(tc)   # nlon
    for _ in range(iters):
        m = _monomials20_np(x, y, z)
        vals = m @ coeff                      # (P, 4): ncn ncd nrn nrd
        ncn, ncd, nrn, nrd = vals.T
        dv = m[:, :10] @ dcoeff               # (P, 8): d{cn,cd,rn,rd}/dx,dy
        fc = ncn / ncd - tc
        fr = nrn / nrd - tr
        # quotient-rule Jacobian entries
        j_cx = (dv[:, 0] * ncd - ncn * dv[:, 2]) / (ncd * ncd)
        j_cy = (dv[:, 1] * ncd - ncn * dv[:, 3]) / (ncd * ncd)
        j_rx = (dv[:, 4] * nrd - nrn * dv[:, 6]) / (nrd * nrd)
        j_ry = (dv[:, 5] * nrd - nrn * dv[:, 7]) / (nrd * nrd)
        det = j_cy * j_rx - j_cx * j_ry
        det = np.where(np.abs(det) < 1e-30, 1e-30, det)
        dy = (fc * j_rx - fr * j_cx) / det   # nlon update
        dx = (fr * j_cy - fc * j_ry) / det   # nlat update
        y = y - dy
        x = x - dx
        if max(np.max(np.abs(dy)), np.max(np.abs(dx))) < tol:
            break
    x, y = x.reshape(shape), y.reshape(shape)
    lon = y * float(rpc.lon_scale) + float(rpc.lon_offset)
    lat = x * float(rpc.lat_scale) + float(rpc.lat_offset)
    return lon, lat


def localization_normalized(rpc: RPCModel, col, row, alt, iters: int = 12):
    """Image (col, row) at altitude alt (m) -> NORMALIZED ground
    (nlon, nlat), i.e. (lon - lon_offset)/lon_scale etc.

    Newton iteration in normalized coordinates; the 2x2 Jacobian comes from
    jax.jacfwd of the rational polynomials (exact, no finite differences).
    This is the accurate device-dtype interface: in float32 it inverts
    `projection` to ~1e-2 px at full Pleiades scene scale.  Absolute
    degrees cannot represent that (f32 quantization of lon ~ 43 deg is
    ~2.6e-6 deg ~ 0.5 px), which is why on-device consumers should stay in
    normalized/scene coordinates and only the float64 host twin
    (`localization_np`) should produce degrees.
    """
    col = jnp.asarray(col)
    orig_shape = col.shape
    ncol = ((col - rpc.col_offset) / rpc.col_scale).reshape(-1)
    nrow = ((jnp.asarray(row) - rpc.row_offset) / rpc.row_scale).reshape(-1)
    nalt = ((jnp.asarray(alt) - rpc.alt_offset) / rpc.alt_scale).reshape(-1)
    nalt = jnp.broadcast_to(nalt, ncol.shape)

    def residual(p, target, na):
        c, r = _projection_normalized(rpc, p[0], p[1], na)
        return jnp.stack([c - target[0], r - target[1]])

    jac = jax.jacfwd(residual, argnums=0)

    def solve_one(tc, tr, na):
        target = jnp.stack([tc, tr])

        def body(_, p):
            res = residual(p, target, na)
            j = jac(p, target, na)
            det = j[0, 0] * j[1, 1] - j[0, 1] * j[1, 0]
            inv = jnp.array([[j[1, 1], -j[0, 1]], [-j[1, 0], j[0, 0]]]) / det
            return p - inv @ res

        p0 = jnp.zeros(2, dtype=ncol.dtype)
        return jax.lax.fori_loop(0, iters, body, p0)

    p = jax.vmap(solve_one)(ncol, nrow, nalt)
    return (p[:, 0].reshape(orig_shape), p[:, 1].reshape(orig_shape))


def localization(rpc: RPCModel, col, row, alt, iters: int = 12):
    """Image (col, row) at altitude alt (m) -> ground (lon, lat) degrees.

    Thin denormalizing wrapper over `localization_normalized`; in float32
    the OUTPUT quantization of absolute degrees dominates the error
    (~0.5 px at full scene scale — see localization_normalized docstring),
    so prefer the normalized interface on device.
    """
    nlon, nlat = localization_normalized(rpc, col, row, alt, iters=iters)
    lon = nlon * rpc.lon_scale + rpc.lon_offset
    lat = nlat * rpc.lat_scale + rpc.lat_offset
    return lon, lat
