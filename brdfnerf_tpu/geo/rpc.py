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
    """Build from an rpcm-format dict (the JSON "rpc" field)."""
    def arr(k):
        return jnp.asarray(d[k], dtype=jnp.float64
                           if jax.config.read("jax_enable_x64")
                           else jnp.float32)
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


def localization(rpc: RPCModel, col, row, alt, iters: int = 12):
    """Image (col, row) at altitude alt (m) -> ground (lon, lat) degrees.

    Newton iteration in normalized coordinates; the 2x2 Jacobian comes from
    jax.jacfwd of the rational polynomials (exact, no finite differences).
    Converges to < 1e-10 in normalized units in a handful of steps for
    well-conditioned satellite RPCs.
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
    lon = p[:, 0] * rpc.lon_scale + rpc.lon_offset
    lat = p[:, 1] * rpc.lat_scale + rpc.lat_offset
    return lon.reshape(orig_shape), lat.reshape(orig_shape)
