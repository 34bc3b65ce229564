"""Shared BRDF geometry: angles between light / view / normal, HG phase.

Matches BRDF/basic_func.py exactly, including its clamp conventions which
are part of observable behavior near grazing angles (SURVEY.md 5):
cosines of incidence/view zenith clamped to [eps, 1], phase cosine to
[-1, 1], relative-azimuth cosine to [-1, 1].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BRDFAngles(NamedTuple):
    ci: jnp.ndarray    # cos solar zenith
    sza: jnp.ndarray   # solar zenith angle
    si: jnp.ndarray    # sin solar zenith
    cv: jnp.ndarray    # cos view zenith
    vza: jnp.ndarray   # view zenith angle
    sv: jnp.ndarray    # sin view zenith
    cg: jnp.ndarray    # cos phase angle
    g: jnp.ndarray     # phase angle
    phi: jnp.ndarray   # relative azimuth


def calc_angles(pts2l, pts2c, normal, eps: float = 1e-5) -> BRDFAngles:
    """pts2l/pts2c/normal: (N, 3) unit vectors (basic_func.py:5-31).

    Clamps deviate from the reference in one deliberate way: cosines are
    kept strictly inside (eps, 1-1e6eps) and the relative-azimuth division
    is floored, because at exact nadir (cv == 1, sv == 0) the reference
    computes 0/0 and arccos'(1) = -inf — NaNs it later value-replaces
    (check_nan); here they never arise, so gradients stay finite too."""
    cos_min = eps
    cos_max = 1.0 - 1e-6
    ci = jnp.clip(jnp.sum(pts2l * normal, axis=-1), cos_min, cos_max)
    sza = jnp.arccos(ci)
    si = jnp.sin(sza)

    cv = jnp.clip(jnp.sum(pts2c * normal, axis=-1), cos_min, cos_max)
    vza = jnp.arccos(cv)
    sv = jnp.sin(vza)

    cg = jnp.clip(jnp.sum(pts2c * pts2l, axis=-1), -cos_max, cos_max)
    g = jnp.arccos(cg)

    denom = jnp.maximum(si * sv, eps)
    cp = jnp.clip((cg - ci * cv) / denom, -cos_max, cos_max)
    phi = jnp.arccos(cp)
    return BRDFAngles(ci, sza, si, cv, vza, sv, cg, g, phi)


def henyey_greenstein(x, theta, eps: float = 1e-6):
    """Single-lobe HG phase (basic_func.py:33-44). x: (N,1) cos(g); theta (N,K)."""
    theta2 = theta * theta
    y = (1.0 - theta2) / (jnp.power(1.0 + 2.0 * theta * x + theta2, 1.5) + eps)
    return jnp.nan_to_num(y)
