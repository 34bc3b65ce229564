"""Microfacet (GGX / Cook-Torrance style) BRDF (BRDF/microfacet.py).

brdf = albedo + glossy, glossy = 0.04 * D / (4 |l.n| |v.n|)  — note the
reference multiplies a *fixed* 0.04 factor and does NOT multiply Fresnel F
into the glossy lobe (microfacet.py:56-57); F, G, D are still computed and
returned as diagnostics.  nan_to_num guards mirror the reference.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_PI = math.pi


def _safe_norm(x, eps: float = 1e-6):
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def _get_f(l, m, f0: float):
    """Fresnel-Schlick (microfacet.py:113-118). l, m: (N,3)."""
    cos_theta = jnp.sum(l * m, axis=-1)
    return f0 + (1.0 - f0) * (1.0 - cos_theta) ** 5


def _get_d(m, n, alpha):
    """GGX distribution (microfacet.py:98-111). Returns (d, cos_theta_m)."""
    cos_theta_m = jnp.sum(m * n, axis=-1)
    chi = jnp.where(cos_theta_m > 0, 1.0, 0.0)
    c2 = cos_theta_m ** 2
    tan2 = jnp.nan_to_num((1.0 - c2) / c2)
    a = alpha[..., 0]
    denom = _PI * c2 ** 2 * (a * a + tan2) ** 2
    d = jnp.nan_to_num(a * a * chi / denom)
    return d, cos_theta_m


def _get_g(v, m, n, alpha):
    """GGX geometric term (microfacet.py:74-96)."""
    cos_theta_v = jnp.sum(n * v, axis=-1)
    cos_theta = jnp.sum(m * v, axis=-1)
    div = jnp.nan_to_num(cos_theta / cos_theta_v)
    chi = jnp.where(div > 0, 1.0, 0.0)
    c2 = jnp.clip(cos_theta_v ** 2, 0.0, 1.0)
    tan2 = jnp.nan_to_num(jnp.clip(jnp.nan_to_num((1.0 - c2) / c2), 0.0, None))
    a = alpha[..., 0]
    denom = 1.0 + jnp.sqrt(1.0 + a * a * tan2)
    return jnp.nan_to_num(chi * 2.0 / denom)


def microfacet_brdf(pts2l, pts2c, normal, albedo, rough,
                    f0: float = 0.04, lvis: bool = False,
                    glossy_scale: float = 1.0):
    """pts2l/pts2c/normal: (N,3); albedo: (N,3); rough: (N,1).

    Returns (glossy, brdf, f, g, d, l_dot_n, v_dot_n, h, n_h) matching
    Microfacet.forward (microfacet.py:20-72, L=1 squeezed).

    NOTE: glossy_scale is accepted but INERT — deliberate parity with the
    reference, which stores self.glossy_scale (microfacet.py:17) but
    hardcodes `factor = 0.04` into the glossy lobe (microfacet.py:56) and
    never applies the flag; wiring it here would diverge.
    """
    pts2l = _safe_norm(pts2l)
    pts2c = _safe_norm(pts2c)
    normal = _safe_norm(normal)

    h = _safe_norm(pts2l + pts2c)
    f = _get_f(pts2l, h, f0)
    alpha = rough ** 2
    d, n_h = _get_d(h, normal, alpha)
    g = _get_g(pts2c, h, normal, alpha)
    if lvis:
        g = g * _get_g(pts2l, h, normal, alpha)

    min_angle = 0.001
    l_dot_n = jnp.clip(jnp.abs(jnp.sum(pts2l * normal, axis=-1)), min_angle)
    v_dot_n = jnp.clip(jnp.abs(jnp.sum(pts2c * normal, axis=-1)), min_angle)
    denom = 4.0 * l_dot_n * v_dot_n
    factor = 0.04                       # fixed factor (microfacet.py:56)
    glossy = jnp.nan_to_num(factor * d / denom)

    brdf = albedo + glossy[:, None]     # diffuse + glossy (microfacet.py:62-69)
    return glossy, brdf, f, g, d, l_dot_n, v_dot_n, h, n_h
