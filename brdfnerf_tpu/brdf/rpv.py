"""Rahman-Pinty-Verstraete (RPV) BRDF (BRDF/RPV.py).

brdf = w * M1 * F * H with
  Minnaert  M1 = (ci*cv*(ci+cv))^(k-1)           (RPV.py:6-16)
  HG phase  F  = HG(cos g, theta)                (RPV.py:49)
  hotspot   H  = 1 + (1-rhoc)/(1+G),
            G  = sqrt(tan^2 i + tan^2 v - 2 tan i tan v cos phi)  (RPV.py:18-34)

Behavioral details preserved: G is *detached* (stop_gradient) before H
(RPV.py:55-56); each factor is identity when its parameter head is off
(RPV.py:43-59); NaN guards return 0 (check_nan with val_rep=0).
Limit case (tested): k=1, theta=0, rhoc=1 => brdf = w (Lambertian).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import calc_angles, henyey_greenstein


def _func_m1(ci, cv, k, eps: float = 1e-5):
    tmp = ci * cv * (ci + cv) + eps
    return jnp.nan_to_num(jnp.power(tmp, k - 1.0))


def _func_g(sza, vza, phi, eps: float = 1e-5):
    ti = jnp.tan(sza)
    tv = jnp.tan(vza)
    tmp = ti * ti + tv * tv - 2.0 * ti * tv * jnp.cos(phi) + eps
    return jnp.nan_to_num(jnp.sqrt(tmp))


def _func_h(rhoc, g, eps: float = 1e-5):
    return jnp.nan_to_num(1.0 + (1.0 - rhoc) / (1.0 + g + eps))


def rpv_brdf(pts2l, pts2c, normal, w, k=None, theta=None, rhoc=None):
    """pts2l/pts2c/normal: (N,3); w: (N,3); k/theta/rhoc: (N,3) or None.

    Returns (brdf, M1, G, H, ci, cv) like RPV.forward (RPV.py:65-68).
    """
    a = calc_angles(pts2l, pts2c, normal)
    ci = a.ci[:, None]
    cv = a.cv[:, None]

    m1 = _func_m1(ci, cv, k) if k is not None else jnp.ones_like(ci)
    f = (henyey_greenstein(a.cg[:, None], theta)
         if theta is not None else jnp.ones_like(a.cg[:, None]))
    if rhoc is not None:
        g = _func_g(a.sza, a.vza, a.phi)[:, None]
        h = _func_h(rhoc, jax.lax.stop_gradient(g))
    else:
        g = jnp.ones_like(a.sza[:, None])
        h = jnp.ones_like(a.sza[:, None])

    brdf = w * m1 * f * h
    return brdf, m1, f, g, h, a.ci, a.cv
