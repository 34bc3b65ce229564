"""Hapke photometric model (BRDF/Hapke.py).

Full bidirectional reflectance factor (Hapke.py:192-198):
    BRF = w/hpk_scl * (ci/(ci+cv)/cos sza) * (P*B + Hi*Hv - 1) * S
with double-HG phase PF(b, c) (Hapke.py:93-115), opposition surge B(B0, h)
(Hapke.py:159-162), macroscopic-roughness effective cosines mu0_eff/mu_eff +
shadowing S(theta) (Hapke.py:6-91,164-169), and the Ambartsumian-
Chandrasekhar H function HF (Hapke.py:117-131).  The i<=e / i>e branch pair
in mu0_eff/mu_eff/S becomes a jnp.where select (no boolean indexing).

shell_hapke 1/2/3 simplified variants (Hapke.py:183-191) are reproduced.
NaN-replacement fallbacks mirror the reference's check_nan val_rep choices:
E1/E2/f/chi/eta/PF/S -> 0, mu0_eff -> cos i, mu_eff -> cos e, HF -> 1.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .common import calc_angles, henyey_greenstein

_PI = math.pi


def _e1(x, theta, eps=1e-5):
    y = jnp.exp(-(2.0 / _PI) / jnp.tan(theta + eps) / jnp.tan(x + eps))
    return jnp.nan_to_num(y)


def _e2(x, theta, eps=1e-5):
    y = jnp.exp(-(1.0 / _PI) * (1.0 / jnp.tan(theta + eps)) ** 2
                * (1.0 / jnp.tan(x + eps)) ** 2)
    return jnp.nan_to_num(y)


def _f(phi, eps=1e-5):
    return jnp.nan_to_num(jnp.exp(-2.0 * jnp.tan((phi + eps) / 2.0)))


def _chi(x, eps=1e-5):
    return jnp.nan_to_num(1.0 / jnp.sqrt(1.0 + _PI * jnp.tan(x + eps) ** 2))


def _eta(x, theta):
    y = _chi(theta) * (jnp.cos(x) + jnp.sin(x) * jnp.tan(theta + 1e-5)
                       * (_e2(x, theta) / (2.0 - _e1(x, theta))))
    return jnp.nan_to_num(y)


def _mu0_eff(i, e, phi, theta):
    """Effective cos of incidence (Hapke.py:32-48); branches by i<=e."""
    def branch(a, b):
        y = jnp.cos(phi) * _e2(a, theta) + jnp.sin(phi / 2.0) ** 2 * _e2(b, theta)
        y = y / (2.0 - _e1(a, theta) - phi / _PI * _e1(b, theta))
        return _chi(theta) * (jnp.cos(b) + jnp.sin(b) * jnp.tan(theta) * y)
    y = jnp.where(i <= e, branch(e, i),
                  # i > e branch (no cos(phi) factor on the first term)
                  _chi(theta) * (jnp.cos(i) + jnp.sin(i) * jnp.tan(theta)
                                 * ((_e2(i, theta)
                                     - jnp.sin(phi / 2.0) ** 2 * _e2(e, theta))
                                    / (2.0 - _e1(i, theta)
                                       - phi / _PI * _e1(e, theta)))))
    return jnp.where(jnp.isnan(y), jnp.cos(i), y)


def _mu_eff(i, e, phi, theta):
    """Effective cos of emission (Hapke.py:50-66)."""
    y_le = _chi(theta) * (jnp.cos(e) + jnp.sin(e) * jnp.tan(theta)
                          * ((_e2(e, theta)
                              - jnp.sin(phi / 2.0) ** 2 * _e2(i, theta))
                             / (2.0 - _e1(e, theta)
                                - phi / _PI * _e1(i, theta))))
    y_gt = _chi(theta) * (jnp.cos(e) + jnp.sin(e) * jnp.tan(theta)
                          * ((jnp.cos(phi) * _e2(i, theta)
                              + jnp.sin(phi / 2.0) ** 2 * _e2(e, theta))
                             / (2.0 - _e1(i, theta)
                                - phi / _PI * _e1(e, theta))))
    y = jnp.where(i <= e, y_le, y_gt)
    return jnp.where(jnp.isnan(y), jnp.cos(e), y)


def _shadow(i, e, phi, theta):
    """Macroscopic-roughness shadowing S (Hapke.py:68-91)."""
    ci = jnp.cos(i)
    cv = jnp.cos(e)
    mue = _mu_eff(i, e, phi, theta)
    etai = _eta(i, theta)
    etae = _eta(e, theta)
    chit = _chi(theta)
    ff = _f(phi)
    temp = (mue / etae) * (ci / etai) * chit
    y_le = temp / (1.0 - ff + ff * chit * (ci / etai))
    y_gt = temp / (1.0 - ff + ff * chit * (cv / etae))
    return jnp.nan_to_num(jnp.where(i <= e, y_le, y_gt))


def _pf(x, b, c):
    """Double HG phase (Hapke.py:93-115). x: (N,1); b,c: (N,3)."""
    b2 = b * b
    bx = b * x
    y = c * (1.0 - b2) / (jnp.power(1.0 - 2.0 * bx + b2, 1.5) + 1e-6)
    y = y + (1.0 - c) * (1.0 - b2) / (jnp.power(1.0 + 2.0 * bx + b2, 1.5) + 1e-6)
    return jnp.nan_to_num(y)


def _hf(x, w, eps: float = 1e-3):
    """Chandrasekhar H (Hapke 2002 approx, Hapke.py:117-131). x: (N,1); w: (N,3).

    x floored at eps: the roughness-effective cosines can dip to ~0 where
    log((1+x)/x) and 1/tmp1 blow up (inf, which the reference's NaN-only
    replacement misses)."""
    x = jnp.maximum(x, eps)
    gamma = jnp.sqrt(jnp.clip(1.0 - w, 1e-6, 1.0))
    ro = (1.0 - gamma) / (1.0 + gamma)
    log = jnp.log((1.0 + x) / x)
    tmp1 = 1.0 - w * x * (ro + (1.0 - 2.0 * ro * x) / 2.0 * log)
    y = 1.0 / jnp.where(jnp.abs(tmp1) < 1e-4,
                        jnp.sign(tmp1) * 1e-4 + (tmp1 == 0) * 1e-4, tmp1)
    return jnp.where(jnp.isnan(y), 1.0, y)


def hapke_brdf(pts2l, pts2c, normal, w, b=None, c=None, theta=None,
               h=None, b0=None, hpk_scl: float = 4.0, shell_hapke: int = 0):
    """Full/shell Hapke BRF (Hapke.py:139-200).

    pts2l/pts2c/normal: (N,3); w: (N,3); b,c: (N,3)|None; theta: (N,)|None.
    Returns (brdf, P, B, Hi, Hv, S, ci, cv).
    """
    a = calc_angles(pts2l, pts2c, normal)
    ci, cv = a.ci, a.cv

    if b is None:
        p = jnp.ones((a.cg.shape[0], 3), dtype=a.cg.dtype)
    elif c is None:
        p = henyey_greenstein(a.cg[:, None], b)
    else:
        p = _pf(a.cg[:, None], b, c)

    if b0 is not None and h is not None:
        bk = b0 / (1.0 + 1.0 / h * jnp.tan(a.g / 2.0)[:, None]) + 1.0
    else:
        bk = jnp.ones_like(a.g)[:, None]

    if theta is not None:
        # roughness-effective cosines can go slightly negative at grazing
        # geometry; floor them so the H function and the ci/(ci+cv) factor
        # stay finite (the reference NaN-replaces after the fact)
        ci = jnp.clip(_mu0_eff(a.sza, a.vza, a.phi, theta), 1e-3, 1.0)
        cv = jnp.clip(_mu_eff(a.sza, a.vza, a.phi, theta), 1e-3, 1.0)
        shad = jnp.clip(_shadow(a.sza, a.vza, a.phi, theta),
                        0.0, 10.0)[:, None]
    else:
        shad = jnp.ones_like(a.sza)[:, None]

    hi = _hf(ci[:, None], w)
    hv = _hf(cv[:, None], w)

    if b is None:
        if shell_hapke == 1:
            brdf = w / hpk_scl
        elif shell_hapke == 2:
            scl = (ci + cv) * hpk_scl + 1e-6
            brdf = w / scl[:, None]
        elif shell_hapke == 3:
            scl = (ci + cv) * hpk_scl + 1e-6
            brdf = w * (hi * hv) / scl[:, None]
        else:
            brdf = w / hpk_scl
    else:
        tmp1 = (ci / (ci + cv) / jnp.cos(a.sza))[:, None]
        tmp2 = p * bk + hi * hv - 1.0
        brdf = w / hpk_scl * tmp1 * tmp2 * shad

    return brdf, p, bk, hi, hv, shad, ci, cv
