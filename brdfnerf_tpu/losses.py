"""Loss suite (reference: metrics.py:11-290, main.py:194-353 gating).

All losses are pure functions over the render-result dict (keys suffixed
_coarse/_fine) and return (scalar, dict-of-terms).  Data-dependent subset
selection (valid-depth filtering, metrics.py:103-140) is expressed with
masks so shapes stay static under jit; the kept-fraction rescaling
numerator/denominator (metrics.py:132-139) is reproduced with mask sums.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.compositing import depth_std, depth_var


def _typs(results: Dict):
    return ["coarse", "fine"] if "rgb_fine" in results else ["coarse"]


def nerf_loss(results: Dict, targets) -> Tuple[jnp.ndarray, Dict]:
    """Plain MSE color loss (metrics.py:11-22)."""
    d = {}
    for typ in _typs(results):
        d[f"{typ}_color"] = jnp.mean((results[f"rgb_{typ}"] - targets) ** 2)
    return sum(d.values()), d


def _solar_correction_terms(d: Dict, results: Dict, typ: str, lambda_sc: float):
    """s-nerf solar correction terms 2-3 (metrics.py:30-37)."""
    sun_sc = results[f"sun_sc_{typ}"].squeeze()
    t_sc = jax.lax.stop_gradient(results[f"transparency_sc_{typ}"])
    w_sc = jax.lax.stop_gradient(results[f"weights_sc_{typ}"])
    term2 = jnp.sum((t_sc - sun_sc) ** 2, axis=-1)
    term3 = 1.0 - jnp.sum(w_sc * sun_sc, axis=-1)
    d[f"{typ}_sc_term2"] = lambda_sc / 3.0 * jnp.mean(term2)
    d[f"{typ}_sc_term3"] = lambda_sc / 3.0 * jnp.mean(term3)
    return d


def snerf_loss(results: Dict, targets, lambda_sc: float = 0.05,
               lambda_rgb: float = 1.0) -> Tuple[jnp.ndarray, Dict]:
    """MSE + solar correction (metrics.py:39-61).

    The sc terms apply per typ only where the render produced them: the
    solar-correction pass runs on the coarse pass (render.py), so a fine
    model trains with sc on coarse only — the reference instead KeyErrors
    / NameErrors on every fine+sc combination (rendering.py:309,
    metrics.py:32 with no sun_sc_fine), a known-broken path fixed here.
    """
    d = {}
    for typ in _typs(results):
        d[f"{typ}_color"] = jnp.mean((results[f"rgb_{typ}"] - targets) ** 2)
        if lambda_sc > 0 and f"sun_sc_{typ}" in results:
            d = _solar_correction_terms(d, results, typ, lambda_sc)
    # the reference scales EVERY term by lambda_rgb — sc included
    # (metrics.py:57-58) — kept as-is
    d = {k: lambda_rgb * v for k, v in d.items()}
    return sum(d.values()), d


def satnerf_loss(results: Dict, targets, lambda_sc: float = 0.0,
                 beta_min: float = 0.05) -> Tuple[jnp.ndarray, Dict]:
    """Beta-uncertainty color loss (metrics.py:24-28,63-80).

    Documented deviation: the reference hardcodes beta_coarse for BOTH
    typs (metrics.py:25), which shape-errors whenever a fine model has a
    different sample count; here each typ uses its own beta head output.
    """
    d = {}
    for typ in _typs(results):
        beta_raw = results.get(f"beta_{typ}", results["beta_coarse"])
        beta = jnp.sum(results[f"weights_{typ}"][..., None]
                       * beta_raw, axis=-2) + beta_min
        d[f"{typ}_color"] = jnp.mean(
            (results[f"rgb_{typ}"] - targets) ** 2 / (2 * beta ** 2))
        d[f"{typ}_logbeta"] = (3 + jnp.mean(jnp.log(beta))) / 2
        if lambda_sc > 0 and f"sun_sc_{typ}" in results:
            d = _solar_correction_terms(d, results, typ, lambda_sc)
    return sum(d.values()), d


def depth_loss(results: Dict, target_depth, target_weight=None,
               valid_depth=None, target_std=None, lambda_ds: float = 1.0,
               gnll: bool = False, usealldepth: bool = True,
               subset: bool = True) -> Tuple[jnp.ndarray, Dict]:
    """Depth supervision (metrics.py:82-161).

    subset=True (sps/spsbrdf): restrict to valid-depth rays; when
    usealldepth=False additionally keep only rays "not in expected
    distribution" (|d-d*| > sigma* or sigma* < sigma-hat, metrics.py:98-101);
    weighted MSE (or GNLL) scaled by kept-fraction (metrics.py:132-139).
    """
    d = {}
    for typ in _typs(results):
        pred_depth = results[f"depth_{typ}"]
        if not subset:
            d[f"{typ}_ds"] = jnp.mean((pred_depth - target_depth) ** 2)
            continue
        z_vals = results[f"z_vals_{typ}"]
        pred_weight = results[f"weights_{typ}"]
        pred_std = depth_std(z_vals, pred_depth, pred_weight)

        valid = (jnp.ones_like(pred_depth) if valid_depth is None
                 else (valid_depth > 0).astype(pred_depth.dtype))
        keep = valid
        if not usealldepth:
            not_expected = jnp.logical_or(
                (jnp.abs(pred_depth - target_depth) - target_std) > 0.0,
                target_std < pred_std)
            keep = keep * not_expected.astype(keep.dtype)

        tw = jnp.ones_like(pred_depth) if target_weight is None else target_weight
        if gnll:
            var = jnp.maximum(pred_std ** 2, 1e-6)
            per_ray = 0.5 * (jnp.log(var)
                             + (pred_depth - target_depth) ** 2 / var)
        else:
            per_ray = tw * (pred_depth - target_depth) ** 2

        num = jnp.sum(keep)
        denom = jnp.asarray(pred_depth.shape[0], pred_depth.dtype)
        # mean over kept rays, times kept-fraction == sum/denominator
        loss = jnp.where(num > 0, jnp.sum(per_ray * keep) / denom, 0.0)
        d[f"{typ}_ds"] = loss
    d = {k: (lambda_ds / 3.0) * v for k, v in d.items()}
    return sum(d.values()), d


def normal_reg_loss(results: Dict, lambda_nr_reg: float = 0.1,
                    keyword: str = "normal_an"):
    """Penalize backward-facing normals (metrics.py:179-216).
    Returns (loss, dict, percent_bad)."""
    d = {}
    perc = jnp.asarray(0.0)
    for typ in _typs(results):
        normal = results[f"{keyword}_{typ}"].reshape(-1, 3)
        weights = results[f"weights_{typ}"].reshape(-1)
        view_dir = results[f"rays_d_{typ}"].reshape(-1, 3)   # camera-facing
        repeat = normal.shape[0] // view_dir.shape[0]
        view = jnp.repeat(view_dir, repeat, axis=0)
        n_dot_v = jnp.sum(normal * view, axis=-1)
        perc = 100.0 * jnp.mean((n_dot_v < 0).astype(jnp.float32))
        # reference QUIRK kept (metrics.py:200): the sum runs over the
        # FLATTENED rays*samples axis, so the term scales with batch size
        # (the subsequent mean is a no-op on the scalar); the effective
        # lambda is tied to batch_size exactly as in the reference
        d[f"{typ}_nr_reg_{keyword[-2:]}"] = jnp.sum(
            weights * jnp.minimum(0.0, n_dot_v) ** 2, axis=-1)
    d = {k: lambda_nr_reg * jnp.mean(v) for k, v in d.items()}
    return sum(d.values()), d, perc


def normal_loss(weights, normal_gt, normal_pred, lambda_nr_spv: float = 0.001,
                target_weight=None, valid_depth=None, keyword: str = "an_lr"):
    """Normal supervision (metrics.py:218-261).

    keyword 'an_lr': weighted L1 between per-sample normal pairs.
    otherwise: L1 between GT normal and weight-accumulated normal on the
    valid-depth subset, weighted by target_weight.
    """
    d = {}
    typ = "coarse"
    if keyword == "an_lr":
        # reference QUIRK kept (metrics.py:254): l1_loss(reduction='mean')
        # collapses to a GLOBAL mean first, then multiplies the weights
        # vector — i.e. mean(w) * mean(|diff|), NOT mean(w * |diff|);
        # per-sample weighting is decoupled from per-sample residuals
        l1 = jnp.mean(jnp.abs(normal_gt - normal_pred))
        d[f"{typ}_nrspv_{keyword}"] = weights.reshape(-1) * l1
    else:
        pred_s = jnp.sum(weights[..., None] * normal_pred, axis=-2)
        valid = (jnp.ones(pred_s.shape[0]) if valid_depth is None
                 else (valid_depth > 0).astype(pred_s.dtype))
        tw = (jnp.ones(pred_s.shape[0]) if target_weight is None
              else target_weight)
        diff = jnp.abs(tw[:, None] * normal_gt - tw[:, None] * pred_s)
        num = jnp.maximum(jnp.sum(valid), 1.0)
        d[f"{typ}_nrspv_{keyword}"] = (
            jnp.sum(diff * valid[:, None]) / (num * 3.0))
    d = {k: lambda_nr_spv * jnp.mean(v) for k, v in d.items()}
    return sum(d.values()), d


def hard_surface_loss(results: Dict, lambda_hs: float = 0.5):
    """Mean weighted depth variance (metrics.py:263-290)."""
    d = {}
    for typ in _typs(results):
        var = depth_var(results[f"z_vals_{typ}"], results[f"depth_{typ}"],
                        results[f"weights_{typ}"])
        d[f"{typ}_hs_reg"] = var
    d = {k: lambda_hs * jnp.mean(v) for k, v in d.items()}
    return sum(d.values()), d


def load_loss(variant: str, beta: bool, sc_lambda: float, lambda_rgb: float):
    """Loss factory (metrics.py:163-177). Returns f(results, targets)."""
    if variant == "nerf":
        return lambda r, t: nerf_loss(r, t)
    if variant == "s-nerf":
        return lambda r, t: snerf_loss(r, t, lambda_sc=sc_lambda)
    if variant in ("sat-nerf", "sps-nerf"):
        if beta:
            return lambda r, t: satnerf_loss(r, t, lambda_sc=sc_lambda)
        return lambda r, t: snerf_loss(r, t, lambda_sc=sc_lambda)
    if variant == "spsbrdf-nerf":
        return lambda r, t: snerf_loss(r, t, lambda_sc=sc_lambda,
                                       lambda_rgb=lambda_rgb)
    raise ValueError(f"model {variant} is not valid")
