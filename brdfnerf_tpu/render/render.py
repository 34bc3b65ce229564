"""render_rays: the per-variant render orchestrator as ONE jittable program.

Re-designs rendering.py:168-334 TPU-first: the reference splits rays into
host-side chunks and calls the model through Python loops (main.py:120-141,
spsbrdfnerf.py:119-125); here the full batch flows through a single traced
program (3 MLP passes + samplers + compositing fused by XLA), so the hot
loop is device-resident end to end.

Pipeline per variant:
  nerf       : stratified -> classic inference
  s-nerf     : stratified -> shadow inference (+ solar-correction pass)
  sat-nerf   : stratified -> shadow inference with beta/t (+ sc pass)
  sps-nerf   : pass 1 -> guided samples -> union sort -> pass 2 (+ sc pass)
  spsbrdf-nerf: sigma-only pass -> [analytic sun-visibility march]
                -> guided merge -> full BRDF inference
Fine model (n_importance > 0): inverse-CDF resample on coarse weights
(rendering.py:294-332), rendered with a separate 'fine' parameter set.

Result keys are suffixed _coarse / _fine like the reference (rendering.py:289-291).

Deviation from the reference, made deliberately (SURVEY.md 7 "known-broken
paths"): the analytic sun-march transparency is evaluated at the *final*
sample count so irradiance shapes always match (the reference's
gsam_only=False + sun_v='analystic' combination would shape-error at
spsbrdfnerf.py:266); and spsbrdf solar correction uses a real sigma pass
along sun rays instead of the undefined `inference_sun` (rendering.py:281).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig, RenderConfig
from ..ops.sampling import stratified_z_vals, sample_pdf, guided_samples
from .inference import (inference_classic, inference_shadow, inference_spsbrdf,
                        sigma_pass, solar_correction_pass)


class RenderInputs(NamedTuple):
    """Dynamic per-batch inputs. rays: (N, 8) or (N, 11) with layout
    [o(3), d(3), near, far, (sun_d(3))] (datasets/satellite.py:170-177)."""
    rays: jnp.ndarray
    ts: Optional[jnp.ndarray] = None            # (N,) int image ids
    valid_depth: Optional[jnp.ndarray] = None   # (N,)
    target_depths: Optional[jnp.ndarray] = None  # (N, 2) [depth, weight]
    target_std: Optional[jnp.ndarray] = None    # (N,)
    rows: Optional[jnp.ndarray] = None
    cols: Optional[jnp.ndarray] = None
    cos_irra_on: Optional[jnp.ndarray] = None   # dynamic bool scalar


def _lookup_t(params: Dict, ts):
    if ts is None or "t" not in params:
        return None
    return params["t"][ts]                       # (N, t_dim)


def _render_one(params: Dict, mcfg: ModelConfig, rcfg: RenderConfig,
                inp: RenderInputs, key, train: bool, typ: str) -> Dict:
    rays = inp.rays
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    sun_d = rays[:, 8:11] if (rcfg.use_sat_sun and rays.shape[1] >= 11) \
        else jnp.ones_like(rays_o)
    t_emb = _lookup_t(params, inp.ts)
    net = params[typ]

    keys = jax.random.split(key, 8)
    # the reference perturbs stratified samples at EVAL too (get_z_vals
    # always jitters when args.perturb > 0, rendering.py:149-166)
    perturb = rcfg.perturb
    z_vals = stratified_z_vals(keys[0], rcfg.n_samples, near, far,
                               rcfg.use_disp, perturb)

    variant = mcfg.variant
    result: Dict = {}

    if variant == "nerf":
        result = inference_classic(net, mcfg, rcfg, rays_o, rays_d, z_vals,
                                   key=keys[1])

    elif variant == "s-nerf":
        result = inference_shadow(net, mcfg, rcfg, rays_o, rays_d, z_vals,
                                  sun_d, key=keys[1])
        if train:
            result.update(_solar_correction(net, mcfg, rcfg, rays_o, sun_d,
                                            z_vals, t_emb, keys[2]))

    elif variant in ("sat-nerf", "sps-nerf"):
        result = inference_shadow(net, mcfg, rcfg, rays_o, rays_d, z_vals,
                                  sun_d, t_emb=t_emb, key=keys[1])
        if rcfg.guided_samples > 0 and variant == "sps-nerf":
            z2 = _guided(keys[3], result, rcfg, near, far, train, inp)
            z_unsort = jnp.concatenate([z_vals, z2], axis=-1)
            z_all = jnp.sort(z_unsort, axis=-1)
            result = inference_shadow(net, mcfg, rcfg, rays_o, rays_d, z_all,
                                      sun_d, t_emb=t_emb, key=keys[4])
            result["z_vals_unsort"] = z_unsort
            z_vals = z_all
        if train:
            result.update(_solar_correction(net, mcfg, rcfg, rays_o, sun_d,
                                            z_vals, t_emb, keys[2]))

    elif variant == "spsbrdf-nerf":
        result = _render_spsbrdf(params, mcfg, rcfg, inp, rays_o, rays_d,
                                 near, far, sun_d, t_emb, z_vals, keys, train)
    else:
        raise ValueError(f"model {variant} is not valid")

    return result


def _resample_axis1(a, m: int):
    """Linear index-resampling of (N, n) -> (N, m) along axis 1 (static
    shapes; identity when n == m).  Used to map the sun-march per-sample
    transparency onto the merged final sample axis."""
    n = int(a.shape[1])
    if n == m:
        return a
    pos = jnp.linspace(0.0, n - 1.0, m, dtype=a.dtype)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, n - 1)
    w = (pos - lo.astype(a.dtype))[None, :]
    return a[:, lo] * (1.0 - w) + a[:, hi] * w


def _solar_correction(net, mcfg, rcfg, rays_o, sun_d, z_vals, t_emb, key):
    """Solar-correction pass: re-render along sun directions and expose its
    transparency/weights/sun for SNerfLoss terms 2-3 (rendering.py:194-204,
    218-224; metrics.py:30-37).  Only run during TRAINING (the sole
    consumer is the sc loss); jitted render/eval programs return every
    result key as a live output, so an always-on pass would cost a full
    extra trunk forward per eval chunk for nothing."""
    if mcfg.sun_v != "learned":
        return {}
    res = inference_shadow(net, mcfg, rcfg, rays_o, sun_d, z_vals, sun_d,
                           t_emb=t_emb, key=key)
    return {"weights_sc": res["weights"],
            "transparency_sc": res["transparency"],
            "sun_sc": res["sun"]}


def _guided(key, prev_result, rcfg: RenderConfig, near, far, train: bool,
            inp: RenderInputs):
    """Guided z samples around depth, stop-gradient like the reference's
    .detach() (rendering.py:212,262)."""
    target_depth = (inp.target_depths[:, 0]
                    if inp.target_depths is not None else None)
    z2 = guided_samples(
        key, prev_result["depth"], prev_result["weights"],
        prev_result["z_vals"], rcfg.effective_guided,
        near[0, 0], far[0, 0],
        train=train, valid_depth=inp.valid_depth if train else None,
        target_depth=target_depth, target_std=inp.target_std,
        d_range=(0.0001 if rcfg.guided_samples == 2 else rcfg.std_range),
        perturb=rcfg.perturb)
    z2 = jnp.sort(z2, axis=-1)
    if rcfg.effective_guided == 1 and rcfg.guided_samples == 2:
        z2 = jnp.mean(z2, axis=1, keepdims=True)   # rendering.py:264-265
    return jax.lax.stop_gradient(z2)


def _render_spsbrdf(params, mcfg, rcfg, inp, rays_o, rays_d, near, far,
                    sun_d, t_emb, z_vals, keys, train: bool) -> Dict:
    net = params["coarse"] if "coarse" in params else params
    if rcfg.guided_samples <= 0:
        result = inference_spsbrdf(net, mcfg, rcfg, rays_o, rays_d, z_vals,
                                   sun_d, t_emb=t_emb,
                                   cos_irra_on=inp.cos_irra_on,
                                   rows=inp.rows, cols=inp.cols, key=keys[1])
        return _spsbrdf_sc(result, net, mcfg, rcfg, rays_o, sun_d, z_vals,
                           keys[7], train)

    # phase 1: sigma only (rendering.py:232)
    res1 = sigma_pass(net, mcfg, rcfg, rays_o, rays_d, z_vals, key=keys[1])

    # guided merge (rendering.py:261-273)
    z2 = _guided(keys[3], res1, rcfg, near, far, train, inp)
    if rcfg.gsam_only:
        z_unsort = z2
        z_final = z2
    else:
        z_unsort = jnp.concatenate([z_vals, z2], axis=-1)
        z_final = jnp.sort(z_unsort, axis=-1)

    # analytic sun-visibility march (rendering.py:244-259): march from the
    # predicted surface toward the sun; transparency along that ray is the
    # per-sample sun visibility.  The march count follows the reference's
    # intent (N_samples, or guided count under gsam_only —
    # rendering.py:251-253) via rcfg.sun_march_samples; when it differs
    # from the merged final count, the transparency is linearly resampled
    # onto the final sample axis, fixing the reference's shape error
    # (spsbrdfnerf.py:266) WITHOUT changing the per-sample pairing
    # semantics (rounds 1-3 marched at the final count outright;
    # sun_march_samples=-1 restores that exactly).
    sun_vis = None
    sun_weights = None
    if mcfg.sun_v == "analystic" and (rcfg.apply_brdf
                                      or rcfg.force_sun_march):
        depth1 = res1["depth"]
        pt_surf = rays_o + rays_d * depth1[:, None]
        far_sun = depth1[:, None]
        scale = jnp.where(jnp.abs(sun_d[0, 2]) > 1e-5,
                          jnp.abs(rays_d[0, 2] / sun_d[0, 2]), 1.0)
        far_sun = far_sun * scale
        n_sun = rcfg.sun_march_count(int(z_final.shape[1]))
        z_sun = stratified_z_vals(keys[5], n_sun, far_sun * 0.01, far_sun,
                                  perturb=rcfg.perturb)
        res_sun = sigma_pass(net, mcfg, rcfg, pt_surf, sun_d, z_sun,
                             key=keys[6])
        trans = _resample_axis1(res_sun["transparency"],
                                int(z_final.shape[1]))
        sun_vis = jax.lax.stop_gradient(trans[..., None])
        sun_weights = jax.lax.stop_gradient(res_sun["weights"])

    # phase 2: full inference on merged samples
    result = inference_spsbrdf(net, mcfg, rcfg, rays_o, rays_d, z_final,
                               sun_d, t_emb=t_emb, sun_vis=sun_vis,
                               sun_weights=sun_weights,
                               cos_irra_on=inp.cos_irra_on,
                               rows=inp.rows, cols=inp.cols, key=keys[4])
    result["z_vals_unsort"] = z_unsort
    return _spsbrdf_sc(result, net, mcfg, rcfg, rays_o, sun_d, z_final,
                       keys[7], train)


def _spsbrdf_sc(result: Dict, net, mcfg, rcfg, rays_o, sun_d, z_vals, key,
                train: bool):
    """Attach spsbrdf solar-correction keys when sun_v is learned.  The
    reference intended this pass (rendering.py:278-284) but its
    `inference_sun` is undefined — here it is a real sigma + learned-sun_v
    march along sun rays.  Training only: the sole consumer is the sc
    loss, and a jitted eval program would otherwise materialize the pass
    as a live output (one extra trunk forward per chunk)."""
    if mcfg.sun_v != "learned" or not train:
        return result
    sc = solar_correction_pass(net, mcfg, rcfg, rays_o, sun_d, z_vals,
                               key=key)
    result["weights_sc"] = sc["weights"]
    result["transparency_sc"] = sc["transparency"]
    result["sun_sc"] = sc["sun"]
    return result


def render_rays(params: Dict, mcfg: ModelConfig, rcfg: RenderConfig,
                inp: RenderInputs, key, train: bool = False) -> Dict:
    """Render a batch of rays. params: {'coarse': net, ['fine': net], ['t': emb]}.

    Returns a dict with keys suffixed _coarse (and _fine when
    n_importance > 0), matching the reference contract consumed by losses
    and eval (rendering.py:289-291,331-332).
    """
    k_coarse, k_fine, k_pdf = jax.random.split(key, 3)
    coarse_params = dict(params)
    res_c = _render_one(coarse_params, mcfg, rcfg, inp, k_coarse, train,
                        "coarse")
    out = {f"{k}_coarse": v for k, v in res_c.items()}

    if rcfg.n_importance > 0 and "fine" in params:
        z_vals = res_c["z_vals"]
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_new = sample_pdf(k_pdf, z_mid, res_c["weights"][:, 1:-1],
                           rcfg.n_importance, det=(rcfg.perturb == 0))
        z_new = jax.lax.stop_gradient(z_new)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_new], axis=-1), axis=-1)

        rays = inp.rays
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        sun_d = rays[:, 8:11] if (rcfg.use_sat_sun and rays.shape[1] >= 11) \
            else jnp.ones_like(rays_o)
        t_emb = _lookup_t(params, inp.ts)
        net = params["fine"]
        if mcfg.variant == "nerf":
            res_f = inference_classic(net, mcfg, rcfg, rays_o, rays_d, z_all,
                                      key=k_fine)
        elif mcfg.variant in ("s-nerf", "sat-nerf", "sps-nerf"):
            res_f = inference_shadow(net, mcfg, rcfg, rays_o, rays_d, z_all,
                                     sun_d, t_emb=t_emb, key=k_fine)
        else:
            res_f = inference_spsbrdf(net, mcfg, rcfg, rays_o, rays_d, z_all,
                                      sun_d, t_emb=t_emb,
                                      cos_irra_on=inp.cos_irra_on, key=k_fine)
        out.update({f"{k}_fine": v for k, v in res_f.items()})
    return out
