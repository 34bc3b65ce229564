"""Per-variant volume-rendering inference over one set of z samples.

Re-designs the reference's `inference` free functions (models/nerf.py:72-147,
models/snerf.py:4-75, models/satnerf.py:5-100, models/spsbrdfnerf.py:71-416)
as pure functions over named head dicts: no chunk loops (XLA handles the
full (N_rays * N_samples) batch in one fused program), no flag-dependent
channel unpacking, explicit PRNG.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig, RenderConfig
from ..models.network import (apply_network, apply_network_with_normals,
                              analytic_normals)
from ..ops.compositing import composite, l2_normalize
from ..brdf.rpv import rpv_brdf
from ..brdf.hapke import hapke_brdf
from ..brdf.microfacet import microfacet_brdf


def _flat_points(rays_o, rays_d, z_vals):
    """(N,3),(N,3),(N,S) -> points (N,S,3)."""
    return rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]


def _expand(v, n_samples):
    """Per-ray (N,C) -> per-sample flat (N*S, C)."""
    if v is None:
        return None
    return jnp.repeat(v, n_samples, axis=0)


def inference_classic(params, mcfg: ModelConfig, rcfg: RenderConfig,
                      rays_o, rays_d, z_vals, key=None) -> Dict:
    """Vanilla NeRF (models/nerf.py:72-147): rgb_padding + plain compositing."""
    n_rays, n_samples = z_vals.shape
    xyz = _flat_points(rays_o, rays_d, z_vals).reshape(-1, 3)
    dirs = _expand(rays_d, n_samples)
    out = apply_network(params, mcfg, xyz, dirs=dirs)
    rgbs = out["rgb"].reshape(n_rays, n_samples, 3)
    rgbs = rgbs * (1 + 2 * mcfg.rgb_padding) - mcfg.rgb_padding  # nerf.py:273-274
    sigmas = out["sigma"].reshape(n_rays, n_samples)

    alphas, transparency, weights, depth = composite(
        z_vals, sigmas, rcfg.noise_std, key)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    result = {"rgb": rgb, "depth": depth, "weights": weights,
              "z_vals": z_vals, "sigmas": sigmas[..., None],
              "alphas": alphas, "transparency": transparency}
    if mcfg.normal in ("analystic", "analystic_learned"):
        na = analytic_normals(params, mcfg, xyz).reshape(n_rays, n_samples, 3)
        result["normal_an"] = na
    return result


def inference_shadow(params, mcfg: ModelConfig, rcfg: RenderConfig,
                     rays_o, rays_d, z_vals, sun_d,
                     t_emb: Optional[jnp.ndarray] = None, key=None) -> Dict:
    """s-nerf / sat-nerf / sps-nerf inference (snerf.py:4-75, satnerf.py:5-100):
    irradiance = sun_v + (1 - sun_v) * sky (s-nerf eq. 2)."""
    n_rays, n_samples = z_vals.shape
    xyz = _flat_points(rays_o, rays_d, z_vals).reshape(-1, 3)
    sun_flat = _expand(sun_d, n_samples)
    t_flat = _expand(t_emb, n_samples)
    out = apply_network(params, mcfg, xyz, dirs=None, sun_d=sun_flat,
                        t_emb=t_flat)
    rgbs = out["rgb"].reshape(n_rays, n_samples, 3)
    sigmas = out["sigma"].reshape(n_rays, n_samples)
    sun_v = out["sun_v"].reshape(n_rays, n_samples, 1)
    sky = out["sky"].reshape(n_rays, n_samples, 3)

    alphas, transparency, weights, depth = composite(
        z_vals, sigmas, rcfg.noise_std, key)
    irradiance = sun_v + (1.0 - sun_v) * sky
    rgb = jnp.clip(jnp.sum(weights[..., None] * rgbs * irradiance, axis=-2),
                   0.0, 1.0)
    result = {"rgb": rgb, "depth": depth, "weights": weights,
              "transparency": transparency, "albedo": rgbs, "sun": sun_v,
              "sky": sky, "sigmas": sigmas[..., None], "alphas": alphas,
              "z_vals": z_vals}
    if mcfg.beta and "beta" in out:
        result["beta"] = out["beta"].reshape(n_rays, n_samples, 1)
    if mcfg.normal in ("analystic", "analystic_learned"):
        result["normal_an"] = analytic_normals(params, mcfg, xyz).reshape(
            n_rays, n_samples, 3)
    return result


def sigma_pass(params, mcfg: ModelConfig, rcfg: RenderConfig,
               rays_o, rays_d, z_vals, key=None) -> Dict:
    """sigma_only=True pass (spsbrdfnerf.py:127-136).

    With rcfg.use_pallas the trunk runs through the fused Pallas kernel —
    legal even under jax.grad because every consumer of this pass applies
    stop_gradient (render.py _guided / sun-march)."""
    n_rays, n_samples = z_vals.shape
    xyz = _flat_points(rays_o, rays_d, z_vals).reshape(-1, 3)
    from ..ops.pallas_mlp import kernel_supports
    if rcfg.use_pallas and kernel_supports(mcfg):
        from ..ops.pallas_mlp import fused_sigma_fn
        sigmas = fused_sigma_fn(
            jax.lax.stop_gradient(params), mcfg,
            jax.lax.stop_gradient(xyz)).reshape(n_rays, n_samples)
    else:
        from ..models.network import sigma_fn
        sigmas = sigma_fn(params, mcfg, xyz).reshape(n_rays, n_samples)
    alphas, transparency, weights, depth = composite(
        z_vals, sigmas, rcfg.noise_std, key)
    return {"sigmas": sigmas[..., None], "depth": depth, "alphas": alphas,
            "weights": weights, "transparency": transparency, "z_vals": z_vals}


def solar_correction_pass(params, mcfg: ModelConfig, rcfg: RenderConfig,
                          rays_o, sun_d, z_vals, key=None) -> Dict:
    """Solar-correction pass for spsbrdf-nerf with sun_v='learned': march
    along SUN rays from each ray origin (xyz = o + sun_d * z, the s-nerf
    convention at rendering.py:199-204,219-224), compositing sigma for
    transparency/weights and querying the learned sun-visibility head at
    each sun-ray point.  This realizes the reference's *intended*
    rendering.py:278-284 block — its `inference_sun` was never defined, so
    the torch path NameErrors on this config."""
    from ..models.network import sigma_and_sun_v
    n_rays, n_samples = z_vals.shape
    xyz = _flat_points(rays_o, sun_d, z_vals).reshape(-1, 3)
    sun_flat = _expand(sun_d, n_samples)
    sigma, sun_v = sigma_and_sun_v(params, mcfg, xyz, sun_flat)
    sigmas = sigma.reshape(n_rays, n_samples)
    _, transparency, weights, _ = composite(z_vals, sigmas, rcfg.noise_std,
                                            key)
    return {"sun": sun_v.reshape(n_rays, n_samples, 1),
            "weights": weights, "transparency": transparency}


def inference_spsbrdf(params, mcfg: ModelConfig, rcfg: RenderConfig,
                      rays_o, rays_d, z_vals, sun_d,
                      t_emb: Optional[jnp.ndarray] = None,
                      sun_vis: Optional[jnp.ndarray] = None,
                      sun_weights: Optional[jnp.ndarray] = None,
                      cos_irra_on=None,
                      rows=None, cols=None, key=None) -> Dict:
    """Full SpSBRDF inference (spsbrdfnerf.py:71-416).

    sun_vis: optional (N_rays, N_samples, 1) analytic sun visibility from the
    sun-march sigma pass (rendering.py:244-259); cos_irra_on: dynamic bool
    scalar selecting the |cos(up_normal, sun)| irradiance (spsbrdfnerf.py:259-264).
    """
    n_rays, n_samples = z_vals.shape
    xyz = _flat_points(rays_o, rays_d, z_vals).reshape(-1, 3)
    dirs_flat = _expand(rays_d, n_samples) if mcfg.input_sizes[1] > 0 else None
    sun_flat = _expand(sun_d, n_samples)
    t_flat = _expand(t_emb, n_samples)

    apply_brdf = rcfg.apply_brdf
    nr_an_needed = mcfg.normal in ("analystic", "analystic_learned")
    nr_an_at_surface = nr_an_needed and rcfg.normal_at_surface
    if nr_an_needed and not nr_an_at_surface:
        out = apply_network_with_normals(
            params, mcfg, xyz, dirs=dirs_flat, sun_d=sun_flat,
            t_emb=t_flat, apply_brdf=apply_brdf,
            apply_theta=rcfg.apply_theta,
            nr_lr=mcfg.normal in ("analystic_learned", "learned"),
            fused_trunk=rcfg.fused_trunk)
    else:
        out = apply_network(
            params, mcfg, xyz, dirs=dirs_flat, sun_d=sun_flat,
            t_emb=t_flat, apply_brdf=apply_brdf,
            apply_theta=rcfg.apply_theta,
            nr_lr=mcfg.normal in ("analystic_learned", "learned"))

    albedo = out["rgb"].reshape(n_rays, n_samples, 3)
    sigmas = out["sigma"].reshape(n_rays, n_samples)

    # single-sample rays have unit weights (spsbrdfnerf.py:192-194)
    if n_samples == 1:
        weights = jnp.ones_like(z_vals)
        transparency = jnp.ones_like(z_vals)
        alphas = jnp.ones_like(z_vals)
        depth = jnp.sum(weights * z_vals, axis=-1)
    else:
        alphas, transparency, weights, depth = composite(
            z_vals, sigmas, rcfg.noise_std, key)

    albedo_accu = jnp.clip(jnp.sum(weights[..., None] * albedo, axis=-2),
                           0.0, 1.0)
    result: Dict = {"sigmas": sigmas[..., None], "albedo": albedo,
                    "albedo_accu": albedo_accu, "depth": depth,
                    "alphas": alphas, "weights": weights,
                    "transparency": transparency, "z_vals": z_vals}

    # sun visibility: learned head or analytic march (spsbrdfnerf.py:143-152)
    apply_sun_v = False
    sun_v = None
    if mcfg.sun_v == "learned" and "sun_v" in out:
        sun_v = out["sun_v"].reshape(n_rays, n_samples, 1)
        apply_sun_v = True
    elif mcfg.sun_v == "analystic" and sun_vis is not None:
        sun_v = sun_vis
        apply_sun_v = True

    if apply_sun_v:
        result["sun"] = sun_v
        if sun_weights is not None:
            result["weights_sc"] = sun_weights
    if mcfg.indirect_light and "sky" in out:
        result["sky"] = out["sky"].reshape(n_rays, n_samples, 3)
    if mcfg.beta and "beta" in out:
        result["beta"] = out["beta"].reshape(n_rays, n_samples, 1)

    # normals: analytic via density gradient (computed inside the shared
    # trunk fwd+bwd above, or once per ray at the expected surface when
    # rcfg.normal_at_surface), learned via head
    nr_an_on = mcfg.normal in ("analystic", "analystic_learned")
    nr_lr_on = mcfg.normal in ("learned", "analystic_learned")
    normal = None
    if nr_an_on:
        if nr_an_at_surface:
            x_surf = rays_o + rays_d * depth[:, None]
            n_surf = analytic_normals(params, mcfg, x_surf)   # (N, 3)
            normal_an = jnp.broadcast_to(n_surf[:, None, :],
                                         (n_rays, n_samples, 3))
        else:
            normal_an = out["normal_an"].reshape(n_rays, n_samples, 3)
        result["normal_an"] = normal_an
        normal = normal_an
    if nr_lr_on and "normal_lr" in out:
        normal_lr = out["normal_lr"].reshape(n_rays, n_samples, 3)
        result["normal_lr"] = normal_lr
        normal = normal_lr          # nr_lr preferred for BRDF (spsbrdfnerf.py:234-239)

    normal_s = None
    if normal is not None:
        normal_s = l2_normalize(
            jnp.sum(weights[..., None] * normal, axis=-2))      # (N, 3)
        view_dir = -rays_d
        nr_vw = jnp.sum(normal_s * view_dir, axis=-1)
        nr_sun = jnp.sum(normal_s * sun_d, axis=-1)
        result["nr_vw"] = nr_vw.reshape(n_rays, 1, 1)
        result["nr_sun"] = nr_sun.reshape(n_rays, 1, 1)
        result["hpk_scl"] = 1.0 / (mcfg.hpk_scl
                                   * (result["nr_vw"] + result["nr_sun"]))

    # irradiance (spsbrdfnerf.py:259-268)
    irradiance = jnp.ones_like(albedo)
    if apply_sun_v:
        irr_sun = jnp.tile(sun_v, (1, 1, 3))
        if mcfg.indirect_light and "sky" in result:
            irr_sun = sun_v + (1.0 - sun_v) * result["sky"]   # s-nerf eq. 2
        irradiance = irr_sun
    if normal is not None and cos_irra_on is not None:
        # fixed upward normal, not the learned one (spsbrdfnerf.py:261-262)
        nr_sun_up = jnp.abs(sun_d[:, None, 2:3])               # (N, 1, 1)
        irr_cos = jnp.ones_like(albedo) * nr_sun_up
        irradiance = jnp.where(cos_irra_on, irr_cos, irradiance)

    albedo_p = albedo * (1 + 2 * mcfg.rgb_padding) - mcfg.rgb_padding
    rgb_final = jnp.clip(
        jnp.sum(weights[..., None] * albedo_p * irradiance, axis=-2), 0.0, 1.0)
    result["rgb"] = rgb_final
    result["irradiance"] = irradiance
    albedo_s = jnp.sum(weights[..., None] * albedo_p, axis=-2)

    # ------------------------------------------------ BRDF branches
    brdf_active = apply_brdf or (mcfg.uses_hapke and mcfg.shell_hapke > 0)
    if brdf_active:
        if normal is None:
            raise ValueError(
                "apply_brdf requires a normal mode ('analystic', 'learned' "
                "or 'analystic_learned'), got normal='none': the BRDF "
                "geometry terms need surface normals (spsbrdfnerf.py:234-239)")

        def accum(v):   # per-sample (N,S,3) -> per-ray weighted sum (N,3)
            return jnp.sum(weights[..., None] * v, axis=-2)

        if mcfg.multi_brdf:
            pts2l = sun_flat
            pts2c = -_expand(rays_d, n_samples)
            nrm = normal.reshape(-1, 3)
            alb = albedo.reshape(-1, 3)
        else:
            pts2l, pts2c, nrm, alb = sun_d, -rays_d, normal_s, albedo_s

        brdf = None
        if mcfg.roughness and apply_brdf:
            rough = out["roughness"].reshape(n_rays, n_samples, 1)
            result["roughness"] = rough
            if mcfg.multi_brdf:
                rough_in = rough.reshape(-1, 1)
            else:
                rough_in = jnp.sum(weights * rough[..., 0], axis=-1,
                                   keepdims=True)
            glossy, brdf, f, g, d, ldn, vdn, h, n_h = microfacet_brdf(
                pts2l, pts2c, nrm, alb, rough_in, f0=mcfg.fresnel_f0,
                glossy_scale=mcfg.glossy_scale)
            ns_b = n_samples if mcfg.multi_brdf else 1
            result.update(
                glossy=glossy.reshape(n_rays, ns_b, 1),
                brdf=brdf.reshape(n_rays, ns_b, 3),
                f=f.reshape(n_rays, ns_b, 1), g=g.reshape(n_rays, ns_b, 1),
                d=d.reshape(n_rays, ns_b, 1),
                l_dot_n=ldn.reshape(n_rays, ns_b, 1),
                v_dot_n=vdn.reshape(n_rays, ns_b, 1),
                halfvec=h.reshape(n_rays, ns_b, 3),
                n_h=n_h.reshape(n_rays, ns_b, 1))
        elif mcfg.rpv and apply_brdf:
            def per_sample(name):
                return (out[name].reshape(-1, 3) if mcfg.multi_brdf
                        else accum(out[name].reshape(n_rays, n_samples, 3)))
            k = per_sample("rpv_k") if mcfg.func_m else None
            th = per_sample("rpv_theta") if mcfg.func_f else None
            if mcfg.func_h == 2:
                rc = alb                                  # spsbrdfnerf.py:306,317
            elif mcfg.func_h:
                rc = per_sample("rpv_rhoc")
            else:
                rc = None
            brdf, m1, f, g, h, ci, cv = rpv_brdf(pts2l, pts2c, nrm, alb, k,
                                                 th, rc)
            ns_b = n_samples if mcfg.multi_brdf else 1
            # diagnostic keys beyond the reference (it stores only
            # rpv_k/theta/rhoc, spsbrdfnerf.py:376-382): every factor of
            # brdf = w * M1 * F * H plus the hotspot distance G
            result.update(
                brdf=brdf.reshape(n_rays, ns_b, 3),
                rpv_M1=m1.reshape(n_rays, ns_b, -1),
                rpv_F=f.reshape(n_rays, ns_b, -1),
                rpv_G=g.reshape(n_rays, ns_b, -1),
                rpv_H=h.reshape(n_rays, ns_b, -1),
                rpv_ci=ci.reshape(n_rays, ns_b, 1),
                rpv_cv=cv.reshape(n_rays, ns_b, 1))
            if mcfg.func_m:
                result["rpv_k"] = out["rpv_k"].reshape(n_rays, n_samples, 3)
            if mcfg.func_f:
                result["rpv_theta"] = out["rpv_theta"].reshape(n_rays, n_samples, 3)
            if mcfg.func_h == 1:
                result["rpv_rhoc"] = out["rpv_rhoc"].reshape(n_rays, n_samples, 3)
        elif mcfg.uses_hapke:
            b = c = theta = None
            if apply_brdf and mcfg.hapke_b:
                hb = out["hpk_b"].reshape(n_rays, n_samples, 3)
                result["hpk_b"] = hb
                b = hb.reshape(-1, 3) if mcfg.multi_brdf else accum(hb)
            if apply_brdf and mcfg.hapke_c:
                hc = out["hpk_c"].reshape(n_rays, n_samples, 3)
                result["hpk_c"] = hc
                c = hc.reshape(-1, 3) if mcfg.multi_brdf else accum(hc)
            if rcfg.apply_theta and mcfg.hapke_theta and "hpk_theta" in out:
                ht = out["hpk_theta"].reshape(n_rays, n_samples, 1)
                result["hpk_theta"] = ht
                theta = (ht.reshape(-1) if mcfg.multi_brdf
                         else jnp.sum(weights * ht[..., 0], axis=-1))
            brdf, p, bk, hi, hv, shad, ci, cv = hapke_brdf(
                pts2l, pts2c, nrm, alb, b, c, theta,
                hpk_scl=mcfg.hpk_scl, shell_hapke=mcfg.shell_hapke)
            ns_b = n_samples if mcfg.multi_brdf else 1
            result.update(
                brdf=brdf.reshape(n_rays, ns_b, 3),
                hpk_P=p.reshape(n_rays, ns_b, 3),
                hpk_Hi=hi.reshape(n_rays, ns_b, 3),
                hpk_Hv=hi.reshape(n_rays, ns_b, 3),    # (sic) mirrors spsbrdfnerf.py:387
                hpk_ci=ci.reshape(n_rays, ns_b, 1),
                hpk_cv=cv.reshape(n_rays, ns_b, 1),
                hpk_ShadFunc=shad.reshape(n_rays, ns_b, 1))

        if brdf is not None:
            if mcfg.multi_brdf:
                brdf3 = brdf.reshape(n_rays, n_samples, 3)
                brdf3 = brdf3 * (1 + 2 * mcfg.rgb_padding) - mcfg.rgb_padding
                rgb_final = jnp.sum(weights[..., None] * brdf3 * irradiance,
                                    axis=-2)
            else:
                rgb_final = irradiance[:, -1, :] * brdf.reshape(n_rays, 3)
            result["rgb"] = jnp.clip(rgb_final, 0.0, 1.0)

    result["rays_d"] = (-rays_d).reshape(n_rays, 1, 3)
    result["sun_d"] = sun_d.reshape(n_rays, 1, 3)

    if rows is not None and cols is not None:
        # debug reference sphere (spsbrdfnerf.py:404-412)
        ref = jnp.ones((n_rays, 1, 3), dtype=albedo.dtype)
        ref = ref.at[:, :, 0].set(cols.reshape(n_rays, 1))
        ref = ref.at[:, :, 1].set(-rows.reshape(n_rays, 1))
        ref = ref.at[:, :, 2].set(
            jnp.sqrt(jnp.abs(1 - rows * rows - cols * cols)).reshape(n_rays, 1))
        result["ref_sphere"] = ref
    return result
