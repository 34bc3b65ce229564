"""Golden parity tests against the ACTUAL reference implementation.

The reference's BRDF physics, compositing, samplers, and positional
encoding are pure torch math, runnable on CPU.  These tests import the
reference modules directly (stubbing its missing native deps) and compare
our jnp implementations on identical random inputs — direct numerical
evidence of fidelity, not just oracle re-derivations.

Skipped wholesale if /root/reference is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _have_torch() -> bool:
    try:
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and _have_torch()),
    reason="reference repo not mounted or torch unavailable")


@pytest.fixture(scope="module")
def ref():
    """Import reference modules with missing native deps stubbed (the
    stubs are removed at teardown so they can't shadow real imports in
    later-collected tests)."""
    from conftest import stub_reference_deps, unstub_reference_deps
    stubbed = stub_reference_deps()
    sys.path.insert(0, REF)
    try:
        import torch
        torch.manual_seed(0)
        import BRDF.basic_func as basic_func
        import BRDF.RPV as RPV
        import BRDF.Hapke as Hapke
        import BRDF.microfacet as microfacet
        import models.nerf as ref_nerf
        yield types.SimpleNamespace(
            torch=torch, basic_func=basic_func, RPV=RPV, Hapke=Hapke,
            microfacet=microfacet, nerf=ref_nerf)
    finally:
        sys.path.remove(REF)
        unstub_reference_deps(stubbed)


def _geometry(n=256, seed=0):
    """Random-ish but non-grazing light/view/normal unit vectors."""
    rng = np.random.RandomState(seed)
    def unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)
    normal = unit(np.stack([rng.uniform(-0.3, 0.3, n),
                            rng.uniform(-0.3, 0.3, n),
                            rng.uniform(0.8, 1.0, n)], -1)).astype(np.float32)
    light = unit(np.stack([rng.uniform(-0.5, 0.5, n),
                           rng.uniform(-0.5, 0.5, n),
                           rng.uniform(0.6, 1.0, n)], -1)).astype(np.float32)
    view = unit(np.stack([rng.uniform(-0.5, 0.5, n),
                          rng.uniform(-0.5, 0.5, n),
                          rng.uniform(0.6, 1.0, n)], -1)).astype(np.float32)
    return light, view, normal


def test_calc_angles_parity(ref):
    from brdfnerf_tpu.brdf.common import calc_angles
    t = ref.torch
    l, v, n = _geometry()
    ours = calc_angles(jnp.asarray(l), jnp.asarray(v), jnp.asarray(n))
    ci, sza, si, cv, vza, sv, cg, g, phi = ref.basic_func.calc_angles(
        t.from_numpy(l), t.from_numpy(v), t.from_numpy(n))
    np.testing.assert_allclose(np.asarray(ours.ci), ci.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ours.cv), cv.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ours.cg), cg.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ours.g), g.numpy(), atol=1e-4)
    # phi can differ at exact-degenerate geometry; these inputs avoid it
    np.testing.assert_allclose(np.asarray(ours.phi), phi.numpy(), atol=5e-3)


def test_rpv_parity(ref):
    from brdfnerf_tpu.brdf.rpv import rpv_brdf
    t = ref.torch
    l, v, n = _geometry()
    rng = np.random.RandomState(1)
    w = rng.uniform(0.1, 0.9, (256, 3)).astype(np.float32)
    k = rng.uniform(0.4, 1.6, (256, 3)).astype(np.float32)
    theta = rng.uniform(-0.6, 0.6, (256, 3)).astype(np.float32)
    rhoc = rng.uniform(0.1, 0.9, (256, 3)).astype(np.float32)

    brdf_ours, *_ = rpv_brdf(jnp.asarray(l), jnp.asarray(v), jnp.asarray(n),
                             jnp.asarray(w), jnp.asarray(k),
                             jnp.asarray(theta), jnp.asarray(rhoc))
    model = ref.RPV.RPV()
    out = model(t.from_numpy(l), t.from_numpy(v), t.from_numpy(n),
                t.from_numpy(w), t.from_numpy(k), t.from_numpy(theta),
                t.from_numpy(rhoc))
    brdf_ref = out[0] if isinstance(out, tuple) else out
    np.testing.assert_allclose(np.asarray(brdf_ours),
                               brdf_ref.detach().numpy(),
                               rtol=2e-4, atol=2e-5)


def test_hapke_parity(ref):
    from brdfnerf_tpu.brdf.hapke import hapke_brdf
    t = ref.torch
    l, v, n = _geometry()
    rng = np.random.RandomState(2)
    w = rng.uniform(0.1, 0.9, (256, 3)).astype(np.float32)
    b = rng.uniform(0.05, 0.95, (256, 3)).astype(np.float32)
    c = rng.uniform(0.05, 0.95, (256, 3)).astype(np.float32)
    theta = rng.uniform(0.01, 0.5, 256).astype(np.float32)

    ours, *_ = hapke_brdf(jnp.asarray(l), jnp.asarray(v), jnp.asarray(n),
                          jnp.asarray(w), jnp.asarray(b), jnp.asarray(c),
                          jnp.asarray(theta), hpk_scl=4.0)
    args = types.SimpleNamespace(hpk_scl=4.0, shell_hapke=0)
    model = ref.Hapke.Hapke(args)
    out = model(t.from_numpy(l), t.from_numpy(v), t.from_numpy(n),
                t.from_numpy(w), b=t.from_numpy(b), c=t.from_numpy(c),
                theta=t.from_numpy(theta))
    brdf_ref = (out[0] if isinstance(out, tuple) else out).detach().numpy()
    # our mu0/mu_eff floors only bind at grazing angles, absent here
    np.testing.assert_allclose(np.asarray(ours), brdf_ref,
                               rtol=1e-3, atol=1e-4)


def test_microfacet_parity(ref):
    from brdfnerf_tpu.brdf.microfacet import microfacet_brdf
    t = ref.torch
    l, v, n = _geometry()
    rng = np.random.RandomState(3)
    albedo = rng.uniform(0.1, 0.9, (256, 3)).astype(np.float32)
    rough = rng.uniform(0.2, 0.9, (256, 1)).astype(np.float32)

    glossy_ours, brdf_ours, *_ = microfacet_brdf(
        jnp.asarray(l), jnp.asarray(v), jnp.asarray(n),
        jnp.asarray(albedo), jnp.asarray(rough))
    model = ref.microfacet.Microfacet()
    out = model(t.from_numpy(l)[:, None, :], t.from_numpy(v),
                t.from_numpy(n), t.from_numpy(albedo), t.from_numpy(rough))
    # reference returns (glossy (N,L), brdf (N,L,3), f, g, d, ...)
    glossy_ref = out[0].detach().numpy()
    brdf_ref = out[1].detach().numpy()
    np.testing.assert_allclose(np.asarray(glossy_ours).reshape(-1),
                               glossy_ref.reshape(-1), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(brdf_ours).reshape(-1, 3),
                               brdf_ref.reshape(-1, 3), rtol=2e-4, atol=2e-5)


def test_positional_encoding_parity(ref):
    from brdfnerf_tpu.ops.encoding import positional_encoding
    t = ref.torch
    mapper = ref.nerf.Mapping(10, 3)
    x = np.random.RandomState(4).uniform(-2, 2, (64, 3)).astype(np.float32)
    ref_out = mapper(t.from_numpy(x)).numpy()
    ours = np.asarray(positional_encoding(jnp.asarray(x), 10))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=2e-5)


def test_compositing_parity(ref):
    """Our composite vs the reference's inference compositing block
    (models/nerf.py:117-133 math re-run in torch here)."""
    import torch as t
    from brdfnerf_tpu.ops.compositing import composite
    rng = np.random.RandomState(5)
    z = np.sort(rng.uniform(0, 2, (32, 16)).astype(np.float32), -1)
    sigma = rng.uniform(0, 3, (32, 16)).astype(np.float32)

    alphas, transp, weights, depth = composite(jnp.asarray(z),
                                               jnp.asarray(sigma))
    zt = t.from_numpy(z)
    st = t.from_numpy(sigma)
    deltas = zt[:, 1:] - zt[:, :-1]
    delta_inf = 1e10 * t.ones_like(deltas[:, :1])
    deltas = t.cat([deltas, delta_inf], -1)
    a = 1 - t.exp(-deltas * t.relu(st))
    as_ = t.cumprod(t.cat([t.ones_like(a[:, :1]), 1 - a + 1e-10], -1), -1)
    w = a * as_[:, :-1]
    np.testing.assert_allclose(np.asarray(alphas), a.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(weights), w.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth),
                               (w * zt).sum(-1).numpy(), rtol=1e-5,
                               atol=1e-6)


def test_sample_pdf_parity(ref):
    """Our inverse-CDF sampler vs the reference's sample_pdf
    (rendering.py:13-52) in deterministic mode."""
    import importlib, torch as t
    rendering = importlib.import_module("rendering")
    from brdfnerf_tpu.ops.sampling import sample_pdf
    rng = np.random.RandomState(6)
    bins = np.sort(rng.uniform(0, 2, (16, 33)).astype(np.float32), -1)
    w = rng.uniform(0, 1, (16, 32)).astype(np.float32)
    ours = np.asarray(sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                                 jnp.asarray(w), 24, det=True))
    refs = rendering.sample_pdf(t.from_numpy(bins), t.from_numpy(w), 24,
                                det=True).numpy()
    np.testing.assert_allclose(ours, refs, rtol=1e-4, atol=1e-5)


def test_sample_3sigma_parity(ref):
    """Gaussian band sampler vs reference sample_3sigma (rendering.py:54-74),
    deterministic mode."""
    import importlib, torch as t
    rendering = importlib.import_module("rendering")
    from brdfnerf_tpu.ops.sampling import sample_gaussian_3sigma
    low = np.full(8, 0.2, np.float32)
    high = np.full(8, 1.8, np.float32)
    ours = np.asarray(sample_gaussian_3sigma(
        jax.random.PRNGKey(0), jnp.asarray(low), jnp.asarray(high), 16,
        det=True))
    refs = rendering.sample_3sigma(t.from_numpy(low), t.from_numpy(high),
                                   16, True, 0.2, 1.8).numpy()
    np.testing.assert_allclose(ours, refs, rtol=1e-4, atol=1e-5)


def test_full_model_parity(ref):
    """Model-level golden test: build the reference SpSBRDFNeRF (torch),
    copy OUR weights into its state_dict, and compare the full forward
    (sigma, rgb, RPV heads, analytic normals) on identical points.
    Exact sin + f32 for bit-comparable numerics."""
    import importlib
    import torch as t
    spsb = importlib.import_module("models.spsbrdfnerf")
    from brdfnerf_tpu.config import ModelConfig
    from brdfnerf_tpu.models.network import (init_network,
                                             apply_network_with_normals)

    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      layers=4, feat=64, skips=(2,), normal="analystic",
                      func_m=True, func_f=True, func_h=1, dim_rpv=1,
                      fast_sin=False)
    params = init_network(jax.random.PRNGKey(0), cfg)

    args = types.SimpleNamespace(
        input_viewdir=False, funcM=True, funcF=True, funcH=1,
        b=False, c=False, theta=False)
    model = spsb.SpSBRDFNeRF(args, layers=4, feat=64, mapping=True,
                             mapping_sizes=[10, 4], skips=[2], siren=True,
                             beta=False, roughness=False,
                             normal="analystic", sun_v="none",
                             indirect_light=False, dim_RPV=1)

    # copy our params into the torch state_dict (torch Linear stores W^T)
    sd = model.state_dict()

    def put(name, layer):
        sd[name + ".weight"] = t.from_numpy(
            np.asarray(layer["w"]).T.copy())
        sd[name + ".bias"] = t.from_numpy(np.asarray(layer["b"]).copy())

    for i, li in enumerate(params["fc_net"]):
        put(f"fc_net.{2 * i}", li)
    put("sigma_from_xyz.0", params["sigma_from_xyz"][0])
    put("feats_from_xyz", params["feats_from_xyz"][0])
    put("rgb_from_xyzdir.0", params["rgb_from_xyzdir"][0])
    put("rgb_from_xyzdir.2", params["rgb_from_xyzdir"][1])
    for ours_name, ref_name in (("k_from_xyz", "k_from_xyz"),
                                ("theta_rpv_from_xyz", "theta_rpv_from_xyz"),
                                ("rhoc_from_xyz", "rhoc_from_xyz")):
        put(f"{ref_name}.0", params[ours_name][0])
        put(f"{ref_name}.2", params[ours_name][1])
    model.load_state_dict(sd)
    model.eval()

    xyz = np.random.RandomState(7).uniform(-1, 1, (128, 3)).astype(np.float32)
    ours = apply_network_with_normals(params, cfg, jnp.asarray(xyz),
                                      apply_brdf=True)

    xt = t.from_numpy(xyz)
    xt.requires_grad_(True)
    out = model(xt, sigma_only=False, apply_brdf=True, nr_an_on=True)
    out = out.detach().numpy()
    # layout: rgb(3) sigma(1) normal_an(3) k(3) theta(3) rhoc(3)
    np.testing.assert_allclose(np.asarray(ours["rgb"]), out[:, 0:3],
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["sigma"]), out[:, 3],
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["normal_an"]), out[:, 4:7],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["rpv_k"]), out[:, 7:10],
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["rpv_theta"]), out[:, 10:13],
                               rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(ours["rpv_rhoc"]), out[:, 13:16],
                               rtol=1e-4, atol=2e-5)


def test_render_level_parity(ref):
    """Render-level golden test: the reference `inference` (volume
    rendering + RPV shading, spsbrdfnerf.py:71-416) vs our
    inference_spsbrdf on identical weights, rays, and z samples."""
    import importlib
    import torch as t
    spsb = importlib.import_module("models.spsbrdfnerf")
    from brdfnerf_tpu.config import ModelConfig, RenderConfig
    from brdfnerf_tpu.models.network import init_network
    from brdfnerf_tpu.render.inference import inference_spsbrdf

    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      layers=4, feat=64, skips=(2,), normal="analystic",
                      func_m=True, func_f=True, func_h=1, dim_rpv=1,
                      fast_sin=False)
    rcfg = RenderConfig(n_samples=8, guided_samples=0, apply_brdf=True,
                        perturb=0.0)
    params = init_network(jax.random.PRNGKey(0), cfg)

    args = types.SimpleNamespace(
        input_viewdir=False, funcM=True, funcF=True, funcH=1,
        b=False, c=False, theta=False, chunk=100000, noise_std=0.0,
        MultiBRDF=False, hpk_scl=4.0, shell_hapke=0, beta=False,
        sc_lambda=0.0, roughness=False, f0=0.04, glossy_scale=1.0)
    model = spsb.SpSBRDFNeRF(args, layers=4, feat=64, mapping=True,
                             mapping_sizes=[10, 4], skips=[2], siren=True,
                             beta=False, roughness=False,
                             normal="analystic", sun_v="none",
                             indirect_light=False, dim_RPV=1,
                             MultiBRDF=False)
    sd = model.state_dict()

    def put(name, layer):
        sd[name + ".weight"] = t.from_numpy(np.asarray(layer["w"]).T.copy())
        sd[name + ".bias"] = t.from_numpy(np.asarray(layer["b"]).copy())

    for i, li in enumerate(params["fc_net"]):
        put(f"fc_net.{2 * i}", li)
    put("sigma_from_xyz.0", params["sigma_from_xyz"][0])
    put("feats_from_xyz", params["feats_from_xyz"][0])
    put("rgb_from_xyzdir.0", params["rgb_from_xyzdir"][0])
    put("rgb_from_xyzdir.2", params["rgb_from_xyzdir"][1])
    for n2 in ("k_from_xyz", "theta_rpv_from_xyz", "rhoc_from_xyz"):
        put(f"{n2}.0", params[n2][0])
        put(f"{n2}.2", params[n2][1])
    model.load_state_dict(sd)
    model.eval()

    # geometry: oblique rays over [-1,1]^2, sorted z
    rng = np.random.RandomState(8)
    n_rays, n_s = 16, 8
    o = rng.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
    d = np.tile(np.asarray([[0.05, 0.02, -1.0]], np.float32), (n_rays, 1))
    d /= np.linalg.norm(d, -1, keepdims=True)
    sun = np.tile(np.asarray([[0.3, 0.2, 0.93]], np.float32), (n_rays, 1))
    sun /= np.linalg.norm(sun, -1, keepdims=True)
    z = np.sort(rng.uniform(0.1, 2.0, (n_rays, n_s)).astype(np.float32), -1)

    ours = inference_spsbrdf(params, cfg, rcfg, jnp.asarray(o),
                             jnp.asarray(d), jnp.asarray(z),
                             jnp.asarray(sun), cos_irra_on=None)

    xyz = o[:, None, :] + d[:, None, :] * z[..., None]
    refs = spsb.inference(model, args,
                          t.from_numpy(xyz), t.from_numpy(z),
                          rays_d=t.from_numpy(d), sun_d=t.from_numpy(sun),
                          apply_brdf=True, mode="test")
    if isinstance(refs, tuple):
        refs = refs[0]

    # the reference result has no 'brdf' key on the RPV path; 'rgb' is the
    # RPV-shaded output (irradiance[:, -1] * brdf), so it covers the BRDF
    for key, atol in (("rgb", 5e-4), ("depth", 1e-4), ("weights", 1e-4),
                      ("sigmas", 1e-3), ("rpv_k", 5e-4),
                      ("irradiance", 5e-4)):
        assert key in refs, (key, list(refs))
        np.testing.assert_allclose(
            np.asarray(ours[key]).squeeze(),
            refs[key].detach().numpy().squeeze(),
            rtol=2e-3, atol=atol, err_msg=key)


def _kornia053_ssim_map(torch, img1, img2, window_size, max_val):
    """Faithful torch transcription of kornia==0.5.3 kornia.losses.ssim
    (the exact function the reference binds as ssim__, metrics.py:7,
    requirements.txt:10; kornia itself is not installed in this image):
    gaussian window sigma=(1.5,1.5), SAME-size output via filter2D's
    default border_type='reflect', and num/(den + 1e-12) per-pixel map."""
    import torch.nn.functional as F
    x = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(x ** 2) / (2.0 * 1.5 ** 2))
    g = g / g.sum()
    kernel2d = torch.outer(g, g).to(img1.dtype)

    def filter2d(inp):
        c = inp.shape[1]
        pad = (window_size - 1) // 2
        inp_p = F.pad(inp, (pad, pad, pad, pad), mode="reflect")
        k = kernel2d.expand(c, 1, window_size, window_size)
        return F.conv2d(inp_p, k, groups=c)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu1, mu2 = filter2d(img1), filter2d(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = filter2d(img1 * img1) - mu1_sq
    sigma2_sq = filter2d(img2 * img2) - mu2_sq
    sigma12 = filter2d(img1 * img2) - mu1_mu2
    num = (2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    return num / (den + 1e-12)


def _ref_ssim(torch, pred_hwc, gt_hwc, mask_hw1=None):
    """Reference metrics.ssim_ call convention (metrics.py:327-341): images
    reshaped to (1,3,H,W), optionally mask-multiplied BEFORE the call
    (main.py:607, eval.py:471), max_val = np.max(gt) of the (masked) gt,
    torch.mean over the kornia map."""
    p = torch.from_numpy(np.ascontiguousarray(
        pred_hwc.transpose(2, 0, 1)))[None]
    g = torch.from_numpy(np.ascontiguousarray(
        gt_hwc.transpose(2, 0, 1)))[None]
    if mask_hw1 is not None:
        m = torch.from_numpy(np.ascontiguousarray(
            mask_hw1.transpose(2, 0, 1)))[None]
        p, g = p * m, g * m
    max_val = float(np.max(g.numpy()))
    return float(torch.mean(
        _kornia053_ssim_map(torch, p, g, 3, max_val)))


def test_ssim_kornia_parity(ref):
    """Our jnp ssim == kornia-0.5.3 torch oracle, masked and unmasked,
    under the reference's exact call convention."""
    from brdfnerf_tpu.metrics import ssim as our_ssim, scale_images
    rng = np.random.RandomState(7)
    h, w = 37, 29
    gt = rng.uniform(0.0, 0.83, (h, w, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.08, gt.shape), 0, 1).astype(
        np.float32)
    mask = (rng.uniform(size=(h, w, 1)) > 0.35).astype(np.float32)

    # unmasked (ssim_all, main.py:606)
    ours = float(our_ssim(jnp.asarray(pred), jnp.asarray(gt)))
    theirs = _ref_ssim(ref.torch, pred, gt)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # masked (ssim_, main.py:607 / eval.py:471): BOTH images premultiplied,
    # max_val picked from gt*mask
    ours_m = float(our_ssim(jnp.asarray(pred * mask), jnp.asarray(gt * mask)))
    theirs_m = _ref_ssim(ref.torch, pred, gt, mask)
    np.testing.assert_allclose(ours_m, theirs_m, atol=1e-5)
    # masking must actually change the statistic on this fixture
    assert abs(ours_m - ours) > 1e-4

    # scl variant (metrics.sclimg then ssim, eval.py:471 scl=True)
    ps, gs = scale_images(jnp.asarray(pred), jnp.asarray(gt))
    ours_scl = float(our_ssim(np.asarray(ps) * mask, np.asarray(gs) * mask))
    theirs_scl = _ref_ssim(ref.torch, pred / gt.max(), gt / gt.max(), mask)
    np.testing.assert_allclose(ours_scl, theirs_scl, atol=1e-5)


def test_psnr_masked_parity(ref):
    """Our masked PSNR == the reference's boolean-indexed per-element mean
    (metrics.py:292-316) incl. the max(gt)^2 normalization."""
    from brdfnerf_tpu.metrics import psnr as our_psnr
    t = ref.torch
    rng = np.random.RandomState(3)
    h, w = 23, 31
    gt = rng.uniform(0.0, 0.9, (h, w, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(
        np.float32)
    mask = (rng.uniform(size=(h, w, 1)) > 0.4)

    value = t.from_numpy((pred - gt) ** 2) / float((gt.max()) ** 2)
    vm = t.from_numpy(np.broadcast_to(mask, value.shape).copy())
    ref_psnr = float(-10.0 * t.log10(t.mean(value[vm])))
    ours = float(our_psnr(jnp.asarray(pred), jnp.asarray(gt),
                          jnp.asarray(mask.astype(np.float32))))
    np.testing.assert_allclose(ours, ref_psnr, atol=1e-4)
