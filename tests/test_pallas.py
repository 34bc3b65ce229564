"""Pallas fused trunk kernel: numerical parity with the XLA reference path
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brdfnerf_tpu.config import ModelConfig
from brdfnerf_tpu.models.network import init_network, sigma_fn, \
    _trunk_features
from brdfnerf_tpu.ops.pallas_mlp import fused_trunk_sigma, fused_sigma_fn
from brdfnerf_tpu.ops.encoding import positional_encoding


@pytest.mark.parametrize("siren,mapping", [(True, True), (False, True),
                                           (True, False)])
def test_fused_matches_reference(siren, mapping):
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=siren, mapping=mapping,
                      layers=4, feat=128, skips=(2,))
    params = init_network(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (300, 3), minval=-1.0,
                             maxval=1.0)
    enc = (positional_encoding(xyz, cfg.mapping_sizes[0], fast=cfg.fast_sin)
           if mapping else xyz)

    sig_p, feats_p = fused_trunk_sigma(params, cfg, enc, interpret=True)
    sig_r = sigma_fn(params, cfg, xyz)
    feats_r = _trunk_features(params, cfg, xyz)

    np.testing.assert_allclose(np.asarray(sig_p), np.asarray(sig_r),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(feats_p), np.asarray(feats_r),
                               atol=2e-5, rtol=2e-5)


def test_fused_sigma_fn_unpadded_sizes():
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      layers=4, feat=128, skips=(2,))
    params = init_network(jax.random.PRNGKey(0), cfg)
    for n in (1, 7, 511, 513):
        xyz = jax.random.uniform(jax.random.PRNGKey(n), (n, 3))
        got = fused_sigma_fn(params, cfg, xyz, interpret=True)
        ref = sigma_fn(params, cfg, xyz)
        assert got.shape == (n,)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_fused_default_reference_arch():
    """The real 8x512 skip-(4,) architecture."""
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      layers=8, feat=512, skips=(4,))
    params = init_network(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
    got = fused_sigma_fn(params, cfg, xyz, interpret=True)
    ref = sigma_fn(params, cfg, xyz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


# ------------------------------------------------ fused trunk custom VJP

def _xla_triple(params, cfg, xyz):
    """Pure-XLA twin of trunk_core semantics: (sigma, feats, d sigma/d xyz)."""
    from brdfnerf_tpu.models.network import _head

    def f(x):
        feats = _trunk_features(params, cfg, x)
        sigma = _head(params, cfg, "sigma_from_xyz", feats,
                      final="softplus")[..., 0]
        return sigma, feats

    gx = jax.grad(lambda x: jnp.sum(f(x)[0]))(xyz)
    sigma, feats = f(xyz)
    return sigma, feats, gx


@pytest.mark.parametrize("fast_sin,mapping", [(True, True), (False, True),
                                              (True, False)])
def test_fused_vjp_forward_parity(fast_sin, mapping):
    from brdfnerf_tpu.ops.pallas_trunk_vjp import fused_trunk_with_grad
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=mapping,
                      fast_sin=fast_sin, layers=4, feat=128, skips=(2,),
                      compute_dtype="float32")
    params = init_network(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (70, 3), minval=-1.0,
                             maxval=1.0)
    s_f, f_f, g_f = fused_trunk_with_grad(params, cfg, xyz)
    s_r, f_r, g_r = _xla_triple(params, cfg, xyz)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_r),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_r),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=3e-4, rtol=3e-4)


@pytest.mark.parametrize("fast_sin", [True, False])
def test_fused_vjp_gradient_parity(fast_sin):
    """The hand-derived second-order VJP matches XLA autodiff: gradients
    w.r.t. EVERY trunk + sigma-head parameter of a loss touching sigma,
    feats AND the analytic normal gradient agree (VERDICT round-1 ask)."""
    from brdfnerf_tpu.ops.pallas_trunk_vjp import fused_trunk_with_grad
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      fast_sin=fast_sin, layers=4, feat=128, skips=(2,),
                      compute_dtype="float32")
    params = init_network(jax.random.PRNGKey(0), cfg)
    n = 70
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-1.0,
                             maxval=1.0)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    c_s = jax.random.normal(ks[0], (n,))
    c_f = jax.random.normal(ks[1], (n, cfg.feat)) * 0.1
    c_g = jax.random.normal(ks[2], (n, 3))

    def loss(triple_fn, p):
        s, f, g = triple_fn(p, cfg, xyz)
        # l2_normalize mimics the normal_an consumption downstream
        from brdfnerf_tpu.ops.compositing import l2_normalize
        nrm = -l2_normalize(g)
        return (jnp.sum(c_s * s) + jnp.sum(c_f * f)
                + jnp.sum(c_g * nrm))

    v_r, g_r = jax.value_and_grad(
        lambda p: loss(_xla_triple, p))(params)
    v_f, g_f = jax.value_and_grad(
        lambda p: loss(lambda p2, c, x: fused_trunk_with_grad(p2, c, x),
                       p))(params)
    np.testing.assert_allclose(float(v_f), float(v_r), atol=1e-3, rtol=1e-4)

    flat_r = jax.tree_util.tree_leaves_with_path(g_r)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_f)}
    checked = 0
    for k, v_ref in flat_r:
        ks_ = jax.tree_util.keystr(k)
        if not (ks_.startswith("['fc_net']")
                or ks_.startswith("['sigma_from_xyz']")):
            continue
        v_got = flat_f[ks_]
        scale = max(float(jnp.max(jnp.abs(v_ref))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(v_got), np.asarray(v_ref),
            atol=2e-4 * scale, rtol=2e-3, err_msg=ks_)
        checked += 1
    assert checked >= 2 * cfg.layers + 2    # every w and b


def test_fused_vjp_gradient_parity_8layer():
    """The REAL flagship depth: 8 layers, skip at 4 — six mid layers whose
    forward/reverse index bookkeeping differs from the 4-layer cases the
    other parity tests cover."""
    from brdfnerf_tpu.ops.pallas_trunk_vjp import fused_trunk_with_grad
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      layers=8, feat=128, skips=(4,),
                      compute_dtype="float32")
    params = init_network(jax.random.PRNGKey(0), cfg)
    n = 40
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-1.0,
                             maxval=1.0)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    c_s = jax.random.normal(ks[0], (n,))
    c_f = jax.random.normal(ks[1], (n, cfg.feat)) * 0.1
    c_g = jax.random.normal(ks[2], (n, 3))

    def loss(triple_fn, p):
        s, f, g = triple_fn(p, cfg, xyz)
        return (jnp.sum(c_s * s) + jnp.sum(c_f * f) + jnp.sum(c_g * g))

    v_r, g_r = jax.value_and_grad(lambda p: loss(_xla_triple, p))(params)
    v_f, g_f = jax.value_and_grad(
        lambda p: loss(lambda p2, c, x: fused_trunk_with_grad(p2, c, x),
                       p))(params)
    np.testing.assert_allclose(float(v_f), float(v_r), atol=1e-3, rtol=1e-4)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_f)}
    checked = 0
    for k, v_ref in jax.tree_util.tree_leaves_with_path(g_r):
        ks_ = jax.tree_util.keystr(k)
        if not (ks_.startswith("['fc_net']")
                or ks_.startswith("['sigma_from_xyz']")):
            continue
        scale = max(float(jnp.max(jnp.abs(v_ref))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(flat_f[ks_]), np.asarray(v_ref),
            atol=2e-4 * scale, rtol=2e-3, err_msg=ks_)
        checked += 1
    assert checked == 2 * cfg.layers + 2


@pytest.mark.parametrize("brdf", ["rpv", "hapke"])
def test_fused_vjp_in_full_render_and_train_grad(brdf):
    """fused_trunk=True reproduces the XLA render AND its parameter
    gradients inside the real spsbrdf inference (analytic normals +
    either BRDF head family — the heads stay on XLA, so the kernel's
    c_feats cotangent must compose with any head set)."""
    import dataclasses as dc
    from brdfnerf_tpu.config import RenderConfig
    from brdfnerf_tpu.render.render import render_rays, RenderInputs

    kw = (dict(func_m=True, func_f=True, func_h=1) if brdf == "rpv"
          else dict(hapke_b=True, hapke_c=True))
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      normal="analystic", layers=4, feat=128, skips=(2,),
                      compute_dtype="float32", **kw)
    params = {"coarse": init_network(jax.random.PRNGKey(0), cfg)}
    n = 24
    o = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-1.0,
                           maxval=1.0)
    d = jnp.tile(jnp.asarray([[0.0, 0.1, -1.0]]), (n, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.zeros((n, 1)), jnp.full((n, 1), 2.0),
         jnp.tile(jnp.asarray([[0.3, 0.2, 0.93]]), (n, 1))], axis=1)
    inp = RenderInputs(rays=rays, cos_irra_on=jnp.asarray(False))
    rcfg_x = RenderConfig(n_samples=8, guided_samples=8, perturb=0.0,
                          apply_brdf=True)
    rcfg_f = dc.replace(rcfg_x, fused_trunk=True)
    key = jax.random.PRNGKey(2)
    tgt = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))

    def loss(p, rcfg):
        out = render_rays(p, cfg, rcfg, inp, key, train=True)
        return (jnp.mean((out["rgb_coarse"] - tgt) ** 2)
                + 0.1 * jnp.mean(out["normal_an_coarse"] ** 2))

    (v_x, g_x) = jax.value_and_grad(loss)(params, rcfg_x)
    (v_f, g_f) = jax.value_and_grad(loss)(params, rcfg_f)
    np.testing.assert_allclose(float(v_f), float(v_x), atol=1e-5, rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_f)):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        scale = max(float(jnp.max(jnp.abs(a))), 1e-4)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4 * scale, rtol=5e-3,
            err_msg=jax.tree_util.keystr(ka))


def test_kernel_supports_guard():
    from brdfnerf_tpu.ops.pallas_mlp import kernel_supports
    ok = ModelConfig(variant="spsbrdf-nerf", layers=8, skips=(4,))
    assert kernel_supports(ok)
    # out-of-range skip (reference: skipless trunk)
    assert not kernel_supports(ModelConfig(variant="spsbrdf-nerf",
                                           layers=4, skips=(4,)))
    # layers=2 leaves no mid layers for pack_trunk_weights to stack
    assert not kernel_supports(ModelConfig(variant="spsbrdf-nerf",
                                           layers=2, skips=(1,)))
    # multi-skip architectures are XLA-only
    assert not kernel_supports(ModelConfig(variant="spsbrdf-nerf",
                                           layers=8, skips=(2, 5)))


def test_skipless_trunk_falls_back_to_xla():
    """fc_layers=4 with the default skip index 4 is a SKIPLESS trunk in
    the reference (the skip never materializes); the fused kernels assume
    an in-range skip, so both use_pallas and fused_trunk must fall back
    to XLA instead of KeyError'ing (caught by the TPU quickstart run —
    CPU tests default use_pallas off)."""
    import dataclasses as dc
    from brdfnerf_tpu.config import RenderConfig
    from brdfnerf_tpu.render.render import render_rays, RenderInputs

    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      normal="analystic", func_m=True, func_f=True,
                      func_h=1, layers=4, feat=64, skips=(4,),
                      compute_dtype="float32")
    params = {"coarse": init_network(jax.random.PRNGKey(0), cfg)}
    n = 16
    o = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-1.0,
                           maxval=1.0)
    d = jnp.tile(jnp.asarray([[0.0, 0.1, -1.0]]), (n, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.zeros((n, 1)), jnp.full((n, 1), 2.0),
         jnp.tile(jnp.asarray([[0.3, 0.2, 0.93]]), (n, 1))], axis=1)
    inp = RenderInputs(rays=rays, cos_irra_on=jnp.asarray(False))
    rcfg_x = RenderConfig(n_samples=8, guided_samples=8, perturb=0.0,
                          apply_brdf=True)
    rcfg_f = dc.replace(rcfg_x, use_pallas=True, fused_trunk=True)
    key = jax.random.PRNGKey(2)
    out_x = render_rays(params, cfg, rcfg_x, inp, key, train=True)
    out_f = render_rays(params, cfg, rcfg_f, inp, key, train=True)
    np.testing.assert_allclose(np.asarray(out_f["rgb_coarse"]),
                               np.asarray(out_x["rgb_coarse"]),
                               atol=1e-5, rtol=1e-5)


def test_render_with_pallas_sigma_pass():
    """Full spsbrdf render with use_pallas matches the XLA path."""
    import dataclasses as dc
    from brdfnerf_tpu.config import RenderConfig
    from brdfnerf_tpu.render.render import render_rays, RenderInputs

    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      layers=4, feat=128, skips=(2,))
    params = {"coarse": init_network(jax.random.PRNGKey(0), cfg)}
    n = 32
    o = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-1.0,
                           maxval=1.0)
    d = jnp.tile(jnp.asarray([[0.0, 0.1, -1.0]]), (n, 1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.zeros((n, 1)), jnp.full((n, 1), 2.0),
         jnp.tile(jnp.asarray([[0.3, 0.2, 0.93]]), (n, 1))], axis=1)
    inp = RenderInputs(rays=rays, cos_irra_on=jnp.asarray(False))

    rcfg_x = RenderConfig(n_samples=8, guided_samples=8, perturb=0.0)
    rcfg_p = dc.replace(rcfg_x, use_pallas=True)
    key = jax.random.PRNGKey(2)
    out_x = render_rays(params, cfg, rcfg_x, inp, key)
    out_p = render_rays(params, cfg, rcfg_p, inp, key)
    np.testing.assert_allclose(np.asarray(out_p["rgb_coarse"]),
                               np.asarray(out_x["rgb_coarse"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p["depth_coarse"]),
                               np.asarray(out_x["depth_coarse"]),
                               atol=1e-4, rtol=1e-4)


# --------------------------------------- fused trunk+heads custom VJP

def _flagship_head_cfg(**over):
    kw = dict(variant="spsbrdf-nerf", siren=True, mapping=True,
              func_m=True, func_f=True, func_h=1, dim_rpv=1,
              normal="analystic", layers=4, feat=128, skips=(2,),
              compute_dtype="float32")
    kw.update(over)
    return ModelConfig(**kw)


@pytest.mark.parametrize("fast_sin", [True, False])
def test_fused_heads_forward_parity(fast_sin, monkeypatch):
    """apply_network_with_normals dispatches flagship configs to the
    trunk+heads kernel pair (opt-in: the path measured SLOWER on v5e and
    is gated behind BRDFNERF_FUSED_HEADS — see pallas_trunk_heads);
    every named output must match the pure-XLA path (fused_trunk=False)
    bit-for-tolerance."""
    monkeypatch.setenv("BRDFNERF_FUSED_HEADS", "1")
    from brdfnerf_tpu.models.network import apply_network_with_normals
    from brdfnerf_tpu.ops.pallas_trunk_heads import heads_kernel_supports
    cfg = _flagship_head_cfg(fast_sin=fast_sin)
    params = init_network(jax.random.PRNGKey(0), cfg)
    assert heads_kernel_supports(cfg, params, apply_brdf=True)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (70, 3), minval=-1.0,
                             maxval=1.0)
    got = apply_network_with_normals(params, cfg, xyz, apply_brdf=True,
                                     fused_trunk=True)
    ref = apply_network_with_normals(params, cfg, xyz, apply_brdf=True,
                                     fused_trunk=False)
    assert set(got) == set(ref), (set(got), set(ref))
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=5e-5, rtol=5e-5, err_msg=k)


@pytest.mark.parametrize("layers,skip", [(4, 2), (8, 4)])
def test_fused_heads_gradient_parity(layers, skip, monkeypatch):
    """Full-parameter gradient parity of the trunk+heads kernel pair vs
    XLA autodiff, through a loss touching EVERY head output (rgb, RPV
    k/theta/rhoc, sigma, analytic normal) — i.e. the complete flagship
    cotangent surface, including the head->a_h seed into the trunk's
    second-order reverse sweep."""
    monkeypatch.setenv("BRDFNERF_FUSED_HEADS", "1")
    from brdfnerf_tpu.models.network import apply_network_with_normals
    cfg = _flagship_head_cfg(layers=layers, skips=(skip,))
    params = init_network(jax.random.PRNGKey(0), cfg)
    n = 70
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-1.0,
                             maxval=1.0)
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    cots = {
        "sigma": jax.random.normal(ks[0], (n,)),
        "rgb": jax.random.normal(ks[1], (n, 3)),
        "rpv_k": jax.random.normal(ks[2], (n, 3)),
        "rpv_theta": jax.random.normal(ks[3], (n, 3)),
        "rpv_rhoc": jax.random.normal(ks[4], (n, 3)),
        "normal_an": jax.random.normal(ks[5], (n, 3)),
    }

    def loss(p, fused):
        out = apply_network_with_normals(p, cfg, xyz, apply_brdf=True,
                                         fused_trunk=fused)
        return sum(jnp.sum(c * out[k]) for k, c in cots.items())

    v_r, g_r = jax.value_and_grad(lambda p: loss(p, False))(params)
    v_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v_f), float(v_r), atol=1e-3, rtol=1e-4)

    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_f)}
    checked = 0
    for k, v_ref in jax.tree_util.tree_leaves_with_path(g_r):
        ks_ = jax.tree_util.keystr(k)
        v_got = flat_f[ks_]
        scale = max(float(jnp.max(jnp.abs(v_ref))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(v_got), np.asarray(v_ref),
            atol=3e-4 * scale, rtol=3e-3, err_msg=ks_)
        checked += 1
    # every trunk layer + sigma + feats + rgb(2) + 3 RPV heads(2 each)
    assert checked >= 2 * (layers + 1 + 1 + 2 + 6)
