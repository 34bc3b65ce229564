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
    enc = positional_encoding(xyz, cfg.mapping_sizes[0]) if mapping else xyz

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
