"""int8 serving path: the trunk's matmul inputs are statically bounded in
[-1, 1] for siren+mapping configs (sine encoding in, sin(.) activations
between layers), so the trunk can run on the int8 MXU path (2x the bf16
peak on v5e) with a constant 1/127 activation scale and per-output-channel
weight scales — no calibration pass.  Serving-only: the quantizer's
round() has zero gradient, so training rejects it and every gradient
consumer (analytic normals) runs through the bfloat16_all twin.

No reference analog (the reference serves f32 torch, eval.py:78-105);
this is TPU-native serving capability layered on the same checkpoints.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brdfnerf_tpu.config import ModelConfig, RenderConfig, TrainConfig, RunConfig
from brdfnerf_tpu.models.network import (
    _linear, _linear_int8, init_network, sigma_fn, analytic_normals,
    apply_network, apply_network_with_normals, model_config_for_variant)


def _cfg(**kw):
    base = dict(variant="spsbrdf-nerf", siren=True, mapping=True,
                layers=4, feat=64, skips=(2,),
                func_m=True, func_f=True, func_h=1,
                compute_dtype="int8")
    base.update(kw)
    return model_config_for_variant(base.pop("variant"), **base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = init_network(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (512, 3),
                             minval=-0.8, maxval=0.8)
    return cfg, params, xyz


def test_linear_int8_accuracy():
    """Unit accuracy of the quantized dense layer on bounded inputs:
    int8 x int8 -> int32 accumulation, dequantized by sw/127."""
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (256, 63), minval=-1.0, maxval=1.0)
    p = {"w": jax.random.normal(k2, (63, 64)) * 0.1,
         "b": jax.random.normal(k3, (64,)) * 0.01}
    ref = np.asarray(_linear(p, x, "float32"))
    q = np.asarray(_linear_int8(p, x))
    # error budget: ~1/254 relative per operand over a 63-term dot
    scale = np.abs(ref).max()
    assert np.abs(q - ref).max() < 0.02 * max(scale, 1.0), (
        np.abs(q - ref).max(), scale)


def test_int8_sigma_close_to_f32(setup):
    """End-to-end trunk+sigma head: int8 tracks the f32 forward within
    quantization noise (the sigma head itself runs bfloat16_all)."""
    cfg, params, xyz = setup
    s8 = np.asarray(sigma_fn(params, cfg, xyz))
    s32 = np.asarray(sigma_fn(
        params, dc.replace(cfg, compute_dtype="float32"), xyz))
    assert np.all(np.isfinite(s8))
    rng = max(float(s32.max() - s32.min()), 1e-3)
    rel_rms = float(np.sqrt(np.mean((s8 - s32) ** 2))) / rng
    assert rel_rms < 0.05, rel_rms


def test_int8_normals_use_bf16_twin(setup):
    """analytic_normals under int8 must equal the bfloat16_all result
    exactly — it is the SAME program (round() has no gradient, so the
    guard swaps the cfg before tracing)."""
    cfg, params, xyz = setup
    n8 = np.asarray(analytic_normals(params, cfg, xyz))
    nb = np.asarray(analytic_normals(
        params, dc.replace(cfg, compute_dtype="bfloat16_all"), xyz))
    np.testing.assert_array_equal(n8, nb)


def test_int8_full_forward_heads(setup):
    """apply_network with every BRDF head active: finite outputs, bounded
    head ranges preserved, close to the f32 forward."""
    cfg, params, xyz = setup
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (xyz.shape[0], 1))
    sun = jnp.tile(jnp.array([[0.3, 0.1, 0.95]]), (xyz.shape[0], 1))
    sun = sun / jnp.linalg.norm(sun, axis=-1, keepdims=True)
    o8 = apply_network(params, cfg, xyz, dirs=dirs, sun_d=sun,
                       apply_brdf=True, apply_theta=True)
    o32 = apply_network(params, dc.replace(cfg, compute_dtype="float32"),
                        xyz, dirs=dirs, sun_d=sun,
                        apply_brdf=True, apply_theta=True)
    for k, v in o8.items():
        v = np.asarray(v)
        assert np.all(np.isfinite(v)), k
        r = np.asarray(o32[k])
        rng = max(float(r.max() - r.min()), 1e-3)
        rel = float(np.abs(v - r).max()) / rng
        assert rel < 0.25, (k, rel)
    for k, lo, hi in [("rgb", 0.0, 1.0), ("rpv_k", 0.0, 2.0),
                      ("rpv_rhoc", 0.0, 1.0)]:
        if k in o8:
            v = np.asarray(o8[k])
            # rgb_padding widens [0,1] by 1e-3 on each side (nerf.py:273)
            assert v.min() >= lo - 2e-3 and v.max() <= hi + 2e-3, k


def test_int8_with_normals_matches_bf16(setup):
    """apply_network_with_normals under int8 runs the differentiated
    trunk wholly on the bf16 twin (feats included), so sigma/normals
    equal the bfloat16_all run exactly."""
    cfg, params, xyz = setup
    o8 = apply_network_with_normals(params, cfg, xyz)
    ob = apply_network_with_normals(
        params, dc.replace(cfg, compute_dtype="bfloat16_all"), xyz)
    np.testing.assert_array_equal(np.asarray(o8["sigma"]),
                                  np.asarray(ob["sigma"]))
    np.testing.assert_array_equal(np.asarray(o8["normal_an"]),
                                  np.asarray(ob["normal_an"]))


def test_int8_unbounded_trunk_falls_back():
    """Raw-xyz trunks (mapping off) have unbounded matmul inputs: int8
    must fall back to the bfloat16_all path bit-for-bit."""
    cfg = _cfg(mapping=False)
    params = init_network(jax.random.PRNGKey(3), cfg)
    xyz = jax.random.normal(jax.random.PRNGKey(4), (128, 3)) * 3.0
    s8 = np.asarray(sigma_fn(params, cfg, xyz))
    sb = np.asarray(sigma_fn(
        params, dc.replace(cfg, compute_dtype="bfloat16_all"), xyz))
    np.testing.assert_array_equal(s8, sb)


def test_int8_training_rejected(tmp_path):
    """Trainer.fit raises for int8 (zero-gradient quantizer) while the
    Trainer itself still constructs — it doubles as the eval harness."""
    from brdfnerf_tpu.train import Trainer, TrainerPaths
    mcfg = _cfg()
    cfg = RunConfig(model=mcfg,
                    render=RenderConfig(n_samples=4, guided_samples=0),
                    train=TrainConfig(lr=1e-3, batch_size=32,
                                      max_train_steps=4))
    n = 64
    store = {"rays": np.random.RandomState(0).rand(n, 11).astype(np.float32),
             "rgbs": np.random.RandomState(1).rand(n, 3).astype(np.float32),
             "ts": np.zeros(n, np.int32)}
    paths = TrainerPaths(logs_dir=str(tmp_path / "l"),
                         ckpts_dir=str(tmp_path / "c"))
    tr = Trainer(cfg, store, paths, seed=0)
    with pytest.raises(ValueError, match="serving-only"):
        tr.fit(max_steps=2, progress=False)


def test_cli_int8_eval_only():
    """--compute_dtype int8 is an eval-parser option; the train parser
    rejects it (training cannot select the zero-gradient path)."""
    from brdfnerf_tpu.cli.opts import train_parser, eval_parser
    args = eval_parser().parse_args(
        ["--logs_dir", "x", "--epoch_number", "1",
         "--compute_dtype", "int8"])
    assert args.compute_dtype == "int8"
    with pytest.raises(SystemExit):
        train_parser().parse_args(
            ["--exp_name", "e", "--root_dir", "r", "--model", "nerf",
             "--compute_dtype", "int8"])


def test_pallas_kernel_excludes_int8():
    """kernel_supports must steer int8 configs off the fused bf16 kernels
    so the XLA int8 dot path actually runs."""
    from brdfnerf_tpu.ops.pallas_mlp import kernel_supports
    cfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                      layers=8, feat=64, skips=(4,), compute_dtype="int8")
    assert not kernel_supports(cfg)
    assert kernel_supports(dc.replace(cfg, compute_dtype="bfloat16_all"))
