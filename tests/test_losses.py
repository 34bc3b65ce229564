"""Loss-suite unit tests against hand-computed oracles
(reference: metrics.py:11-290)."""

import numpy as np
import pytest

import jax.numpy as jnp

from brdfnerf_tpu import losses as L


def _results(n=4, s=3, key_extra=None):
    rng = np.random.default_rng(0)
    r = {
        "rgb_coarse": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        "weights_coarse": jnp.asarray(
            rng.uniform(0, 1, (n, s)).astype(np.float32)),
        "z_vals_coarse": jnp.asarray(
            np.sort(rng.uniform(0, 2, (n, s)), -1).astype(np.float32)),
        "depth_coarse": jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32)),
    }
    if key_extra:
        r.update(key_extra)
    return r


def test_nerf_loss_is_mse():
    res = _results()
    tgt = jnp.zeros((4, 3))
    loss, d = L.nerf_loss(res, tgt)
    np.testing.assert_allclose(float(loss),
                               float(jnp.mean(res["rgb_coarse"] ** 2)),
                               rtol=1e-6)


def test_snerf_solar_terms():
    """term2 = lambda/3 * mean(sum((T - s)^2)); term3 = lambda/3 *
    mean(1 - sum(w*s)) (metrics.py:30-37)."""
    n, s = 4, 3
    rng = np.random.default_rng(1)
    sun = rng.uniform(0, 1, (n, s, 1)).astype(np.float32)
    trans = rng.uniform(0, 1, (n, s)).astype(np.float32)
    w = rng.uniform(0, 1, (n, s)).astype(np.float32)
    res = _results(n, s, {
        "sun_sc_coarse": jnp.asarray(sun),
        "transparency_sc_coarse": jnp.asarray(trans),
        "weights_sc_coarse": jnp.asarray(w)})
    lam = 0.3
    loss, d = L.snerf_loss(res, res["rgb_coarse"], lambda_sc=lam)
    t2 = lam / 3 * np.mean(np.sum((trans - sun[..., 0]) ** 2, -1))
    t3 = lam / 3 * np.mean(1 - np.sum(w * sun[..., 0], -1))
    np.testing.assert_allclose(float(d["coarse_sc_term2"]), t2, rtol=1e-5)
    np.testing.assert_allclose(float(d["coarse_sc_term3"]), t3, rtol=1e-5)
    assert float(d["coarse_color"]) == 0.0


def test_satnerf_beta_loss_reduces_with_high_beta():
    """Higher beta downweights the color residual (metrics.py:24-28)."""
    n, s = 4, 3
    res = _results(n, s)
    tgt = jnp.zeros((n, 3))
    lo = {"beta_coarse": jnp.full((n, s, 1), 0.01)}
    hi = {"beta_coarse": jnp.full((n, s, 1), 5.0)}
    l_lo, d_lo = L.satnerf_loss({**res, **lo}, tgt)
    l_hi, d_hi = L.satnerf_loss({**res, **hi}, tgt)
    assert float(d_hi["coarse_color"]) < float(d_lo["coarse_color"])
    assert float(d_hi["coarse_logbeta"]) > float(d_lo["coarse_logbeta"])


def test_depth_loss_subset_and_scaling():
    """Weighted MSE over valid rays scaled by kept-fraction
    (metrics.py:103-140): loss = lambda/3 * sum(w*(d-d*)^2 * keep)/N."""
    n, s = 4, 3
    res = _results(n, s)
    tgt = np.asarray([1.0, 1.2, 0.8, 1.5], np.float32)
    w = np.asarray([1.0, 0.5, 2.0, 1.0], np.float32)
    valid = np.asarray([1, 1, 0, 0], np.int32)
    loss, d = L.depth_loss(res, jnp.asarray(tgt), jnp.asarray(w),
                           valid_depth=jnp.asarray(valid), lambda_ds=3.0)
    pred = np.asarray(res["depth_coarse"])
    expect = np.sum(w[:2] * (pred[:2] - tgt[:2]) ** 2) / n
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_depth_loss_no_valid_rays_is_zero():
    res = _results()
    loss, _ = L.depth_loss(res, res["depth_coarse"],
                           valid_depth=jnp.zeros(4), lambda_ds=1.0)
    assert float(loss) == 0.0


def test_normal_reg_penalizes_backward_normals():
    n, s = 2, 2
    res = _results(n, s)
    view = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    res["rays_d_coarse"] = jnp.asarray(view.reshape(n, 1, 3))
    fwd = np.tile(np.asarray([0, 0, 1.0], np.float32), (n, s, 1))
    bwd = -fwd
    res_f = {**res, "normal_an_coarse": jnp.asarray(fwd)}
    res_b = {**res, "normal_an_coarse": jnp.asarray(bwd)}
    lf, _, pf = L.normal_reg_loss(res_f, 1.0)
    lb, _, pb = L.normal_reg_loss(res_b, 1.0)
    assert float(lf) == pytest.approx(0.0, abs=1e-6)
    assert float(lb) > 0.0
    assert float(pf) == 0.0 and float(pb) == 100.0


def test_hard_surface_loss_zero_for_delta():
    """All weight on one sample at the predicted depth -> zero variance."""
    n, s = 2, 3
    z = np.tile(np.asarray([[0.5, 1.0, 1.5]], np.float32), (n, 1))
    w = np.asarray([[0, 1, 0], [0, 1, 0]], np.float32)
    res = {"rgb_coarse": jnp.zeros((n, 3)),
           "z_vals_coarse": jnp.asarray(z),
           "weights_coarse": jnp.asarray(w),
           "depth_coarse": jnp.asarray([1.0, 1.0])}
    loss, _ = L.hard_surface_loss(res, lambda_hs=1.0)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_snerf_sc_with_fine_model_no_keyerror():
    """Fine model + solar correction: the sc pass only runs on the coarse
    pass, so the loss must apply sc terms per-typ where the keys exist
    instead of KeyError'ing on sun_sc_fine (the reference crashes on every
    fine+sc combination, rendering.py:309 / metrics.py:32)."""
    n, s, s_f = 4, 3, 5
    rng = np.random.default_rng(1)
    res = _results(n, s, key_extra={
        "sun_sc_coarse": jnp.asarray(
            rng.uniform(0, 1, (n, s, 1)).astype(np.float32)),
        "transparency_sc_coarse": jnp.asarray(
            rng.uniform(0, 1, (n, s)).astype(np.float32)),
        "weights_sc_coarse": jnp.asarray(
            rng.uniform(0, 1, (n, s)).astype(np.float32)),
        "rgb_fine": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        "weights_fine": jnp.asarray(
            rng.uniform(0, 1, (n, s_f)).astype(np.float32)),
    })
    targets = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    loss, d = L.snerf_loss(res, targets, lambda_sc=0.05)
    assert np.isfinite(float(loss))
    assert "coarse_sc_term2" in d and "fine_sc_term2" not in d
    assert "fine_color" in d


def test_satnerf_fine_uses_its_own_beta():
    """Documented deviation: beta_{typ} per pass (the reference reuses
    beta_coarse for the fine typ and shape-errors when sample counts
    differ, metrics.py:25)."""
    n, s, s_f = 4, 3, 5
    rng = np.random.default_rng(2)
    res = _results(n, s, key_extra={
        "beta_coarse": jnp.asarray(
            rng.uniform(0.1, 1, (n, s, 1)).astype(np.float32)),
        "rgb_fine": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        "weights_fine": jnp.asarray(
            rng.uniform(0, 1, (n, s_f)).astype(np.float32)),
        "beta_fine": jnp.asarray(
            rng.uniform(0.1, 1, (n, s_f, 1)).astype(np.float32)),
    })
    targets = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    loss, d = L.satnerf_loss(res, targets)
    assert np.isfinite(float(loss))
    assert "fine_color" in d and "fine_logbeta" in d
