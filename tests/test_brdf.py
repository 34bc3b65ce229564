"""BRDF limit-case tests (SURVEY.md 4: RPV k=1,theta=0,rhoc=1 => Lambertian;
Hapke shells; Microfacet structure; grazing-angle NaN-freeness)."""

import jax.numpy as jnp
import numpy as np

from brdfnerf_tpu.brdf import (calc_angles, henyey_greenstein, rpv_brdf,
                               hapke_brdf, microfacet_brdf)


def _geom(n=8, seed=0):
    rs = np.random.RandomState(seed)
    normal = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
    def updir():
        v = rs.randn(n, 3).astype(np.float32)
        v[:, 2] = np.abs(v[:, 2]) + 0.5
        return v / np.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.asarray(updir()), jnp.asarray(updir()), jnp.asarray(normal)


def test_calc_angles_ranges():
    l, v, n = _geom()
    a = calc_angles(l, v, n)
    assert (np.asarray(a.ci) >= 1e-5 - 1e-8).all()
    assert (np.asarray(a.ci) <= 1.0).all()
    assert np.isfinite(np.asarray(a.phi)).all()


def test_hg_isotropic_limit():
    x = jnp.linspace(-1, 1, 11)[:, None]
    y = np.asarray(henyey_greenstein(x, jnp.zeros((11, 1))))
    np.testing.assert_allclose(y, 1.0, atol=1e-5)


def test_rpv_lambertian_limit():
    """k=1, theta=0, rhoc=1 => brdf == albedo exactly (RPV.py:43-61)."""
    l, v, n = _geom()
    w = jnp.full((8, 3), 0.6)
    k = jnp.ones((8, 3))
    theta = jnp.zeros((8, 3))
    rhoc = jnp.ones((8, 3))
    brdf, m1, f, g, h, ci, cv = rpv_brdf(l, v, n, w, k, theta, rhoc)
    np.testing.assert_allclose(np.asarray(m1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(brdf), 0.6, atol=5e-4)


def test_rpv_all_none_is_lambertian():
    l, v, n = _geom()
    w = jnp.full((8, 3), 0.3)
    brdf, *_ = rpv_brdf(l, v, n, w)
    np.testing.assert_allclose(np.asarray(brdf), 0.3, rtol=1e-6)


def test_rpv_finite_at_grazing():
    n_pts = 4
    normal = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n_pts, 1)), jnp.float32)
    graze = jnp.asarray(np.tile([1.0, 0.0, 1e-4], (n_pts, 1)), jnp.float32)
    graze = graze / jnp.linalg.norm(graze, axis=-1, keepdims=True)
    w = jnp.full((n_pts, 3), 0.5)
    k = jnp.full((n_pts, 3), 0.7)
    th = jnp.full((n_pts, 3), -0.2)
    rc = jnp.full((n_pts, 3), 0.4)
    brdf, *_ = rpv_brdf(graze, graze, normal, w, k, th, rc)
    assert np.isfinite(np.asarray(brdf)).all()


def test_hapke_shell_variants():
    l, v, n = _geom()
    w = jnp.full((8, 3), 0.5)
    b1, *_ = hapke_brdf(l, v, n, w, shell_hapke=1, hpk_scl=4.0)
    np.testing.assert_allclose(np.asarray(b1), 0.125, rtol=1e-6)
    b2, _, _, _, _, _, ci, cv = hapke_brdf(l, v, n, w, shell_hapke=2,
                                           hpk_scl=4.0)
    ref = np.broadcast_to(0.5 / (np.asarray(ci + cv) * 4.0 + 1e-6)[:, None],
                          (8, 3))
    np.testing.assert_allclose(np.asarray(b2), ref, rtol=1e-5)
    b3, *_ = hapke_brdf(l, v, n, w, shell_hapke=3, hpk_scl=4.0)
    assert np.isfinite(np.asarray(b3)).all()


def test_hapke_full_brf_finite_and_positive_mean():
    l, v, n = _geom()
    w = jnp.full((8, 3), 0.4)
    b = jnp.full((8, 3), 0.3)
    c = jnp.full((8, 3), 0.5)
    theta = jnp.full((8,), 0.2)
    brdf, p, bk, hi, hv, s, ci, cv = hapke_brdf(l, v, n, w, b, c, theta)
    assert np.isfinite(np.asarray(brdf)).all()
    assert np.isfinite(np.asarray(s)).all()
    # H function >= 1 for w in (0,1)
    assert (np.asarray(hi) >= 1.0 - 1e-5).all()


def test_hapke_chandrasekhar_h_limits():
    from brdfnerf_tpu.brdf.hapke import _hf
    # w -> 0 => H == 1
    y = np.asarray(_hf(jnp.full((4, 1), 0.5), jnp.zeros((4, 3))))
    np.testing.assert_allclose(y, 1.0, atol=1e-6)


def test_microfacet_structure():
    l, v, n = _geom()
    albedo = jnp.full((8, 3), 0.25)
    rough = jnp.full((8, 1), 0.5)
    glossy, brdf, f, g, d, ldn, vdn, h, n_h = microfacet_brdf(
        l, v, n, albedo, rough)
    assert np.isfinite(np.asarray(brdf)).all()
    # brdf = diffuse + glossy
    np.testing.assert_allclose(
        np.asarray(brdf),
        np.broadcast_to(0.25 + np.asarray(glossy)[:, None], (8, 3)),
        rtol=1e-5)
    # half vector is unit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(h), axis=-1), 1.0,
                               rtol=1e-5)
    # geometric term in [0, 1]-ish
    assert (np.asarray(g) <= 1.0 + 1e-5).all()


def test_microfacet_mirror_peak():
    """Glossy lobe peaks when v is the mirror reflection of l about n
    (h == n maximizes the GGX distribution D)."""
    n_pts = 2
    normal = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n_pts, 1)), jnp.float32)
    l = jnp.asarray(np.tile([0.5, 0.0, np.sqrt(0.75)], (n_pts, 1)), jnp.float32)
    v_mirror = jnp.asarray(np.tile([-0.5, 0.0, np.sqrt(0.75)], (n_pts, 1)),
                           jnp.float32)          # h == n
    v_off = jnp.asarray(np.tile([-0.9, 0.0, np.sqrt(1 - 0.81)], (n_pts, 1)),
                        jnp.float32)
    albedo = jnp.zeros((n_pts, 3))
    rough = jnp.full((n_pts, 1), 0.3)
    g1, *_ = microfacet_brdf(l, v_mirror, normal, albedo, rough)
    g2, *_ = microfacet_brdf(l, v_off, normal, albedo, rough)
    assert float(g1[0]) > float(g2[0])
