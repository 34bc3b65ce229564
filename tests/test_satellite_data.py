"""Satellite dataset pipeline tests on the synthetic AOI."""

import numpy as np
import pytest

from synth_aoi import (build_aoi, ALT0, MIN_ALT, MAX_ALT, H, W)
from brdfnerf_tpu.data.satellite import (SatelliteConfig, SatelliteDataset,
                                         get_rays_np, load_or_create_scene_loc)
from brdfnerf_tpu.geo import rpc as rpc_mod


@pytest.fixture(scope="module")
def aoi(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_aoi")
    return build_aoi(str(root))


@pytest.fixture(scope="module")
def train_ds(aoi):
    cfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                          scene_loc_stride=2)
    return SatelliteDataset(cfg, split="train")


def test_train_store_shapes(train_ds):
    s = train_ds.store
    n = 2 * H * W
    assert s["rays"].shape == (n, 11)
    assert s["rgbs"].shape == (n, 3)
    assert s["depths"].shape == (n, 2)
    for k in ("valid_depth", "depth_std", "valid_normal", "ts"):
        assert s[k].shape == (n,), k
    assert s["normals"].shape == (n, 3)
    assert s["rays"].dtype == np.float32


def test_rays_normalized(train_ds):
    rays = train_ds.store["rays"]
    # unit directions, near == 0, all coords in [-2, 2] after normalization
    assert np.allclose(np.linalg.norm(rays[:, 3:6], axis=1), 1.0, atol=1e-5)
    assert np.allclose(rays[:, 6], 0.0)
    assert (rays[:, 7] > 0).all()
    assert np.abs(rays[:, 0:3]).max() < 2.0
    # sun dirs are unit
    assert np.allclose(np.linalg.norm(rays[:, 8:11], axis=1), 1.0, atol=1e-5)


def test_depth_matches_flat_terrain(train_ds):
    """Flat terrain at ALT0: depth along each ray must equal the fraction
    (max_alt - ALT0) / (max_alt - min_alt) of the ray's far bound."""
    s = train_ds.store
    sel = s["valid_depth"] > 0
    frac = (MAX_ALT - ALT0) / (MAX_ALT - MIN_ALT)
    expected = frac * s["rays"][sel, 7]
    got = s["depths"][sel, 0]
    np.testing.assert_allclose(got, expected, rtol=1e-3)


def test_depth_std_quirk_and_weights(train_ds):
    s = train_ds.store
    sel = s["valid_depth"] > 0
    # quirk: effective std identically zero (satellite_rgb_dep.py:407-408,539)
    assert np.allclose(s["depth_std"][sel], 0.0)
    # nadir-cosine-weighted correlation weights stay in (0, 1]
    w = s["depths"][sel, 1]
    assert (w >= 0).all() and (w <= 1.0 + 1e-6).all() and w.max() > 0.5


def test_normals_flat_terrain(train_ds):
    s = train_ds.store
    # interior pixels of the first image (grid borders keep the reference's
    # zero-normal quirk even when flagged valid)
    normals = s["normals"][:H * W].reshape(H, W, 3)
    valid = s["valid_normal"][:H * W].reshape(H, W)
    assert (valid[1:-1, 1:-1] > 0).all()
    nz = normals[1:-1, 1:-1, 2]
    assert (nz > 0.99).all()     # flat ground -> +z normals


def test_val_split(aoi):
    cfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                          scene_loc_stride=2)
    ds = SatelliteDataset(cfg, split="val")
    assert len(ds) == 2          # 1 train debug image + 1 test image
    s0 = ds.get_image(0)
    s1 = ds.get_image(1)
    assert s0["is_val"] is False and s0["save_cross"] is True
    assert s1["is_val"] is True
    assert s0["rays"].shape == (H * W, 11)
    assert s0["mask"].shape == (H * W,)
    assert s1["ts"][0] == 2      # test image id offset by n_train


def test_scene_loc_cached(aoi, train_ds):
    import os
    assert os.path.exists(os.path.join(aoi["root"], "scene.loc"))
    scene = load_or_create_scene_loc(aoi["root"])
    assert scene.range > 0
    # the scene center altitude sits inside the altitude bounds
    assert MIN_ALT < scene.center[2] < MAX_ALT


def test_rpc_np_matches_jnp(aoi):
    """Float64 host localization agrees with the jit float32 path to
    float32 precision."""
    import json, os
    with open(os.path.join(aoi["root"], "img_00.json")) as f:
        rpc = rpc_mod.rpc_from_dict(json.load(f)["rpc"])
    cols = np.asarray([0.0, 10.0, 31.0])
    rows = np.asarray([5.0, 16.0, 30.0])
    lon64, lat64 = rpc_mod.localization_np(rpc, cols, rows, 100.0)
    import jax.numpy as jnp
    lon32, lat32 = rpc_mod.localization(rpc, jnp.asarray(cols),
                                        jnp.asarray(rows), 100.0)
    np.testing.assert_allclose(np.asarray(lon32), lon64, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lat32), lat64, atol=2e-5)


def test_sparse_keypoint_depth(tmp_path):
    """sat-nerf keypoint depth supervision (satellite_depth.py): exact
    affine geometry -> zero reprojection error -> weights == 1; depths
    match the flat-terrain fraction."""
    from synth_aoi import build_aoi as _build
    from brdfnerf_tpu.data.satellite import (load_sparse_depth,
                                             load_or_create_scene_loc)
    aoi = _build(str(tmp_path / "kp"), with_keypoints=True)
    scene = load_or_create_scene_loc(aoi["root"], stride=2)
    files = [f"{aoi['root']}/img_{i:02d}.json" for i in range(2)]
    out = load_sparse_depth(files, aoi["root"], scene)
    n = out["rays"].shape[0]
    assert out["depths"].shape == (n, 2)
    # weights are exp(-(e/mean(e))^2): RELATIVE to the mean reprojection
    # error (satellite_depth.py:126-129), so even ~cm roundtrip noise
    # spreads them over (0, 1] — assert the form, not a constant
    w = out["depths"][:, 1]
    assert (w > 0).all() and (w <= 1.0 + 1e-6).all()
    assert w.max() > 0.9
    frac = (MAX_ALT - ALT0) / (MAX_ALT - MIN_ALT)
    np.testing.assert_allclose(out["depths"][:, 0],
                               frac * out["rays"][:, 7], rtol=1e-3)


def test_ray_cache(tmp_path):
    """cache_dir: second dataset construction reads cached rays and
    produces identical stores."""
    import os, time
    from synth_aoi import build_aoi as _build
    aoi = _build(str(tmp_path / "rc"))
    cache = str(tmp_path / "cache")
    cfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                          cache_dir=cache, scene_loc_stride=2)
    ds1 = SatelliteDataset(cfg, split="train")
    files = os.listdir(cache)
    assert any(f.endswith(".npz") for f in files)
    ds2 = SatelliteDataset(cfg, split="train")
    np.testing.assert_array_equal(ds1.store["rays"], ds2.store["rays"])


def test_corrupt_ray_cache_recovers(tmp_path):
    """A truncated cache .npz (interrupted first run) is treated as a
    miss and rebuilt, not a permanent crash (review r3)."""
    import os
    from synth_aoi import build_aoi as _build
    aoi = _build(str(tmp_path / "cc"))
    cache = str(tmp_path / "cache")
    cfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                          cache_dir=cache, scene_loc_stride=2)
    ds1 = SatelliteDataset(cfg, split="train")
    npzs = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert npzs
    for f in npzs:   # truncate every cache artifact
        p = os.path.join(cache, f)
        with open(p, "r+b") as fh:
            fh.truncate(max(os.path.getsize(p) // 2, 1))
    ds2 = SatelliteDataset(cfg, split="train")
    np.testing.assert_array_equal(ds1.store["rays"], ds2.store["rays"])


def test_brdf_shaded_generator(tmp_path):
    """BRDF-shaded AOI variant (examples/brdf_inversion_check.py input):
    the Lambertian parameter limit (k=1, theta=0, rhoc=1) reproduces
    |sun_z| * albedo exactly (to uint8 quantization), and the non-trivial
    RPV_GT imagery is view-dependent and unclipped."""
    from synth_aoi import (build_aoi as _build, affine_rpc_dict,
                           intersect_terrain, ground_texture, ALB_SCALE,
                           RPV_GT, terrain_normal, view_dir_up,
                           rpv_radiance)
    from brdfnerf_tpu.utils.geotiff import read_geotiff

    aoi = _build(str(tmp_path / "lam"), bumpy=True, size=32,
                 brdf=dict(k=1.0, theta=0.0, rhoc=1.0))
    img, _ = read_geotiff(str(tmp_path / "lam" / "img_00.tif"))
    img = np.asarray(img, np.float64) / 255.0
    rpc_d = affine_rpc_dict(0.0, 0.0, hw=(32, 32))
    cols, rows = np.meshgrid(np.arange(32), np.arange(32))
    lon, lat, _ = intersect_terrain(rpc_d, cols, rows, True)
    # sun elevation 35 deg for image 0 in BRDF mode
    expected = np.sin(np.radians(35.0)) * ALB_SCALE * ground_texture(lon, lat)
    assert np.abs(img[0] - expected).max() < 1.0 / 255.0 + 1e-6
    assert aoi["brdf"] == dict(k=1.0, theta=0.0, rhoc=1.0)

    _build(str(tmp_path / "rpv"), bumpy=True, size=32, brdf=RPV_GT)
    img2, _ = read_geotiff(str(tmp_path / "rpv" / "img_00.tif"))
    img2 = np.asarray(img2, np.float64) / 255.0
    # non-trivial parameters must change the radiance vs the Lambertian
    # limit (same view/sun for image 0 of both AOIs)
    assert np.abs(img2[0] - img[0]).mean() > 0.01
    assert img2.max() < 1.0  # unclipped: the angular signal survives

    # rpv_radiance at nadir view / zenith sun / flat normal reduces to
    # albedo * M1 * F * H with ci = cv = 1 (hand-computed factors)
    one = np.ones((1, 3))
    up = one * [0.0, 0.0, 1.0]
    k, th, rc = RPV_GT["k"], RPV_GT["theta"], RPV_GT["rhoc"]
    rad = rpv_radiance(np.asarray([0.5]), up, up, up, k, th, rc)
    ci = cv = 1.0 - 1e-6   # calc_angles cos clamp
    m1 = (ci * cv * (ci + cv) + 1e-5) ** (k - 1.0)
    cg = ci  # view == sun => clamped dot = cos_max
    f = (1 - th * th) / ((1 + 2 * th * cg + th * th) ** 1.5 + 1e-6)
    g = np.sqrt(np.tan(np.arccos(ci)) ** 2 * (2 - 2 * np.cos(0.0)) + 1e-5)
    h = 1 + (1 - rc) / (1 + g + 1e-5)
    np.testing.assert_allclose(rad.ravel(), 0.5 * m1 * f * h * 1.0,
                               rtol=5e-4)   # f32 eval vs f64 hand-calc

    # terrain normals: unit length, upward, and matching the analytic
    # slope of the hill field at a probe point
    n = terrain_normal(lon, lat, True)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-9)
    assert n[..., 2].min() > 0.0
    # view_dir_up: unit, upward, nadir for the untilted RPC
    v = view_dir_up(rpc_d, cols.ravel(), rows.ravel())
    np.testing.assert_allclose(v[:, 2], 1.0, atol=1e-12)
