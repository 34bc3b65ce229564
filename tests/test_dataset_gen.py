"""Dataset-generation pipeline tests (JSON emission, masks, splits, RPC
text parsing) on the synthetic AOI."""

import json
import os

import numpy as np
import pytest

from synth_aoi import build_aoi, affine_rpc_dict, H, W, ALT0
from brdfnerf_tpu import dataset_gen as dg
from brdfnerf_tpu.geo import rpc as rpc_mod


@pytest.fixture(scope="module")
def aoi(tmp_path_factory):
    return build_aoi(str(tmp_path_factory.mktemp("synth_aoi_gen")))


def test_footprint_geojson():
    rpc = rpc_mod.rpc_from_dict(affine_rpc_dict())
    gj = dg.image_footprint_geojson(rpc, H, W, z=ALT0)
    coords = gj["coordinates"][0]
    assert len(coords) == 5 and coords[0] == coords[-1]
    lons = [c[0] for c in coords]
    assert min(lons) < gj["center"][0] < max(lons)


def test_create_image_json(aoi, tmp_path):
    img = os.path.join(aoi["root"], "img_00.tif")
    out = dg.create_image_json(
        img, affine_rpc_dict(), sun_elevation=50.0, sun_azimuth=160.0,
        out_dir=str(tmp_path),
        dsm_path=os.path.join(aoi["gt_dir"], f"{aoi['aoi_id']}_DSM.tif"))
    with open(out) as f:
        d = json.load(f)
    assert d["height"] == H and d["width"] == W
    assert d["min_alt"] <= ALT0 <= d["max_alt"]
    assert "rpc" in d and "geojson" in d
    # emitted JSON is directly consumable by the dataset loader's RPC path
    rpc = rpc_mod.rpc_from_dict(d["rpc"])
    lon, lat = rpc_mod.localization_np(rpc, np.asarray([5.0]),
                                       np.asarray([5.0]), ALT0)
    assert np.isfinite(lon).all()


def test_footprint_masks(aoi):
    masks = dg.generate_footprint_masks(aoi["root"], "img_00.json")
    assert len(masks) >= 3
    from PIL import Image
    m = np.asarray(Image.open(masks[0]))
    assert m.shape == (H, W)
    # the reference image's own footprint covers (nearly) itself
    assert (m > 0).mean() > 0.9


def test_splits(tmp_path):
    ids = [f"img_{i:02d}.json" for i in range(10)]
    train, test = dg.create_train_test_splits(ids, test_percent=0.2, seed=1)
    assert len(test) == 2 and len(train) == 8
    assert set(train) | set(test) == set(ids)
    dg.write_splits(str(tmp_path), train, test)
    assert open(os.path.join(tmp_path, "train.txt")).read().count("\n") == 8


def test_parse_rpc_file(tmp_path):
    d = affine_rpc_dict()
    path = tmp_path / "cam.rpc_adj"
    lines = [
        f"LINE_OFF: {d['row_offset']} pixels",
        f"SAMP_OFF: {d['col_offset']} pixels",
        f"LAT_OFF: {d['lat_offset']} degrees",
        f"LONG_OFF: {d['lon_offset']} degrees",
        f"HEIGHT_OFF: {d['alt_offset']} meters",
        f"LINE_SCALE: {d['row_scale']} pixels",
        f"SAMP_SCALE: {d['col_scale']} pixels",
        f"LAT_SCALE: {d['lat_scale']} degrees",
        f"LONG_SCALE: {d['lon_scale']} degrees",
        f"HEIGHT_SCALE: {d['alt_scale']} meters",
    ]
    for i in range(20):
        lines.append(f"LINE_NUM_COEFF_{i+1}: {d['row_num'][i]}")
        lines.append(f"LINE_DEN_COEFF_{i+1}: {d['row_den'][i]}")
        lines.append(f"SAMP_NUM_COEFF_{i+1}: {d['col_num'][i]}")
        lines.append(f"SAMP_DEN_COEFF_{i+1}: {d['col_den'][i]}")
    path.write_text("\n".join(lines))
    parsed = dg.parse_rpc_file(str(path))
    for k in ("row_offset", "col_scale", "alt_offset"):
        assert parsed[k] == d[k]
    assert parsed["row_num"] == d["row_num"]
    assert parsed["col_den"] == d["col_den"]


def test_crop_image_patches(aoi, tmp_path):
    """CropImagePatches port (generate_dataset.py:302-428): crop full-scene
    images to the GT-DSM AOI, fix up the RPC offsets, write uint8-scaled
    crops + Truth + JSONs + splits — and the result is loadable by
    SatelliteDataset end to end."""
    import numpy as np
    from synth_aoi import (affine_rpc_dict, ground_texture, localize_affine,
                           LAT0, LON0, ALT0, ZONE, W, H)
    from brdfnerf_tpu.utils.geotiff import write_geotiff, GeoProfile, utm_epsg
    from brdfnerf_tpu.geo import rpc as rpc_mod

    # full-scene images: 3x the AOI footprint, same ground resolution
    full = 3 * W
    imgs = []
    for i, tilt in enumerate([(0.0, 0.0), (0.12, 0.04), (-0.08, 0.1)]):
        d = affine_rpc_dict(*tilt)
        d = dict(d, col_offset=full / 2.0, row_offset=full / 2.0,
                 col_scale=full / 2.0, row_scale=full / 2.0,
                 lon_scale=3 * d["lon_scale"], lat_scale=3 * d["lat_scale"])
        cols, rows = np.meshgrid(np.arange(full), np.arange(full))
        lon, lat = localize_affine(d, cols, rows, ALT0)
        tex = ground_texture(lon, lat)
        rgb16 = (np.stack([tex] * 3) * 4000).astype(np.float32)  # non-uint8
        p = str(tmp_path / f"full_{i:02d}.tif")
        write_geotiff(p, rgb16, GeoProfile(epsg=utm_epsg(ZONE, True)))
        imgs.append((p, d))

    out_root = dg.crop_image_patches(
        aoi["aoi_id"], aoi["gt_dir"], imgs, str(tmp_path / "out"),
        utm_zone=ZONE, sun_angles={f"full_{i:02d}": (50.0, 150.0 + i)
                                   for i in range(3)},
        seed=0)

    base = os.path.join(str(tmp_path / "out"),
                        f"dataset{aoi['aoi_id']}", aoi["aoi_id"])
    scled = os.path.join(base, "RGB-crops", aoi["aoi_id"], "scled")
    # truth copied
    assert os.path.exists(os.path.join(base, "Truth",
                                       f"{aoi['aoi_id']}_DSM.tif"))
    # scaled crops are uint8 spanning the full range, AOI-sized (~W + pad)
    from brdfnerf_tpu.utils.geotiff import read_geotiff
    arr, _ = read_geotiff(os.path.join(scled, "full_00.tif"))
    assert arr.dtype == np.uint8
    # float->uint8 truncation can land the top at 254 (the reference
    # writes the float-scaled array through a uint8 rasterio profile with
    # the same truncation semantics)
    assert arr.min() == 0 and arr.max() >= 254
    assert W <= arr.shape[-1] <= full // 2

    # RPC offset fixup: reprojecting the AOI center lands at (orig - crop
    # offset) pixel coordinates
    with open(os.path.join(out_root, "full_00.json")) as f:
        meta = json.load(f)
    orig = imgs[0][1]
    r_orig = rpc_mod.rpc_from_dict(orig)
    r_adj = rpc_mod.rpc_from_dict(meta["rpc"])
    c0, w0_ = rpc_mod.projection_np(r_orig, np.asarray([LON0]),
                                    np.asarray([LAT0]), np.asarray([ALT0]))
    c1, w1_ = rpc_mod.projection_np(r_adj, np.asarray([LON0]),
                                    np.asarray([LAT0]), np.asarray([ALT0]))
    dx = float(orig["col_offset"] - meta["rpc"]["col_offset"])
    dy = float(orig["row_offset"] - meta["rpc"]["row_offset"])
    np.testing.assert_allclose(float(c0[0]) - float(c1[0]), dx, atol=1e-6)
    np.testing.assert_allclose(float(w0_[0]) - float(w1_[0]), dy, atol=1e-6)
    assert dx > 0 and dy > 0          # AOI is interior

    # splits written and the emitted dataset loads end to end
    assert os.path.exists(os.path.join(out_root, "train.txt"))
    from brdfnerf_tpu.data.satellite import SatelliteConfig, SatelliteDataset
    cfg = SatelliteConfig(root_dir=out_root, img_dir=scled,
                          aoi_id=aoi["aoi_id"], load_depth=False,
                          scene_loc_stride=2)
    ds = SatelliteDataset(cfg, split="train")
    assert ds.store["rays"].shape[1] == 11
    assert np.isfinite(ds.store["rays"]).all()


def test_scale_img_modes():
    """ScaleImg parity (generate_dataset.py:273-300): global min-max by
    default, per-channel when SclIndiv, explicit bounds honored."""
    import numpy as np
    img = np.stack([np.linspace(10, 20, 12).reshape(3, 4),
                    np.linspace(0, 100, 12).reshape(3, 4)])
    g = dg.scale_img(img)
    assert g.min() == 0.0 and abs(g.max() - 255.0) < 1e-9
    pc = dg.scale_img(img, per_channel=True)
    for c in range(2):
        assert pc[c].min() == 0.0 and abs(pc[c].max() - 255.0) < 1e-9
    b = dg.scale_img(img, vmin=0.0, vmax=200.0)
    assert abs(b.max() - 100 * 255.0 / 200.0) < 1e-9


def _rpc00b_text(d) -> str:
    """Classic RPC00B text (the .rpc/.rpc_adj sidecar format)."""
    lines = [f"LINE_OFF: {d['row_offset']} pixels",
             f"SAMP_OFF: {d['col_offset']} pixels",
             f"LAT_OFF: {d['lat_offset']} degrees",
             f"LONG_OFF: {d['lon_offset']} degrees",
             f"HEIGHT_OFF: {d['alt_offset']} meters",
             f"LINE_SCALE: {d['row_scale']} pixels",
             f"SAMP_SCALE: {d['col_scale']} pixels",
             f"LAT_SCALE: {d['lat_scale']} degrees",
             f"LONG_SCALE: {d['lon_scale']} degrees",
             f"HEIGHT_SCALE: {d['alt_scale']} meters"]
    for pref, key in (("LINE_NUM_COEFF", "row_num"),
                      ("LINE_DEN_COEFF", "row_den"),
                      ("SAMP_NUM_COEFF", "col_num"),
                      ("SAMP_DEN_COEFF", "col_den")):
        for j, v in enumerate(d[key]):
            lines.append(f"{pref}_{j + 1}: {v}")
    return "\n".join(lines)


def test_generate_dataset_cli(aoi, tmp_path):
    """The generate_dataset CLI (reference generate_dataset.py:483-508
    __main__): DSM crop + image patches + JSONs/splits from flags, with
    RPC00B sidecar discovery."""
    import numpy as np
    from synth_aoi import (affine_rpc_dict, ground_texture, localize_affine,
                           ALT0, ZONE, W)
    from brdfnerf_tpu.utils.geotiff import (write_geotiff, read_geotiff,
                                            GeoProfile, utm_epsg)
    from brdfnerf_tpu.cli.generate_dataset import main as gen_main

    # full-scene images + RPC00B text sidecars
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    full = 3 * W
    for i, tilt in enumerate([(0.0, 0.0), (0.1, 0.05)]):
        d = affine_rpc_dict(*tilt)
        d = dict(d, col_offset=full / 2.0, row_offset=full / 2.0,
                 col_scale=full / 2.0, row_scale=full / 2.0,
                 lon_scale=3 * d["lon_scale"], lat_scale=3 * d["lat_scale"])
        cols, rows = np.meshgrid(np.arange(full), np.arange(full))
        lon, lat = localize_affine(d, cols, rows, ALT0)
        tex = ground_texture(lon, lat)
        p = str(img_dir / f"full_{i:02d}.tif")
        write_geotiff(p, (np.stack([tex] * 3) * 4000).astype(np.float32),
                      GeoProfile(epsg=utm_epsg(ZONE, True)))
        (img_dir / f"full_{i:02d}.rpc").write_text(_rpc00b_text(d))

    out_dir = str(tmp_path / "out")
    rc = gen_main(["--aoi_id", aoi["aoi_id"], "--dsm_dir", aoi["gt_dir"],
                   "--img_dir", str(img_dir), "--out_dir", out_dir,
                   "--utm_zone", str(ZONE)])
    assert rc == 0
    root = os.path.join(out_dir, f"dataset{aoi['aoi_id']}", "root_dir",
                        aoi["aoi_id"])
    assert os.path.exists(os.path.join(root, "train.txt"))
    with open(os.path.join(root, "full_00.json")) as f:
        meta = json.load(f)
    assert "rpc" in meta and meta["width"] > 0


def test_run_ba_orchestration_roundtrip(aoi, tmp_path):
    """BA orchestration contract + round-trip (reference
    generate_dataset.py:40-86, 99-105, 150-166): run_ba drives the
    pipeline with the reference's exact tracks/cam config and harvests
    ba_params; apply_ba_to_dataset folds rpcs_adj + keypoints + pts3d.npy
    into the emitted JSONs; the result is a sat-nerf-trainable sparse
    keypoint dataset (load_sparse_depth consumes it)."""
    import shutil
    import sys
    import types
    from synth_aoi import affine_rpc_dict, localize_affine, ALT0, H, W
    from brdfnerf_tpu.geo.geodesy import latlon_to_ecef
    from brdfnerf_tpu.geo import rpc as rpc_mod_

    root = str(tmp_path / "root")
    os.makedirs(root)
    # copy only the image tif/json pairs (the shared fixture may have
    # accumulated *_mask.tif files from the mask test; run_ba globs *.tif)
    for i in range(3):
        for ext in (".tif", ".json"):
            shutil.copyfile(os.path.join(aoi["root"], f"img_{i:02d}{ext}"),
                            os.path.join(root, f"img_{i:02d}{ext}"))
    tilts = [(0.0, 0.0), (0.15, 0.05), (-0.1, 0.12)]

    # shared terrain tie points + exact per-camera observations
    kp_c, kp_r = np.meshgrid(np.arange(4, W - 4, 6), np.arange(4, H - 4, 6))
    lon, lat = localize_affine(affine_rpc_dict(), kp_c.ravel().astype(float),
                               kp_r.ravel().astype(float), ALT0)
    pts3d = np.stack(latlon_to_ecef(lat, lon, np.full(lon.shape, ALT0)), -1)
    pts2d_l, cam_ind_l, pts_ind_l = [], [], []
    for ci, tilt in enumerate(tilts):
        rm = rpc_mod_.rpc_from_dict(affine_rpc_dict(*tilt))
        c2, r2 = rpc_mod_.projection_np(rm, lon, lat,
                                        np.full(lon.shape, ALT0))
        pts2d_l.append(np.stack([c2, r2], -1))
        cam_ind_l.append(np.full(lon.size, ci))
        pts_ind_l.append(np.arange(lon.size))
    pts2d = np.concatenate(pts2d_l)
    cam_ind = np.concatenate(cam_ind_l)
    pts_ind = np.concatenate(pts_ind_l)

    # stub bundle_adjust package + rpcm (a separate conda env in the
    # reference; absent here) so run_ba's orchestration is exercised
    recorded = {}

    class SatelliteImage:
        def __init__(self, fn, rpc):
            self.geotiff_path, self.rpc = fn, rpc

    class Pipeline:
        def __init__(self, data, tracks_config=None, extra_ba_config=None):
            recorded["tracks"] = tracks_config
            recorded["extra"] = extra_ba_config
            self.out_dir = data["out_dir"]
            self.images = data["images"]

        def run(self):
            adj = os.path.join(self.out_dir, "rpcs_adj")
            os.makedirs(adj, exist_ok=True)
            for i, im in enumerate(self.images):
                img_id = os.path.splitext(
                    os.path.basename(im.geotiff_path))[0]
                with open(os.path.join(adj, img_id + ".rpc_adj"), "w") as f:
                    f.write(_rpc00b_text(affine_rpc_dict(*tilts[i])))
            self.ba_params = types.SimpleNamespace(
                pts_ind=pts_ind, cam_ind=cam_ind, pts3d_ba=pts3d,
                pts2d=pts2d, cam_prev_indices=list(range(len(self.images))))
            self.global_transform = 0.0

    mods = {}
    for name in ("bundle_adjust", "bundle_adjust.cam_utils",
                 "bundle_adjust.ba_pipeline", "bundle_adjust.loader",
                 "rpcm"):
        mods[name] = sys.modules.get(name)
        sys.modules[name] = types.ModuleType(name)
    sys.modules["bundle_adjust.cam_utils"].SatelliteImage = SatelliteImage
    sys.modules["bundle_adjust.ba_pipeline"].BundleAdjustmentPipeline = \
        Pipeline
    sys.modules["bundle_adjust.loader"].save_list_of_paths = \
        lambda p, lst: open(p, "w").write("\n".join(lst) + "\n")
    sys.modules["bundle_adjust"].cam_utils = \
        sys.modules["bundle_adjust.cam_utils"]
    sys.modules["bundle_adjust"].ba_pipeline = \
        sys.modules["bundle_adjust.ba_pipeline"]
    sys.modules["bundle_adjust"].loader = sys.modules["bundle_adjust.loader"]
    # img_02 exercises the sidecar fallback: its "geotiff tags" raise
    # (our codec does not embed RPC00B tags) and a .rpc sidecar exists
    with open(os.path.join(root, "img_02.rpc"), "w") as f:
        f.write(_rpc00b_text(affine_rpc_dict(*tilts[2])))

    def rpc_from_geotiff(p):
        if p.endswith("img_02.tif"):
            raise ValueError("no RPC tags in geotiff")
        return {"path": p}

    class RPCModel:
        def __init__(self, d, dict_format="geotiff"):
            assert dict_format == "rpcm"
            self.d = d

    sys.modules["rpcm"].rpc_from_geotiff = rpc_from_geotiff
    sys.modules["rpcm"].RPCModel = RPCModel
    try:
        out = dg.run_ba(root, str(tmp_path / "ba"))
    finally:
        for name, old in mods.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old

    assert out is not None
    # the reference's exact feature-tracks contract (generate_dataset.py:67)
    assert recorded["tracks"] == {
        "FT_reset": False, "FT_save": True, "FT_sift_detection": "s2p",
        "FT_sift_matching": "epipolar_based"}
    assert recorded["extra"] == {"cam_model": "rpc"}
    params_dir = os.path.join(out, "ba_files", "ba_params")
    for fn in ("pts_ind.npy", "cam_ind.npy", "pts3d.npy", "pts2d.npy",
               "geotiff_paths.txt"):
        assert os.path.exists(os.path.join(params_dir, fn)), fn

    # fold into the dataset and prove trainability of the result
    n = dg.apply_ba_to_dataset(root, out)
    assert n == 3
    with open(os.path.join(root, "img_00.json")) as f:
        meta = json.load(f)
    assert "keypoints" in meta and len(
        meta["keypoints"]["2d_coordinates"]) == lon.size
    assert os.path.exists(os.path.join(root, "pts3d.npy"))

    from brdfnerf_tpu.data.satellite import (load_sparse_depth,
                                             load_or_create_scene_loc)
    scene = load_or_create_scene_loc(root, stride=2)
    files = [os.path.join(root, f"img_{i:02d}.json") for i in range(2)]
    sp = load_sparse_depth(files, root, scene)
    n_rays = sp["rays"].shape[0]
    assert n_rays == 2 * lon.size
    assert sp["depths"].shape == (n_rays, 2)
    assert np.isfinite(sp["depths"]).all()

    # a camera pruned from geotiff_paths.txt (BA can drop a camera from
    # cam_prev_indices yet still emit its refined RPC) keeps its
    # rpcs_adj: the JSON is written with the adjusted rpc, keypoints
    # simply not attached
    root2 = str(tmp_path / "root2")
    os.makedirs(root2)
    for i in range(3):
        for ext in (".tif", ".json"):
            shutil.copyfile(os.path.join(aoi["root"], f"img_{i:02d}{ext}"),
                            os.path.join(root2, f"img_{i:02d}{ext}"))
    ba2 = str(tmp_path / "ba2")
    shutil.copytree(out, ba2)
    paths2 = os.path.join(ba2, "ba_files", "ba_params",
                          "geotiff_paths.txt")
    with open(paths2) as f:
        kept = [l for l in f.read().splitlines() if "img_01" not in l]
    with open(paths2, "w") as f:
        f.write("\n".join(kept) + "\n")
    assert dg.apply_ba_to_dataset(root2, ba2) == 3
    with open(os.path.join(root2, "img_01.json")) as f:
        m1 = json.load(f)
    adj = dg.adjusted_rpc_from_ba(ba2, "img_01")
    assert m1["rpc"] == adj          # NOT silently dropped
    assert "keypoints" not in m1


def _rpcm_write_to_file_text(d) -> str:
    """A .rpc_adj byte layout matching what sat-bundleadjust emits via
    rpcm's RPCModel file writer (IKONOS text: unit-suffixed offsets/scales,
    one COEFF line per index): generate_dataset.py:152-155 reads these with
    rpcm.rpc_from_rpc_file.  Numeric spellings deliberately mix the
    fixed-point and scientific forms real writers produce."""
    def sci(v):
        return f"{v:.16E}"
    lines = [f"LINE_OFF: {d['row_offset']:+013.6f} pixels",
             f"SAMP_OFF: {d['col_offset']:+013.6f} pixels",
             f"LAT_OFF: {d['lat_offset']:+013.8f} degrees",
             f"LONG_OFF: {d['lon_offset']:+013.8f} degrees",
             f"HEIGHT_OFF: {d['alt_offset']:+09.3f} meters",
             f"LINE_SCALE: {d['row_scale']:+013.6f} pixels",
             f"SAMP_SCALE: {d['col_scale']:+013.6f} pixels",
             f"LAT_SCALE: {d['lat_scale']:+013.8f} degrees",
             f"LONG_SCALE: {d['lon_scale']:+013.8f} degrees",
             f"HEIGHT_SCALE: {d['alt_scale']:+09.3f} meters"]
    for pref, key in (("LINE_NUM_COEFF", "row_num"),
                      ("LINE_DEN_COEFF", "row_den"),
                      ("SAMP_NUM_COEFF", "col_num"),
                      ("SAMP_DEN_COEFF", "col_den")):
        for j, v in enumerate(d[key]):
            lines.append(f"{pref}_{j + 1}: {sci(v)}")
    return "\n".join(lines) + "\n"


def test_ba_real_format_artifacts_to_training(tmp_path):
    """VENDORED-GOLDEN bundle-adjust round trip (reference
    generate_dataset.py:99-105,150-166 consumption contract): a ba_files/
    tree hand-authored in sat-bundleadjust's REAL on-disk formats — NOT
    written by this framework's writers — folds into an emitted dataset
    and trains 50 sat-nerf steps with the keypoint depth loss active.

    Real-world properties exercised:
      - geotiff_paths.txt records the PAN crops on a foreign machine
        (absolute /home/... paths, .../pan_crops/..._PAN.tif); the
        reference maps them to the RGB crops before basename matching
        (generate_dataset.py:102-104) and so must apply_ba_to_dataset.
      - rpcs_adj/{rgb_id}.rpc_adj in rpcm's IKONOS text layout with unit
        suffixes and mixed fixed/scientific numeric spellings.
      - pts3d.npy in ECEF (pts3d_ba - global_transform), pts2d float64
        (x, y) pixel pairs, pts_ind/cam_ind int64 — the npy quartet
        create_dataset loads verbatim (generate_dataset.py:105-108).
    """
    import shutil
    from synth_aoi import localize_affine
    from brdfnerf_tpu.geo.geodesy import latlon_to_ecef
    from brdfnerf_tpu.data.satellite import (SatelliteConfig,
                                             SatelliteDataset)

    src = build_aoi(str(tmp_path / "src"), n_train=3, n_test=1)
    root = str(tmp_path / "root")
    os.makedirs(root)
    names = []
    for i in range(4):
        rgb = f"img_{i:02d}_RGB"
        shutil.copyfile(os.path.join(src["root"], f"img_{i:02d}.tif"),
                        os.path.join(root, rgb + ".tif"))
        with open(os.path.join(src["root"], f"img_{i:02d}.json")) as f:
            meta = json.load(f)
        meta["img"] = rgb + ".tif"
        with open(os.path.join(root, rgb + ".json"), "w") as f:
            json.dump(meta, f, indent=2)
        names.append(rgb + ".json")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(names[:3]) + "\n")
    with open(os.path.join(root, "test.txt"), "w") as f:
        f.write(names[3] + "\n")

    # ---- hand-authored BA output in the real formats
    tilts = [(0.0, 0.0), (0.15, 0.05), (-0.1, 0.12), (0.05, -0.15)]
    kp_c, kp_r = np.meshgrid(np.arange(4, W - 4, 5), np.arange(4, H - 4, 5))
    lon, lat = localize_affine(affine_rpc_dict(),
                               kp_c.ravel().astype(float),
                               kp_r.ravel().astype(float), ALT0)
    pts3d = np.stack(latlon_to_ecef(lat, lon, np.full(lon.shape, ALT0)), -1)
    pts2d_l, cam_ind_l, pts_ind_l = [], [], []
    for ci, tilt in enumerate(tilts):
        rm = rpc_mod.rpc_from_dict(affine_rpc_dict(*tilt))
        c2, r2 = rpc_mod.projection_np(rm, lon, lat,
                                       np.full(lon.shape, ALT0))
        pts2d_l.append(np.stack([c2, r2], -1))
        cam_ind_l.append(np.full(lon.size, ci, np.int64))
        pts_ind_l.append(np.arange(lon.size, dtype=np.int64))

    ba = str(tmp_path / "ba_out")
    params_dir = os.path.join(ba, "ba_files", "ba_params")
    adj_dir = os.path.join(ba, "ba_files", "rpcs_adj")
    os.makedirs(params_dir)
    os.makedirs(adj_dir)
    np.save(os.path.join(params_dir, "pts_ind.npy"),
            np.concatenate(pts_ind_l))
    np.save(os.path.join(params_dir, "cam_ind.npy"),
            np.concatenate(cam_ind_l))
    np.save(os.path.join(params_dir, "pts2d.npy"),
            np.concatenate(pts2d_l).astype(np.float64))
    np.save(os.path.join(params_dir, "pts3d.npy"), pts3d)
    with open(os.path.join(params_dir, "geotiff_paths.txt"), "w") as f:
        for i in range(4):
            f.write(f"/home/lzhang/datasets/Dji/pan_crops/Dji_012/"
                    f"img_{i:02d}_PAN.tif\n")
    for i, tilt in enumerate(tilts):
        with open(os.path.join(adj_dir, f"img_{i:02d}_RGB.rpc_adj"),
                  "w") as f:
            f.write(_rpcm_write_to_file_text(affine_rpc_dict(*tilt)))

    # ---- fold + ingest + train
    assert dg.apply_ba_to_dataset(root, ba) == 4
    for i in range(4):
        with open(os.path.join(root, f"img_{i:02d}_RGB.json")) as f:
            m = json.load(f)
        assert "keypoints" in m, i          # PAN->RGB mapping worked
        assert len(m["keypoints"]["2d_coordinates"]) == lon.size
        # rpc replaced by the adjusted one, offsets surviving the
        # fixed-point spelling to 1e-6 px
        assert abs(m["rpc"]["row_offset"]
                   - affine_rpc_dict(*tilts[i])["row_offset"]) < 1e-5
    assert os.path.exists(os.path.join(root, "pts3d.npy"))

    cfg = SatelliteConfig(root_dir=root, aoi_id="Dji_012",
                          scene_loc_stride=2, sparse_depth=True,
                          load_depth=False)
    ds = SatelliteDataset(cfg, split="train")
    assert ds.depth_store is not None
    assert ds.depth_store["rays"].shape[0] == 3 * lon.size
    assert np.isfinite(ds.depth_store["depths"]).all()

    from brdfnerf_tpu.config import (RenderConfig, TrainConfig, RunConfig)
    from brdfnerf_tpu.models.network import model_config_for_variant
    from brdfnerf_tpu.train import Trainer, TrainerPaths
    import dataclasses as dc
    mcfg = dc.replace(model_config_for_variant("sat-nerf"),
                      layers=4, feat=64, skips=(2,))
    rcfg = RenderConfig(n_samples=8, guided_samples=0)
    tcfg = TrainConfig(lr=1e-3, batch_size=256, max_train_steps=50,
                       ds_lambda=10.0, first_beta_epoch=0)
    paths = TrainerPaths(logs_dir=str(tmp_path / "l"),
                         ckpts_dir=str(tmp_path / "c"))
    tr = Trainer(RunConfig(model=mcfg, render=rcfg, train=tcfg), ds.store,
                 paths, seed=0, depth_store=ds.depth_store)
    assert tr.depth_batcher is not None
    first = tr.fit(max_steps=6, log_every=1, progress=False)
    last = tr.fit(max_steps=50, log_every=50, progress=False)
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"]
