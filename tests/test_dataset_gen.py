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
