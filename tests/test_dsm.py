"""GeoTIFF codec, NCC registration, and DSM evaluation chain tests."""

import numpy as np
import pytest

from synth_aoi import build_aoi, ALT0, MIN_ALT, MAX_ALT
from brdfnerf_tpu.utils.geotiff import (read_geotiff, write_geotiff,
                                        GeoProfile, utm_epsg)
from brdfnerf_tpu.geo import registration as reg
from brdfnerf_tpu.geo.dsm import (rasterize_cloud, dsm_from_depth,
                                  crop_to_roi, interpolate_nans, mae_report)
from brdfnerf_tpu.data.satellite import SatelliteConfig, SatelliteDataset


@pytest.fixture(scope="module")
def aoi(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_aoi_dsm")
    return build_aoi(str(root))


def test_geotiff_roundtrip_dtypes(tmp_path):
    for arr in (np.random.randint(0, 255, (3, 20, 30), dtype=np.uint8),
                np.random.randint(0, 60000, (1, 15, 17), dtype=np.uint16),
                np.random.randn(1, 9, 11).astype(np.float32)):
        p = str(tmp_path / "t.tif")
        prof = GeoProfile(ulx=354000.5, uly=5186000.0, xres=0.5, yres=0.5,
                          epsg=utm_epsg(31, True))
        write_geotiff(p, arr, prof, nodata=-9999.0)
        back, q = read_geotiff(p)
        assert back.dtype == arr.dtype and np.array_equal(back, arr)
        assert q.epsg == 32631 and q.nodata == -9999.0
        assert abs(q.ulx - 354000.5) < 1e-9 and abs(q.xres - 0.5) < 1e-12


def test_registration_recovers_known_shift():
    rng = np.random.default_rng(0)
    base = rng.normal(100.0, 5.0, (64, 64))
    # smooth it so NCC has structure
    from scipy import ndimage
    base = ndimage.gaussian_filter(base, 3)
    dx, dy, bz = 3, -2, 1.7
    # sec[j, i] = ref[j - dy, i - dx] - bz  => registering sec onto ref
    # should find (dx, dy) with sec[j + dy, i + dx] == ref[j, i] - bz
    sec = np.full_like(base, np.nan)
    sec[max(0, dy):64 + min(0, dy), max(0, dx):64 + min(0, dx)] = (
        base[max(0, -dy):64 + min(0, -dy), max(0, -dx):64 + min(0, -dx)]
        - bz)
    fdx, fdy, a, b = reg.compute_shift(base, sec, scaling=False)
    assert (fdx, fdy) == (dx, dy)
    assert a == 1.0 and abs(b - bz) < 1e-6
    rdsm = reg.apply_shift(sec, fdx, fdy, a, b)
    m = np.isfinite(rdsm)
    np.testing.assert_allclose(rdsm[m], base[m], atol=1e-6)


def test_rasterize_cloud_average():
    cloud = np.asarray([
        [0.25, 9.75, 10.0],    # cell (row 0, col 0)
        [0.30, 9.70, 14.0],    # same cell
        [4.75, 5.25, 7.0],     # far cell
    ])
    dsm = rasterize_cloud(cloud, xoff=0.0, yoff=10.0, resolution=0.5,
                          xsize=20, ysize=20, radius=0)
    assert dsm[0, 0] == pytest.approx(12.0)
    assert dsm[9, 9] == pytest.approx(7.0)
    assert np.isnan(dsm[5, 5])


def test_crop_and_interp():
    prof = GeoProfile(ulx=100.0, uly=200.0, xres=1.0, yres=1.0)
    dsm = np.arange(100, dtype=np.float32).reshape(10, 10)
    out = crop_to_roi(dsm, prof, 103.0, 198.0, 4, 4)
    assert out[0, 0] == dsm[2, 3]
    out2 = crop_to_roi(dsm, prof, 95.0, 205.0, 6, 6)    # partly outside
    assert np.isnan(out2[0, 0]) and out2[5, 5] == dsm[0, 0]
    holey = dsm.copy()
    holey[4, 4] = np.nan
    filled = interpolate_nans(holey)
    assert np.isfinite(filled).all()
    assert filled[4, 4] in (holey[3, 4], holey[5, 4], holey[4, 3],
                            holey[4, 5])


def test_dsm_eval_end_to_end(aoi):
    """Analytic depth on flat terrain -> DSM -> MAE vs flat GT ~ 0."""
    cfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                          scene_loc_stride=2)
    ds = SatelliteDataset(cfg, split="val")
    s = ds.get_image(0)
    rays = s["rays"]
    frac = (MAX_ALT - ALT0) / (MAX_ALT - MIN_ALT)
    depth = frac * rays[:, 7]
    from brdfnerf_tpu.geo.dsm import load_roi
    roi = load_roi(aoi["gt_dir"], aoi["aoi_id"])
    dsm, prof = dsm_from_depth(rays, depth, ds.scene, cs="utm",
                               utm_zone=ds.utm_zone,
                               resolution=float(roi[3]))
    assert np.isfinite(dsm).any()
    finite = dsm[np.isfinite(dsm)]
    np.testing.assert_allclose(finite, ALT0, atol=0.05)
    rep = mae_report(dsm, prof, aoi["gt_dir"], aoi["aoi_id"],
                     calc_mae_nr=True)
    assert rep.mae < 0.05
    # grid borders contribute 90deg by construction (reference parity);
    # the interior away from data edges must be ~0
    interior = rep.diff_nr[2:-2, 2:-2]
    assert np.isfinite(interior).any()
    assert np.nanmax(np.abs(interior)) < 1.0
    assert rep.mae_nr < 20.0
