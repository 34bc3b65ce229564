"""Offline dataset generation: per-image JSON metadata, footprint masks,
train/test splits, DSM crops (reference: generate_dataset.py:90-508).

The reference's pipeline is: crop DSM + image patches -> (optional) external
`sat-bundleadjust` -> per-image JSON (img/h/w/sun angles/geojson footprint/
alt bounds from the DSM/rpc + keypoints) -> footprint masks -> random
splits.  Bundle adjustment remains an external tool there (separate conda
env, setup_ba_env.sh) and here; this module consumes its outputs
(rpcs_adj/*.rpc_adj, pts3d.npy, keypoint arrays) when present and otherwise
emits JSONs with the original RPCs.

TPU-era rewrites: the mask generator replaces the reference's per-pixel
cv2.pointPolygonTest double loop (generate_dataset.py:213-216, O(h*w) host
calls) with one vectorized ray-casting test over the full pixel grid.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .geo import rpc as rpc_mod
from .utils.geotiff import read_geotiff, write_geotiff, GeoProfile


def image_footprint_geojson(rpc: rpc_mod.RPCModel, h: int, w: int,
                            z: float = 0.0) -> Dict:
    """Lon/lat polygon of the image corners at altitude z
    (get_image_lonlat_aoi analog)."""
    cols = np.asarray([0, w - 1, w - 1, 0], np.float64)
    rows = np.asarray([0, 0, h - 1, h - 1], np.float64)
    lon, lat = rpc_mod.localization_np(rpc, cols, rows, z)
    coords = [[float(lo), float(la)] for lo, la in zip(lon, lat)]
    coords.append(coords[0])
    center = [float(np.mean(lon)), float(np.mean(lat))]
    return {"type": "Polygon", "coordinates": [coords], "center": center}


def create_image_json(img_path: str, rpc_dict: Dict, sun_elevation: float,
                      sun_azimuth: float, out_dir: str,
                      dsm_path: Optional[str] = None,
                      min_alt: Optional[float] = None,
                      max_alt: Optional[float] = None,
                      acquisition_date: str = "20130126",
                      keypoints: Optional[Dict] = None) -> str:
    """Emit one per-image metadata JSON (generate_dataset.py:120-170)."""
    arr, _ = read_geotiff(img_path)
    _, h, w = arr.shape
    if (min_alt is None or max_alt is None) and dsm_path:
        dsm_arr, _ = read_geotiff(dsm_path)
        dsm = dsm_arr[0][np.isfinite(dsm_arr[0])]
        min_alt = int(np.round(dsm.min() - 1)) if min_alt is None else min_alt
        max_alt = int(np.round(dsm.max() + 1)) if max_alt is None else max_alt
    rpc = rpc_mod.rpc_from_dict(rpc_dict)
    d = {
        "img": os.path.basename(img_path),
        "height": int(h), "width": int(w),
        "sun_elevation": float(sun_elevation),
        "sun_azimuth": float(sun_azimuth),
        "acquisition_date": acquisition_date,
        "geojson": image_footprint_geojson(rpc, h, w,
                                           z=0.5 * (min_alt + max_alt)),
        "min_alt": float(min_alt), "max_alt": float(max_alt),
        "rpc": rpc_dict,
    }
    if keypoints is not None:
        d["keypoints"] = keypoints
    os.makedirs(out_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(img_path))[0] + ".json"
    path = os.path.join(out_dir, name)
    with open(path, "w") as f:
        json.dump(d, f, indent=2)
    return path


def load_sun_angle_table(path: str) -> Dict[str, Tuple[float, float]]:
    """pleiades_sun_angles.txt: rows of (img_substring, elevation, azimuth)
    (generate_dataset.py:117-141)."""
    table = {}
    rows = np.loadtxt(path, dtype=str)
    if rows.ndim == 1:
        rows = rows[None]
    for row in rows:
        table[row[0]] = (float(row[1]), float(row[2]))
    return table


def _points_in_polygon(px: np.ndarray, py: np.ndarray,
                       poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting; px/py flat, poly (V, 2)."""
    x0, y0 = poly[:, 0], poly[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    inside = np.zeros(px.shape, bool)
    for ax, ay, bx, by in zip(x0, y0, x1, y1):
        cond = ((ay > py) != (by > py)) & (
            px < (bx - ax) * (py - ay) / (by - ay + 1e-30) + ax)
        inside ^= cond
    return inside


def generate_footprint_masks(json_dir: str, ref_json: str) -> List[str]:
    """{json}_mask.tif masks marking the reference (most-nadir) image's
    footprint in every other image (generate_dataset.py:176-218).

    ref_json: filename of the reference image's JSON inside json_dir.
    """
    from PIL import Image
    with open(os.path.join(json_dir, ref_json)) as f:
        ref = json.load(f)
    alt = 0.5 * (float(ref["min_alt"]) + float(ref["max_alt"]))
    if "geojson" not in ref:     # derive the footprint from the RPC
        ref_rpc = rpc_mod.rpc_from_dict(ref["rpc"])
        ref["geojson"] = image_footprint_geojson(
            ref_rpc, int(ref["height"]), int(ref["width"]), z=alt)
    poly_ll = np.asarray(ref["geojson"]["coordinates"][0], np.float64)
    lon, lat = poly_ll[:, 0], poly_ll[:, 1]

    out = []
    for json_p in sorted(glob.glob(os.path.join(json_dir, "*.json"))):
        with open(json_p) as f:
            d = json.load(f)
        h, w = int(d["height"]), int(d["width"])
        rpc = rpc_mod.rpc_from_dict(d["rpc"])
        col, row = rpc_mod.projection_np(rpc, lon, lat,
                                         np.full_like(lon, alt))
        poly = np.stack([np.asarray(col), np.asarray(row)], -1)
        cols, rows = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
        inside = _points_in_polygon(cols.ravel(), rows.ravel(), poly)
        mask = (inside.reshape(h, w) * 255).astype(np.uint8)
        mask_p = json_p[:-5] + "_mask.tif"
        Image.fromarray(mask).save(mask_p)
        out.append(mask_p)
    return out


def create_train_test_splits(sample_ids: Sequence[str],
                             test_percent: float = 0.15,
                             min_test_samples: int = 2,
                             seed: Optional[int] = None):
    """Random split (generate_dataset.py:220-240)."""
    ids = list(sample_ids)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(ids))
    n_test = max(min_test_samples, int(test_percent * len(ids)))
    train = [ids[i] for i in idx[:len(ids) - n_test]]
    test = [ids[i] for i in idx[len(ids) - n_test:]]
    return train, test


def write_splits(json_dir: str, train: Sequence[str], test: Sequence[str],
                 postfix: str = ".txt"):
    with open(os.path.join(json_dir, f"train{postfix}"), "w") as f:
        f.write("".join(n + "\n" for n in train))
    with open(os.path.join(json_dir, f"test{postfix}"), "w") as f:
        f.write("".join(n + "\n" for n in test))


def crop_dsm(dsm_path: str, out_path: str, ulx: float, uly: float,
             xsize: int, ysize: int, write_roi_txt: bool = True) -> str:
    """Crop a GT DSM to an AOI window + emit the {aoi}_DSM.txt ROI metadata
    (CropDSM analog, generate_dataset.py:438-481)."""
    from .geo.dsm import crop_to_roi
    arr, prof = read_geotiff(dsm_path)
    out = crop_to_roi(arr[0].astype(np.float32), prof, ulx, uly,
                      xsize, ysize)
    res = prof.xres
    new_prof = GeoProfile(width=xsize, height=ysize, ulx=ulx, uly=uly,
                          xres=res, yres=prof.yres, epsg=prof.epsg,
                          nodata=float("nan"))
    write_geotiff(out_path, out[None], new_prof)
    if write_roi_txt:
        roi_txt = os.path.splitext(out_path)[0] + ".txt"
        np.savetxt(roi_txt,
                   np.asarray([ulx, uly - ysize * prof.yres, xsize, res]))
    return out_path


def adjusted_rpc_from_ba(output_dir: str, img_id: str) -> Optional[Dict]:
    """Read a bundle-adjusted RPC written by the external sat-bundleadjust
    (ba_files/rpcs_adj/{img}.rpc_adj, generate_dataset.py:152-155); returns
    None when absent.  The .rpc_adj format is the classic RPC text file."""
    path = os.path.join(output_dir, "ba_files", "rpcs_adj",
                        f"{img_id}.rpc_adj")
    if not os.path.exists(path):
        return None
    return parse_rpc_file(path)


_RPC_FIELDS = {
    "LINE_OFF": "row_offset", "SAMP_OFF": "col_offset",
    "LAT_OFF": "lat_offset", "LONG_OFF": "lon_offset",
    "HEIGHT_OFF": "alt_offset",
    "LINE_SCALE": "row_scale", "SAMP_SCALE": "col_scale",
    "LAT_SCALE": "lat_scale", "LONG_SCALE": "lon_scale",
    "HEIGHT_SCALE": "alt_scale",
}


def parse_rpc_file(path: str) -> Dict:
    """Parse a classic RPC00B text file (LINE_OFF: ... / LINE_NUM_COEFF_1:)
    into the rpcm-style dict the datasets consume."""
    d: Dict = {"row_num": [0.0] * 20, "row_den": [0.0] * 20,
               "col_num": [0.0] * 20, "col_den": [0.0] * 20}
    coeff_map = {"LINE_NUM_COEFF": "row_num", "LINE_DEN_COEFF": "row_den",
                 "SAMP_NUM_COEFF": "col_num", "SAMP_DEN_COEFF": "col_den"}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, val = line.split(":", 1)
            key = key.strip()
            val = val.strip().split()[0]
            if key in _RPC_FIELDS:
                d[_RPC_FIELDS[key]] = float(val)
            else:
                for pref, target in coeff_map.items():
                    if key.startswith(pref + "_"):
                        idx = int(key[len(pref) + 1:]) - 1
                        d[target][idx] = float(val)
    return d
