"""Visualization helpers: the reference's TensorBoard image-stack toolkit
(train_utils.py:161-331) as NumPy functions returning (H, W, 3) uint8.

  normal_to_rgb        <- visualize_normal: n in [-1,1] -> (n+1)/2 RGB
  accumulate_feature   <- visualize_accumulated_feature: per-sample fields
                          weighted-summed along the ray then normalized by
                          mode none / minmax / -1et1 / enhance
  colorize             <- rainbow colormap for scalar fields (depth, diff)
  depth_to_rgb, diff_to_rgb
  image_stack          <- stack panels vertically for one summary image
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def _to_uint8(x: np.ndarray) -> np.ndarray:
    return (np.clip(x, 0.0, 1.0) * 255.0).astype(np.uint8)


def normal_to_rgb(normals: np.ndarray) -> np.ndarray:
    """(H, W, 3) normals in [-1, 1] -> RGB."""
    return _to_uint8((normals + 1.0) * 0.5)


def normalize_field(x: np.ndarray, mode: str = "minmax") -> np.ndarray:
    """Reference norm modes (train_utils.visualize_accumulated_feature):
    'none' (clip), 'minmax', '-1et1' (x/2+0.5), 'enhance' (2/98 percentile).
    """
    if mode == "none":
        return np.clip(x, 0.0, 1.0)
    if mode == "-1et1":
        return np.clip(x * 0.5 + 0.5, 0.0, 1.0)
    if mode == "enhance":
        lo, hi = np.nanpercentile(x, 2), np.nanpercentile(x, 98)
    else:
        lo, hi = np.nanmin(x), np.nanmax(x)
    return np.clip((x - lo) / max(hi - lo, 1e-12), 0.0, 1.0)


def colorize(x: np.ndarray, mode: str = "minmax") -> np.ndarray:
    """Scalar (H, W) -> rainbow RGB uint8 (cv2 COLORMAP_JET analog used by
    the reference's getRainbowColor)."""
    import cv2
    v = normalize_field(np.nan_to_num(x), mode)
    m = cv2.applyColorMap(_to_uint8(v), cv2.COLORMAP_JET)
    return cv2.cvtColor(m, cv2.COLOR_BGR2RGB)


def accumulate_feature(weights: np.ndarray, feature: np.ndarray,
                       h: int, w: int, mode: str = "minmax") -> np.ndarray:
    """Per-sample feature (N, S, C) weighted along samples -> (H, W, C)
    uint8 panel."""
    acc = np.sum(weights[..., None] * feature, axis=-2)
    c = acc.shape[-1]
    img = acc.reshape(h, w, c)
    if c == 1:
        return colorize(img[..., 0], mode)
    return _to_uint8(normalize_field(img, mode))


def depth_to_rgb(depth: np.ndarray, h: int, w: int) -> np.ndarray:
    return colorize(depth.reshape(h, w), "minmax")


def diff_to_rgb(diff: np.ndarray, clip: float = 2.0) -> np.ndarray:
    """Signed diff -> blue/red diverging panel, clipped at +/- clip."""
    v = np.clip(np.nan_to_num(diff) / clip, -1.0, 1.0)
    r = np.clip(v, 0, 1)
    b = np.clip(-v, 0, 1)
    g = 1.0 - np.abs(v)
    return _to_uint8(np.stack([r, g, b], -1))


def image_stack(panels: List[np.ndarray], pad: int = 2) -> np.ndarray:
    """Stack equally-wide RGB panels vertically with a white separator
    (the reference's stack handed to add_images, main.py:457-558)."""
    w = max(p.shape[1] for p in panels)
    rows = []
    for p in panels:
        if p.ndim == 2:
            p = np.stack([p] * 3, -1)
        if p.shape[1] < w:
            p = np.pad(p, ((0, 0), (0, w - p.shape[1]), (0, 0)),
                       constant_values=255)
        rows.append(p)
        rows.append(np.full((pad, w, 3), 255, np.uint8))
    return np.concatenate(rows[:-1], 0)


def save_png(path: str, img: np.ndarray):
    from PIL import Image
    Image.fromarray(img).save(path)


# (key, norm mode) of the per-ray accumulated maps rendered as panels, in
# the reference's stack order (main.py:426-558): albedo, sun visibility,
# sky color, normals (analytic / learned), roughness, RPV k/theta/rhoc,
# Hapke b/c/theta, irradiance, beta uncertainty.
PANEL_MODES = (
    ("albedo_coarse", "none"), ("sun_coarse", "none"),
    ("sky_coarse", "none"), ("normal_an_coarse", "-1et1"),
    ("normal_lr_coarse", "-1et1"), ("roughness_coarse", "minmax"),
    ("rpv_k_coarse", "minmax"), ("rpv_theta_coarse", "-1et1"),
    ("rpv_rhoc_coarse", "minmax"), ("hpk_b_coarse", "minmax"),
    ("hpk_c_coarse", "minmax"), ("hpk_theta_coarse", "minmax"),
    ("irradiance_coarse", "none"), ("beta_coarse", "minmax"),
)


def render_summary_panels(maps: Dict[str, np.ndarray], gt_rgb: np.ndarray,
                          h: int, w: int,
                          diff: Optional[np.ndarray] = None,
                          diff_nr: Optional[np.ndarray] = None,
                          visu_scale: float = 1.0) -> np.ndarray:
    """The per-image validation stack (main.py:426-558 analog): rgb / gt /
    depth plus albedo / irradiance / sun / normals / BRDF-parameter maps —
    whichever per-ray accumulated (N, C) maps the dict carries (as produced
    by Trainer.render_image) — and optionally the registered DSM diff
    panels (main.py:630-636: diff clipped to +/-20 m, normal-angle diff to
    0..90 deg)."""
    # visu_scale brightens rgb / gt / albedo panels only
    # (main.py:464-470, eval.py:422-428)
    vs = float(visu_scale)
    panels = [_to_uint8(maps["rgb_coarse"].reshape(h, w, 3) * vs),
              _to_uint8(gt_rgb.reshape(h, w, 3) * vs),
              depth_to_rgb(maps["depth_coarse"], h, w)]
    for key, mode in PANEL_MODES:
        if key not in maps:
            continue
        img = np.asarray(maps[key]).reshape(h, w, -1)
        if key == "albedo_coarse":
            img = img * vs
        if img.shape[-1] == 1:
            panels.append(colorize(img[..., 0], mode))
        else:
            panels.append(_to_uint8(normalize_field(img, mode)))
    if diff is not None:
        panels.append(colorize((np.clip(diff, -20.0, 20.0) + 20.0) / 40.0,
                               "none"))
    if diff_nr is not None:
        panels.append(colorize(np.clip(diff_nr, 0.0, 90.0) / 90.0, "none"))
    return image_stack(panels)
