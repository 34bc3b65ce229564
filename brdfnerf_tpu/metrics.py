"""Image metrics: PSNR / SSIM with the reference's (non-standard) conventions.

PSNR normalizes the squared error by max(gt)^2 (metrics.py:292-316), NOT by
a fixed peak of 1.0 — this matters for fidelity comparisons and is kept.
SSIM reproduces kornia==0.5.3 `kornia.losses.ssim` (requirements.txt:10)
exactly as called at reference metrics.py:327-341: 3x3 gaussian window
(sigma 1.5), SAME-size output via reflect padding (kornia filter2D's
default border_type), eps=1e-12 on the denominator, mean over the per-pixel
map, max_val = max(gt). The reference's masked convention multiplies BOTH
images by the AOI mask before calling (main.py:607, eval.py:471), so
max_val becomes max(gt*mask) — callers do `ssim(pred*mask, gt*mask)`.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(image_pred, image_gt, valid_mask=None):
    value = (image_pred - image_gt) ** 2
    value = value / (jnp.max(image_gt) ** 2)
    if valid_mask is not None:
        # per-ELEMENT mean over the masked region: the mask (e.g. (h,w,1))
        # broadcasts across channels, so the denominator must count every
        # masked element, not masked pixels — the reference's boolean
        # row-indexing (value[valid_mask].mean(), metrics.py:295-298)
        # averages per element; a pixel-count denominator inflated the
        # masked MSE by x3 (-4.77 dB PSNR)
        m = jnp.broadcast_to(valid_mask, value.shape)
        return jnp.sum(value * m) / jnp.maximum(jnp.sum(m), 1)
    return jnp.mean(value)


def psnr(image_pred, image_gt, valid_mask=None):
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask))


def _gaussian_kernel(window: int, sigma: float, dtype):
    x = jnp.arange(window, dtype=dtype) - (window - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def ssim(image_pred, image_gt, window: int = 3, max_val=None,
         eps: float = 1e-12):
    """SSIM over (C, H, W) or (H, W, C) images, kornia-0.5.3-exact:
    separable gaussian window sigma=1.5, reflect-padded SAME-size map
    (kornia filter2D border_type='reflect'), num/(den+eps), mean."""
    if image_pred.ndim == 3 and image_pred.shape[0] in (1, 3):
        pred = image_pred
        gt = image_gt
    else:
        pred = jnp.moveaxis(image_pred, -1, 0)
        gt = jnp.moveaxis(image_gt, -1, 0)
    if max_val is None:
        max_val = jnp.max(gt)

    k = _gaussian_kernel(window, 1.5, pred.dtype)
    pad = (window - 1) // 2

    def blur(img):
        # separable conv along H then W, per channel, reflect 'same'
        def conv1d(x, axis):
            x = jnp.moveaxis(x, axis, -1)
            padw = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
            x = jnp.pad(x, padw, mode="reflect")
            n = x.shape[-1] - window + 1
            out = jnp.zeros(x.shape[:-1] + (n,), x.dtype)
            for i in range(window):
                out = out + k[i] * x[..., i:i + n]
            return jnp.moveaxis(out, -1, axis)
        return conv1d(conv1d(img, 1), 2)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_p = blur(pred)
    mu_g = blur(gt)
    mu_pg = mu_p * mu_g
    sigma_p = blur(pred * pred) - mu_p ** 2
    sigma_g = blur(gt * gt) - mu_g ** 2
    sigma_pg = blur(pred * gt) - mu_pg
    num = (2 * mu_pg + c1) * (2 * sigma_pg + c2)
    den = (mu_p ** 2 + mu_g ** 2 + c1) * (sigma_p + sigma_g + c2)
    return jnp.mean(num / (den + eps))


def scale_images(img1, img2):
    """Rescale both by max of img2 (sclimg, metrics.py:301-308)."""
    max_ = jnp.max(img2)
    return img1 / max_, img2 / max_


def masked_scores(rgb, gt, mask=None, scl: bool = False,
                  with_unmasked: bool = False):
    """The reference's masked PSNR/SSIM scoring convention, in ONE place
    for both the validation loop and the eval CLI (main.py:603-607,
    eval.py:469-471):

      psnr      masked per-element (valid_mask into the MSE mean)
      ssim      ssim(pred*mask, gt*mask) — both images premultiplied, so
                max_val = max(gt*mask)
      *_all     with_unmasked=True: the unmasked pair tracked alongside
                (psnr_all/ssim_all) — the VALIDATION loop's diagnostic
                (main.py:604-606); the reference's eval CLI computes only
                the masked pair, so eval leaves this off
      *_scl     optional max(gt)-rescaled variants (sclimg), same masking

    mask: (H, W, 1) array or None (then masked == unmasked).
    Returns a dict of python floats.
    """
    if mask is not None:
        p = float(psnr(rgb, gt, mask))
        s = float(ssim(rgb * mask, gt * mask))
    else:
        p = float(psnr(rgb, gt))
        s = float(ssim(rgb, gt))
    out = {"psnr": p, "ssim": s}
    if with_unmasked:
        out["psnr_all"] = p if mask is None else float(psnr(rgb, gt))
        out["ssim_all"] = s if mask is None else float(ssim(rgb, gt))
    if scl:
        rgb_s, gt_s = scale_images(rgb, gt)
        out["psnr_scl"] = float(psnr(rgb_s, gt_s, mask))
        out["ssim_scl"] = float(ssim(rgb_s * mask, gt_s * mask)
                                if mask is not None else ssim(rgb_s, gt_s))
    return out
