"""Ray samplers: stratified, inverse-CDF importance, Gaussian guided.

Behavioral contract is the reference's sampler suite (rendering.py:13-166)
re-expressed with static shapes, explicit PRNG keys, and no boolean
indexing, so the whole pipeline stays inside one jitted program:

  * stratified_z_vals       <- get_z_vals            (rendering.py:149-166)
  * sample_pdf              <- sample_pdf            (rendering.py:13-52)
  * sample_gaussian_3sigma  <- sample_3sigma         (rendering.py:54-74)
  * sample_gaussian_3sigma_sym <- sample_3sigma_asym (rendering.py:76-91)
  * samples_around_depth    <- compute_samples_around_depth (rendering.py:116-130)
  * guided_samples          <- GenerateGuidedSamples (rendering.py:132-147);
    the data-dependent valid-depth swap becomes a jnp.where mask.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from .compositing import depth_std

# Auto-split bound for the inverse-CDF one-hot lookups: the gather-free
# path materializes two (N, U, B+1) f32 one-hots + the i32 searchsorted
# compare, i.e. 12 bytes per lane of transient HBM (analytic table:
# examples/results/sample_pdf_memory.json — the tunnel TPU device exposes
# no memory_stats, so the table's measured column is null there and the
# no-fusion analytic bound is the operative number).  Above this many lanes
# the lookup runs as a lax.map over row blocks — strictly sequential, so
# peak transient stays at one block (~384 MB at the default bound).
# Production training (1024x64x65 = 4.2M lanes) and the serving chunk at
# guided 64 (5120x64x65 = 21M) stay single-block; 128+ importance draws
# at serving chunks split.  Override with BRDFNERF_SAMPLE_PDF_MAX_ELEMS.
_MAX_LOOKUP_ELEMS = int(os.environ.get("BRDFNERF_SAMPLE_PDF_MAX_ELEMS",
                                       str(1 << 25)))


def stratified_z_vals(key, n_samples: int, near, far,
                      use_disp: bool = False, perturb: float = 1.0):
    """Linear (or disparity-linear) depths near->far with jittered midpoints.

    near/far: (N_rays, 1). Returns (N_rays, n_samples).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if not use_disp:
        z = near * (1.0 - t) + far * t
    else:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    if perturb > 0:
        mid = 0.5 * (z[:, :-1] + z[:, 1:])
        upper = jnp.concatenate([mid, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mid], axis=-1)
        u = perturb * jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(key, bins, weights, n_importance: int,
               det: bool = False, eps: float = 1e-5,
               max_lookup_elems: int = None):
    """Inverse-CDF sampling of a histogram.

    bins: (N, B+1) edges; weights: (N, B). Returns (N, n_importance).
    Rows are independent, so when the (N, U, B+1) lookup transient would
    exceed max_lookup_elems lanes (default _MAX_LOOKUP_ELEMS) the lookup
    runs sequentially over power-of-two row blocks — same math on the
    same rows (equal to within one ulp: the lax.map body compiles as its
    own program, whose fusion/FMA choices may differ), bounded peak HBM.
    """
    n_rays, n_bins = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, B+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=bins.dtype)

    if max_lookup_elems is None:
        max_lookup_elems = _MAX_LOOKUP_ELEMS
    total = n_rays * n_importance * (n_bins + 1)
    k = 1
    while total // k > max_lookup_elems and n_rays % (2 * k) == 0:
        k *= 2
    if k > 1:
        blk = n_rays // k
        out = jax.lax.map(
            lambda args: _inv_cdf_lookup(*args, n_bins=n_bins, eps=eps),
            (cdf.reshape(k, blk, n_bins + 1),
             bins.reshape(k, blk, n_bins + 1),
             u.reshape(k, blk, n_importance)))
        return out.reshape(n_rays, n_importance)
    return _inv_cdf_lookup(cdf, bins, u, n_bins=n_bins, eps=eps)


def _inv_cdf_lookup(cdf, bins, u, n_bins: int, eps: float):
    """The (N, U, B+1) searchsorted + one-hot interpolation block of
    sample_pdf, row-independent (factored out so sample_pdf can bound its
    transient HBM by mapping over row blocks)."""
    # searchsorted(cdf, u, side='right') == #(cdf <= u): a broadcasted
    # compare + sum ((N, U, B+1), ~4M lanes at production sizes) runs in
    # microseconds on the VPU, where vmapped binary search lowered to
    # ~7 ms of data-dependent control flow per call
    inds = jnp.sum((cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32),
                   axis=-1)
    below = jnp.clip(inds - 1, 0, None)
    above = jnp.clip(inds, None, n_bins)

    # the 4 row-wise gathers as one-hot masked reductions: XLA lowers a
    # minor-axis take_along_axis to a scalar gather loop on TPU (~0.67 ms
    # EACH at (1024, 64) from (1024, 65) on v5e — 5.4 ms/step across the
    # two sample_pdf calls of a guided render); the (N, U, B+1) one-hot
    # compare + reduce stays on the VPU and costs microseconds
    # precision='highest': the einsum lowers to dot_general, and TPU's
    # default matmul precision would round the f32 cdf/bin operands to
    # bf16 — the lookups must stay EXACT (the old gathers were; adjacent
    # CDF gaps below ~2^-9 would otherwise collapse onto the eps guard)
    iota = jnp.arange(n_bins + 1, dtype=jnp.int32)
    oh_below = (iota[None, None, :] == below[:, :, None]).astype(bins.dtype)
    oh_above = (iota[None, None, :] == above[:, :, None]).astype(bins.dtype)
    cdf_lo = jnp.einsum("nub,nb->nu", oh_below, cdf, precision="highest")
    cdf_hi = jnp.einsum("nub,nb->nu", oh_above, cdf, precision="highest")
    bin_lo = jnp.einsum("nub,nb->nu", oh_below, bins, precision="highest")
    bin_hi = jnp.einsum("nub,nb->nu", oh_above, bins, precision="highest")

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)  # zero-weight bins never sampled
    return bin_lo + (u - cdf_lo) / denom * (bin_hi - bin_lo)


def sample_gaussian_3sigma(key, low, high, n: int, det: bool,
                           d_range: float = 3.0, eps: float = 1e-5):
    """N samples under a Gaussian spanning [low, high] (= mu +/- d_range*sigma).

    low/high: (N_rays,). Returns sorted (N_rays, n).
    """
    t = jnp.linspace(0.0, 1.0, n, dtype=low.dtype)
    step = (high - low) / (n - 1)                       # (N_rays,)
    edges = low[:, None] * (1.0 - t) + high[:, None] * t  # (N_rays, n)
    factor = (edges[:, 1:] - edges[:, :-1]) / (step[:, None] + eps)
    x = jnp.linspace(-d_range, d_range, n - 1, dtype=low.dtype)
    gauss = (1.0 / math.sqrt(2.0 * math.pi)) * jnp.exp(-0.5 * x * x)
    w = factor * gauss[None, :]
    res = sample_pdf(key, edges, w, n, det=det)
    return jnp.sort(res, axis=-1)


def sample_gaussian_3sigma_sym(key, depth, low, high, n: int, det: bool,
                               near, far, d_range: float = 3.0):
    """Symmetrize the band about `depth` (min one-sided range) then sample.

    depth/low/high: (N_rays,). near/far: scalars.
    """
    low = jnp.clip(low, near, far)
    high = jnp.clip(high, near, far)
    rng = jnp.minimum(jnp.abs(high - depth), jnp.abs(low - depth))
    return sample_gaussian_3sigma(key, depth - rng, depth + rng, n, det,
                                  d_range=d_range)


def samples_around_depth(key, pred_depth, pred_weight, z_vals, n: int,
                         det: bool, near, far, d_range: float = 3.0):
    """Gaussian band centered on the predicted depth with predicted std."""
    std = depth_std(z_vals, pred_depth, pred_weight)
    std = jnp.nan_to_num(std)
    pred_depth = jnp.nan_to_num(pred_depth)
    return sample_gaussian_3sigma_sym(
        key, pred_depth, pred_depth - d_range * std, pred_depth + d_range * std,
        n, det, near, far, d_range=d_range)


def guided_samples(key, pred_depth, pred_weight, z_vals, n: int, near, far,
                   train: bool = False, valid_depth=None, target_depth=None,
                   target_std=None, d_range: float = 3.0, perturb: float = 1.0):
    """Guided z-samples; at train time rays with valid GT depth get
    GT-centered Gaussians instead (reference swaps rows by boolean index,
    rendering.py:135-145 — here a where-mask over identically-shaped draws).

    NOTE (behavioral quirk preserved): in the reference's production loader
    the effective target_std is identically 0 (satellite_rgb_dep.py:407-408,539),
    which collapses GT-guided samples onto the exact MicMac depth.  The math
    below reproduces that limit exactly when target_std == 0.
    """
    det = perturb == 0.0
    k1, k2 = jax.random.split(key)
    z2 = samples_around_depth(k1, pred_depth, pred_weight, z_vals, n, det,
                              near, far, d_range=d_range)
    if train and valid_depth is not None:
        lo = target_depth - d_range * target_std
        hi = target_depth + d_range * target_std
        gt = sample_gaussian_3sigma_sym(k2, target_depth, lo, hi, n, det,
                                        near, far, d_range=d_range)
        mask = (valid_depth > 0)[:, None]
        z2 = jnp.where(mask, gt, z2)
    return z2
