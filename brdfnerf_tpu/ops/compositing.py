"""Volume-rendering compositing (alpha / transmittance / weights / depth).

Matches the reference's `cal_weight` (models/spsbrdfnerf.py:50-69) and the
classic-NeRF compositing block (models/nerf.py:117-133): the last delta is
1e10, alpha = 1 - exp(-delta * relu(sigma + noise)), T is the shifted
cumulative product of (1 - alpha + 1e-10), weights = alpha * T.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def composite(z_vals: jnp.ndarray, sigmas: jnp.ndarray,
              noise_std: float = 0.0, key: Optional[jax.Array] = None):
    """Alpha-composite densities along rays.

    z_vals, sigmas: (N_rays, N_samples).
    Returns (alphas, transparency, weights, depth) all (N_rays, [N_samples]).
    """
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = jnp.full_like(deltas[:, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)

    if noise_std > 0.0 and key is not None:
        sigmas = sigmas + noise_std * jax.random.normal(key, sigmas.shape,
                                                        dtype=sigmas.dtype)
    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1)
    transparency = jnp.cumprod(shifted, axis=-1)[:, :-1]
    weights = alphas * transparency
    depth = jnp.sum(weights * z_vals, axis=-1)
    return alphas, transparency, weights, depth


def depth_var(z_vals, depth, weights):
    """Weighted depth variance (train_utils.py:38-39)."""
    return jnp.sum((z_vals - depth[..., None]) ** 2 * weights, axis=-1)


def depth_std(z_vals, depth, weights):
    """Weighted depth std (train_utils.py:35-36)."""
    return jnp.sqrt(depth_var(z_vals, depth, weights))


def l2_normalize(x, eps: float = 1.1920929e-07):
    """Unit-normalize along the last axis (train_utils.py:28-33; eps matches
    torch.finfo(float32).eps used there as the floor on the squared norm)."""
    norm = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(norm, eps))
