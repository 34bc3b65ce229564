"""Positional (Fourier-feature) encoding.

Matches the reference's `Mapping` (reference: models/nerf.py:36-70), whose
peculiarity is that the **identity term is excluded** from the output
(`out = []` not `[x]`, nerf.py:63-64), so the encoded width is exactly
``2 * n_freqs * in_ch``.  Frequency bands are 2**k for k in [0, n_freqs)
(logscale, nerf.py:48-49); per frequency the order is [sin, cos], each over
all input channels, concatenated along the last axis (nerf.py:65-68).
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """Encode x (..., C) -> (..., 2*n_freqs*C), identity term excluded.

    Layout per the reference loop order: for each freq f in (1,2,4,...):
    [sin(f*x), cos(f*x)], each a C-wide block.
    """
    if n_freqs == 0:
        return x
    freqs = jnp.asarray([2.0 ** k for k in range(n_freqs)], dtype=x.dtype)
    # (..., F, C)
    xb = x[..., None, :] * freqs[:, None]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # (..., F, 2C)
    return enc.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
