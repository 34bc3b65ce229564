"""Positional (Fourier-feature) encoding.

Matches the reference's `Mapping` (reference: models/nerf.py:36-70), whose
peculiarity is that the **identity term is excluded** from the output
(`out = []` not `[x]`, nerf.py:63-64), so the encoded width is exactly
``2 * n_freqs * in_ch``.  Frequency bands are 2**k for k in [0, n_freqs)
(logscale, nerf.py:48-49); per frequency the order is [sin, cos], each over
all input channels, concatenated along the last axis (nerf.py:65-68).

TPU-native formulation: the naive broadcast (..., F, C) intermediates have
a C(=3)-wide minor dimension — every elementwise op on them runs at 3/128
lane efficiency and the final reshape forces a relayout, which measured as
~4x the cost of the whole 8x512 trunk.  Instead the encoding is ONE widening
matmul plus a phase-shifted sine:

    enc = sin(x @ P + phase),  cos(z) = sin(z + pi/2)

where P (C, 2FC) places 2^f at each [sin, cos] slot and phase adds pi/2 on
the cos slots.  All ops run on the (..., 2FC) layout.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _proj_and_phase(n_freqs: int, in_ch: int, pad_to: int = 0):
    """NumPy constants only — caching jnp arrays would leak tracers when
    the first call happens under jit.

    pad_to: minimum output width — extra columns are zero in both P and
    phase, so the padded encoding lanes are exactly sin(0) = 0.  The fused
    trunk kernels consume lane-aligned (128-multiple) inputs; producing
    the encoding at the padded width directly lets the pad ride the
    encoding fusion instead of materializing as a separate ~100 MB pad op
    before each kernel call (profiled at ~0.5 ms/step at flagship shapes).
    """
    width = 2 * n_freqs * in_ch
    p = np.zeros((in_ch, max(width, pad_to)), np.float32)
    phase = np.zeros((max(width, pad_to),), np.float32)
    for f in range(n_freqs):
        base = f * 2 * in_ch
        for c in range(in_ch):
            p[c, base + c] = 2.0 ** f              # sin slot
            p[c, base + in_ch + c] = 2.0 ** f      # cos slot
            phase[base + in_ch + c] = math.pi / 2.0
    return p, phase


def positional_encoding(x: jnp.ndarray, n_freqs: int,
                        fast: bool = False, pad_to: int = 0) -> jnp.ndarray:
    """Encode x (..., C) -> (..., 2*n_freqs*C), identity term excluded.

    Layout per the reference loop order: for each freq f in (1,2,4,...):
    [sin(f*x), cos(f*x)], each a C-wide block.

    fast: use the degree-9 polynomial sine of ops/fast_math (1.7e-5 abs
    error) — the encoding is sine-bound on TPU (the K=3 matmul is tiny),
    and models with ModelConfig.fast_sin pass fast=True so the XLA path
    uses the same polynomial as the fused kernels' in-kernel encoding.

    pad_to: emit at least this output width, extra lanes identically 0
    (see _proj_and_phase) — for feeding the lane-aligned fused kernels
    without a separate pad op.  No effect when n_freqs == 0.
    """
    if n_freqs == 0:
        return x
    p, phase = _proj_and_phase(n_freqs, x.shape[-1], pad_to)
    # precision='highest': the widening matmul must NOT round x to bf16
    # (TPU default matmul precision) — a 2e-3 coordinate rounding becomes
    # a ~1 rad phase error at the 2^9 band, staircasing the
    # high-frequency features at the bf16 grid.  The reference's
    # per-band 2^f * x scaling is exact in f32 (power-of-two products).
    m = jax.lax.dot_general(
        x, jnp.asarray(p, x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST) + jnp.asarray(phase, x.dtype)
    if fast:
        from .fast_math import fast_sin
        return fast_sin(m)
    return jnp.sin(m)
