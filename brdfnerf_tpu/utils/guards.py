"""Numerics guards: the reference's NaN/validity sanitizer inventory
(train_utils.check_nan:61-78, check_badnr:49-59, check_vec0:14-26,
spsbrdfnerf.checknan:32-48, assert-no-nan sprinkles) as a zero-cost-when-off
debug layer.

The trig-heavy BRDFs genuinely produce NaNs near grazing angles; the
reference detects, reports, and value-replaces them at ~20 call sites.
Here the replacement (nan_to_num with the same fill conventions) lives in
the BRDF code itself, and *detection* is this module: enable with
BRDFNERF_DEBUG_NUMERICS=1 (or guards.enable()) and every guarded tensor
reports NaN/Inf counts from inside the jitted program via
jax.debug.callback; checkify_wrap() turns a jitted function into one that
returns hard errors for NaN production sites (for tests)."""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

_ENABLED = bool(int(os.environ.get("BRDFNERF_DEBUG_NUMERICS", "0")))


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


def _report(name: str, n_nan, n_inf, n_total):
    if n_nan or n_inf:
        print(f"[numerics] {name}: {int(n_nan)} NaN, {int(n_inf)} Inf "
              f"of {int(n_total)}")


def guard(x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Identity; when debug is on, reports NaN/Inf counts at runtime."""
    if not _ENABLED:
        return x
    n_nan = jnp.sum(jnp.isnan(x))
    n_inf = jnp.sum(jnp.isinf(x))
    jax.debug.callback(partial(_report, name), n_nan, n_inf, x.size,
                       ordered=False)
    return x


def guard_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Guard every array in a result dict (spsbrdfnerf.checknan analog)."""
    if not _ENABLED:
        return tree
    return {k: guard(v, f"{prefix}{k}") if isinstance(v, jnp.ndarray) else v
            for k, v in tree.items()}


def replace_nan(x: jnp.ndarray, value: float = 0.0,
                name: str = "") -> jnp.ndarray:
    """check_nan semantics: report (when debug) then value-replace."""
    if _ENABLED and name:
        guard(x, name)
    return jnp.nan_to_num(x, nan=value)


def safe_pow(base: jnp.ndarray, exp: jnp.ndarray,
             eps: float = 1e-8) -> jnp.ndarray:
    """check_badnr analog: clamp the base away from <= 0 before a
    fractional power (negative-base pow is the reference's top NaN source,
    train_utils.py:49-59)."""
    return jnp.power(jnp.maximum(base, eps), exp)


def unit_fraction(v: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """check_vec0 analog: fraction of rows whose norm deviates from 1."""
    n = jnp.linalg.norm(v, axis=-1)
    return jnp.mean((jnp.abs(n - 1.0) > eps).astype(jnp.float32))


def checkify_wrap(fn: Callable, *static_argnums) -> Callable:
    """Wrap a function with jax.experimental.checkify for NaN checks;
    returns (err, out) — for tests that want hard failures on NaN
    production instead of downstream value-replacement."""
    from jax.experimental import checkify
    checked = checkify.checkify(fn, errors=checkify.nan_checks)
    return checked
