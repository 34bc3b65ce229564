"""Persistent XLA compilation cache for the CLIs.

The flagship train step takes minutes to compile on a fresh process
(remote-compile TPU rigs are worst; even local TPU/CPU compiles of the
8x512 fused-kernel programs are tens of seconds).  The reference has no
analog — torch eager pays no compile — so this is a TPU-native workflow
concern: every CLI entry point enables a persistent on-disk cache so any
given program shape compiles once per machine, not once per process.

Env contract:
  BRDFNERF_COMPILE_CACHE=<dir>  override the cache location
  BRDFNERF_COMPILE_CACHE=0      disable
  JAX_COMPILATION_CACHE_DIR     (native JAX var) also respected; if the
                                user set it, we leave their value alone.
"""

from __future__ import annotations

import os

_DEFAULT = "/tmp/brdfnerf_jax_cache"


def enable_persistent_cache() -> None:
    """Idempotent; call before the first jit compilation."""
    ours = os.environ.get("BRDFNERF_COMPILE_CACHE")
    if ours == "0":
        return
    import jax
    if os.environ.get("JAX_COMPILATION_CACHE_DIR") and not ours:
        # user already configured JAX's own knob; don't fight it
        return
    jax.config.update("jax_compilation_cache_dir", ours or _DEFAULT)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
