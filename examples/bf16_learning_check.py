"""90-step bf16 learning check of the flagship fused step on real TPU.

The interpret-mode parity tests pin the kernel math in f32; this drives
the PRODUCTION bfloat16_all program (fused trunk+heads kernels) for 3
scan dispatches of 30 full optimizer steps on a fixed batch and prints
the loss trajectory — the cheap end-to-end "the fast path actually
learns" certification used since round 2 (BASELINE.md).

Run on the TPU rig: python examples/bf16_learning_check.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/brdfnerf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from functools import partial
    import optax
    from __graft_entry__ import _flagship_configs, _make_batch
    from brdfnerf_tpu.parallel.train_step import (
        create_train_state, TrainGates, compute_losses)

    mcfg, rcfg, tcfg = _flagship_configs(n_samples=64, guided=64)
    state, opt = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg,
                                    steps_per_epoch=10000)
    batch = {k: jnp.asarray(v)
             for k, v in _make_batch(1024, np.random.RandomState(0)).items()}
    gates = TrainGates(
        cos_irra_on=jnp.asarray(False), ds_on=jnp.asarray(True),
        nrrg_on=jnp.asarray(True), beta_warmup=jnp.asarray(False),
        hs_on=jnp.asarray(True))

    @partial(jax.jit, donate_argnums=(0,))
    def scan_steps(carry, keys):
        def one(carry, k):
            params, opt_state = carry
            (loss, _), grads = jax.value_and_grad(
                lambda p: compute_losses(p, mcfg, rcfg, tcfg, batch, k,
                                         gates), has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        return jax.lax.scan(one, carry, keys)

    carry = (state.params, state.opt_state)
    all_losses = []
    t0 = time.time()
    for i in range(3):
        keys = jax.random.split(jax.random.PRNGKey(10 + i), 30)
        carry, losses = scan_steps(carry, keys)
        all_losses.extend(np.asarray(losses).tolist())
    tr = all_losses
    print(f"90 bf16 steps in {time.time()-t0:.0f}s: loss "
          f"{tr[0]:.3f} -> {tr[29]:.3f} -> {tr[59]:.3f} -> {tr[-1]:.3f}")
    assert np.isfinite(tr).all(), "non-finite loss in bf16 trajectory"
    assert tr[-1] < 0.3 * tr[0], (tr[0], tr[-1])
    print("PASS: production bf16 fused path learns")


if __name__ == "__main__":
    main()
