"""Capture a jax.profiler device trace of the flagship train step and
aggregate per-op durations.

Runs the SAME scan program as bench.py (30 steps / dispatch), traces one
timed dispatch, then parses the trace-event JSON that the profiler writes
(plugins/profile/<run>/<host>.trace.json.gz) and prints the top ops by
total device time, grouped by a coarse category (trunk kernels, head
matmuls, sigma passes, sampling, compositing/elementwise, optimizer).

Usage: python examples/profile_step.py [outdir]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/brdfnerf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scan(batch_size=1024, n_samples=64, guided=64, scan_steps=30):
    from functools import partial
    import dataclasses as dc
    import optax
    from __graft_entry__ import _flagship_configs, _make_batch
    from brdfnerf_tpu.parallel.train_step import (
        create_train_state, TrainGates, compute_losses)

    mcfg, rcfg, tcfg = _flagship_configs(n_samples=n_samples, guided=guided)
    key = jax.random.PRNGKey(0)
    state, opt = create_train_state(key, mcfg, tcfg, steps_per_epoch=10000)
    batch = {k: jnp.asarray(v)
             for k, v in _make_batch(batch_size,
                                     np.random.RandomState(0)).items()}
    gates = TrainGates(
        cos_irra_on=jnp.asarray(False), ds_on=jnp.asarray(True),
        nrrg_on=jnp.asarray(True), beta_warmup=jnp.asarray(False),
        hs_on=jnp.asarray(True))

    @partial(jax.jit, donate_argnums=(0,))
    def scan_steps_fn(carry, keys):
        def one(carry, k):
            params, opt_state = carry
            (loss, _), grads = jax.value_and_grad(
                lambda p: compute_losses(p, mcfg, rcfg, tcfg, batch, k,
                                         gates), has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        return jax.lax.scan(one, carry, keys)

    return scan_steps_fn, (state.params, state.opt_state), scan_steps


CATEGORIES = (
    ("trunk_vjp_bwd", ("trunk_bwd", "trunk_grad_bwd", "vjp_bwd")),
    ("trunk_vjp_fwd", ("trunk_fwd_res", "trunk_grad_fwd", "vjp_fwd",
                       "trunk_with_grad")),
    ("fused_sigma", ("fused_sigma", "sigma_kernel", "mlp_kernel")),
    ("matmul", ("dot", "convolution", "fusion.*dot")),
    ("sort", ("sort",)),
    ("scan_overhead", ("while", "dynamic-update-slice", "dynamic-slice")),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in CATEGORIES:
        for k in keys:
            if k in low:
                return cat
    if "fusion" in low:
        return "fusion(elementwise)"
    if "copy" in low or "bitcast" in low or "transpose" in low:
        return "copy/layout"
    if "custom-call" in low or "custom_call" in low:
        return "custom-call(pallas)"
    return "other"


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/brdfnerf_profile"
    scan_fn, carry, scan_steps = build_scan()
    keys = jax.random.split(jax.random.PRNGKey(1), scan_steps)
    carry, losses = scan_fn(carry, keys)
    _ = np.asarray(losses)                     # compile + warm

    keys = jax.random.split(jax.random.PRNGKey(2), scan_steps)
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        carry, losses = scan_fn(carry, keys)
        _ = np.asarray(losses)
    wall = time.perf_counter() - t0
    print(f"traced dispatch: {wall * 1e3 / scan_steps:.2f} ms/step "
          f"({scan_steps} steps)")

    traces = sorted(glob.glob(
        os.path.join(outdir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    assert traces, f"no trace under {outdir}"
    with gzip.open(traces[-1], "rt") as f:
        events = json.load(f)["traceEvents"]

    # keep only device-lane complete events (TensorCore op timeline)
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}
    by_op = collections.Counter()
    by_cat = collections.Counter()
    n_ev = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e["dur"]  # microseconds
        by_op[name] += dur
        by_cat[categorize(name)] += dur
        n_ev += 1

    total = sum(by_cat.values())
    print(f"\n{n_ev} device events, {total / 1e3:.1f} ms total device time "
          f"({total / 1e3 / scan_steps:.2f} ms/step)")
    print("\n== by category (ms/step) ==")
    for cat, dur in by_cat.most_common():
        print(f"  {cat:26s} {dur / 1e3 / scan_steps:8.3f}  "
              f"({100 * dur / total:5.1f}%)")
    print("\n== top 40 ops (ms/step) ==")
    for name, dur in by_op.most_common(40):
        print(f"  {dur / 1e3 / scan_steps:8.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
