"""Throughput benchmark: flagship spsbrdf-nerf train step, rays/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (SURVEY.md 6; it only has
Lightning profiler="simple").  BASELINE.md records the canonical workload —
batch 1024 rays, 64 stratified + 64 guided samples/ray, 8x512 siren MLP with
RPV BRDF and analytic density-gradient normals — and the driver's north star
of >= 5x a reference GPU.  `REFERENCE_RAYS_PER_SEC` below is the documented
proxy for the reference GPU (torch 1.7 single-V100-class, host-side
chunking): ~3-4 train steps/sec at batch 1024 on this workload, i.e. ~4000
rays/s.  vs_baseline = ours / that proxy; replace the constant when a real
reference measurement exists.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

REFERENCE_RAYS_PER_SEC = 4000.0   # documented proxy, see module docstring

BATCH = 1024          # opt.py:158
N_SAMPLES = 64        # opt.py:176
GUIDED = 64           # opt.py:217
WARMUP = 3
ITERS = 20


def main():
    from __graft_entry__ import _flagship_configs, _make_batch
    from brdfnerf_tpu.parallel.train_step import (
        create_train_state, make_train_step, TrainGates)

    mcfg, rcfg, tcfg = _flagship_configs(n_samples=N_SAMPLES, guided=GUIDED)
    key = jax.random.PRNGKey(0)
    state, opt = create_train_state(key, mcfg, tcfg, steps_per_epoch=10000)
    step_fn = make_train_step(mcfg, rcfg, tcfg, opt, mesh=None)

    batch = {k: jnp.asarray(v)
             for k, v in _make_batch(BATCH, np.random.RandomState(0)).items()}
    gates = TrainGates(
        cos_irra_on=jnp.asarray(False), ds_on=jnp.asarray(True),
        nrrg_on=jnp.asarray(True), beta_warmup=jnp.asarray(False),
        hs_on=jnp.asarray(True))

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)
    for i in range(WARMUP):
        state, metrics = step_fn(state, batch, keys[i], gates)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step_fn(state, batch, keys[WARMUP + i], gates)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
