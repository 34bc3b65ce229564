"""Where does tensor parallelism start to pay? — compiled per-device
memory of the train step, DP (8x replicated) vs TP (2 data x 4 model),
across trunk scales.

Method: AOT-lower + compile the SAME jitted train step (make_train_step)
against shape-only abstract inputs on an 8-virtual-device CPU mesh — no
buffers materialize — and read XLA's executable memory analysis
(argument/output/temp/generated-code bytes per device).  Argument bytes
are dominated by the replicated-vs-sharded TrainState (params + Adam
mu/nu); temp bytes by activations of the per-device batch.  The analysis
is layout-level, so the CPU numbers transfer to TPU modulo padding.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/tp_memory_analysis.py

Writes examples/results/tp_memory.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon sitecustomize force-registers the TPU-tunnel backend at
# interpreter startup; this helper overrides it back to 8 virtual CPU
# devices whatever state the backend is in
from __graft_entry__ import _force_virtual_cpu_mesh

_force_virtual_cpu_mesh(8)

from brdfnerf_tpu.config import ModelConfig, RenderConfig, TrainConfig
from brdfnerf_tpu.parallel.mesh import make_mesh
from brdfnerf_tpu.parallel.tensor import tp_mesh, state_shardings
from brdfnerf_tpu.parallel.train_step import (create_train_state,
                                              make_train_step, TrainGates)

BATCH = 1024          # global batch (the flagship's) for both layouts
N_SAMPLES = 32


def _abstract_batch(n):
    f32 = jnp.float32
    return {
        "rays": jax.ShapeDtypeStruct((n, 11), f32),
        "rgbs": jax.ShapeDtypeStruct((n, 3), f32),
        "ts": jax.ShapeDtypeStruct((n,), jnp.int32),
        "depths": jax.ShapeDtypeStruct((n, 2), f32),
        "valid_depth": jax.ShapeDtypeStruct((n,), jnp.int32),
        "depth_std": jax.ShapeDtypeStruct((n,), f32),
    }


def _gates_abstract():
    b = jax.ShapeDtypeStruct((), jnp.bool_)
    return TrainGates(cos_irra_on=b, ds_on=b, nrrg_on=b, beta_warmup=b,
                      hs_on=b)


def analyze(layers: int, feat: int, batch: int = None):
    batch = BATCH if batch is None else batch
    mcfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                       layers=layers, feat=feat, skips=(4,),
                       normal="none", compute_dtype="bfloat16_all")
    rcfg = RenderConfig(n_samples=N_SAMPLES, guided_samples=0,
                        apply_brdf=False, fused_trunk=False,
                        use_pallas=False)
    tcfg = TrainConfig(lr=5e-4, batch_size=batch, ds_lambda=10.0)

    # abstract state: evaluate the shape tree without materializing 50M+
    # parameter buffers
    state_shape = jax.eval_shape(
        lambda k: create_train_state(k, mcfg, tcfg, 100)[0],
        jax.random.PRNGKey(0))
    _, opt = create_train_state(jax.random.PRNGKey(0),
                                ModelConfig(variant="spsbrdf-nerf",
                                            siren=True, layers=2, feat=8,
                                            skips=(1,)), tcfg, 100)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    abstract_batch = _abstract_batch(batch)

    out = {}
    for name, mesh, shs in (
            ("dp8", make_mesh(8), None),
            ("tp2x4", tp_mesh(2, 4), None)):
        if name.startswith("tp"):
            shs = state_shardings(mesh, state_shape, skips=mcfg.skips)
        step = make_train_step(mcfg, rcfg, tcfg, opt, mesh=mesh,
                               donate=False, state_shardings=shs)
        compiled = step.lower(state_shape, abstract_batch, key,
                              _gates_abstract()).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            out[name] = None
            continue
        out[name] = {
            "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            "peak_args_plus_temp_mb": round(
                (ma.argument_size_in_bytes + ma.temp_size_in_bytes)
                / 2**20, 1),
        }
    n_params = sum(int(np.prod(s.shape)) for s in
                   jax.tree_util.tree_leaves(state_shape.params))
    return {"layers": layers, "feat": feat,
            "trunk_params_m": round(n_params / 1e6, 1), **out}


def main():
    # two views per trunk scale:
    #  * fixed GLOBAL batch (1024): TP trades state (/model width) for
    #    activations (x data-width shrink) — per-device batch is global /
    #    data-axis, so tp2x4 holds 4x the activations of dp8
    #  * fixed PER-DEVICE batch (tp2x4_eqdev, global 256): the scaled-
    #    global-batch deployment pairing — state still /4, activations
    #    equal to dp8's
    rows = []
    for layers, feat in ((8, 512),       # the reference trunk
                         (12, 2048),     # the scaled trunk of the TP test
                         (16, 4096)):    # where DP replication hurts
        r = analyze(layers, feat)
        r["tp2x4_eqdev"] = analyze(layers, feat, batch=BATCH // 4)["tp2x4"]
        rows.append(r)
    print(f"{'trunk':>12} {'params':>8} | {'DP8 arg':>9} {'DP8 tmp':>9} "
          f"| {'TP2x4 arg':>9} {'TP2x4 tmp':>9} | {'eqdev tmp':>9}")
    for r in rows:
        dp, tp, eq = r["dp8"], r["tp2x4"], r["tp2x4_eqdev"]
        if dp is None or tp is None:
            print(f"{r['layers']}x{r['feat']:>6}: memory analysis "
                  f"unavailable on this backend")
            continue
        print(f"{r['layers']}x{r['feat']:>9} {r['trunk_params_m']:>7}M | "
              f"{dp['argument_mb']:>8.1f}M {dp['temp_mb']:>8.1f}M | "
              f"{tp['argument_mb']:>8.1f}M {tp['temp_mb']:>8.1f}M | "
              f"{eq['temp_mb']:>8.1f}M")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "tp_memory.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"batch": BATCH, "n_samples": N_SAMPLES, "rows": rows},
                  f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
