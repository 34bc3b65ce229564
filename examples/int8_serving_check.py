"""int8 serving A/B: throughput + accuracy of the int8 MXU trunk against
the bfloat16_all production path on the flagship spsbrdf-nerf render.

Measures the same one-dispatch scan render as bench.py's serve number
(32 chunks x 16384 rays, rgb+depth fully fetched) for four variants:

  bf16            - production serving path (fused Pallas kernels)
  bf16+surf       - + RenderConfig.normal_at_surface (one normal per ray)
  int8            - int8 trunk for the stop-grad sigma passes; the full
                    pass falls back to the bf16 twin (per-sample analytic
                    normals differentiate the trunk)
  int8+surf       - int8 trunk for ALL per-sample forwards; one bf16
                    gradient per ray at the expected surface

and reports rays/s plus rgb/depth deviation vs the bf16 baseline.

    python examples/int8_serving_check.py [--chunks 32] [--chunk 16384]

No reference analog (the reference serves f32 torch, eval.py:56-76);
results recorded in BASELINE.md "Serving precision" notes.
"""

import argparse
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/brdfnerf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--guided", type=int, default=64)
    a = ap.parse_args(argv)

    from __graft_entry__ import _flagship_configs
    # the ONE blessed serving methodology lives in bench.measure_serve —
    # reused here so the two artifacts can never methodologically drift
    from bench import measure_serve
    from brdfnerf_tpu.parallel.train_step import create_train_state

    mcfg, rcfg, _tcfg = _flagship_configs(n_samples=a.n_samples,
                                          guided=a.guided)
    state, _ = create_train_state(jax.random.PRNGKey(0), mcfg,
                                  _tcfg, steps_per_epoch=10000)
    params = state.params

    variants = {
        "bf16": (mcfg, rcfg),
        "bf16+surf": (mcfg, dc.replace(rcfg, normal_at_surface=True)),
        "int8": (dc.replace(mcfg, compute_dtype="int8"), rcfg),
        "int8+surf": (dc.replace(mcfg, compute_dtype="int8"),
                      dc.replace(rcfg, normal_at_surface=True)),
    }
    results, outs = {}, {}
    for name, (m, r) in variants.items():
        rate, fetched = measure_serve(m, r, params,
                                      n_chunks=a.chunks, chunk=a.chunk)
        results[name] = {"rays_per_sec": round(rate, 1)}
        outs[name] = fetched
        print(f"{name:10s}: {rate:,.0f} rays/s", flush=True)

    base = outs["bf16"]
    for name, f in outs.items():
        if name in ("bf16", "bf16+surf"):   # each is its own reference
            continue
        ref = (outs["bf16+surf"] if name.endswith("+surf") else base)
        d_rgb = np.abs(f["rgb_coarse"].astype(np.float64)
                       - ref["rgb_coarse"].astype(np.float64))
        d_dep = np.abs(f["depth_coarse"].astype(np.float64)
                       - ref["depth_coarse"].astype(np.float64))
        results[name].update(
            rgb_mean_abs_dev=float(d_rgb.mean()),
            rgb_p99_abs_dev=float(np.quantile(d_rgb, 0.99)),
            depth_mean_abs_dev=float(d_dep.mean()))
    # +surf vs baseline semantics shift (not an error): record it too
    d_surf = np.abs(outs["bf16+surf"]["rgb_coarse"].astype(np.float64)
                    - base["rgb_coarse"].astype(np.float64))
    results["bf16+surf"]["rgb_mean_abs_dev_vs_bf16"] = float(d_surf.mean())

    print(json.dumps(results, indent=2))
    # overwrite the committed v5e artifact ONLY for a real flagship-scale
    # TPU run — a CPU smoke at toy sizes must not clobber the numbers
    # BASELINE.md and results/README.md cite
    flagship = (a.chunks, a.chunk, a.n_samples, a.guided) \
        == (32, 16384, 64, 64)
    on_tpu = jax.devices()[0].platform != "cpu"
    if flagship and on_tpu:
        out = os.path.join(os.path.dirname(__file__), "results",
                           "int8_serving.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"written: {out}")
    else:
        print("non-flagship shapes or CPU backend: recorded artifact "
              "left untouched")
    return results


if __name__ == "__main__":
    main()
