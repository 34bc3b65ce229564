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
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/brdfnerf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def measure(mcfg, rcfg, params, rays_mat, ts_mat, fetch=("rgb_coarse",
                                                         "depth_coarse")):
    from brdfnerf_tpu.parallel.train_step import make_scan_render_step
    fn = make_scan_render_step(mcfg, rcfg, tuple(fetch), {})
    key = jax.random.PRNGKey(0)
    outs = fn(params, rays_mat, ts_mat, jnp.asarray(False), key)
    fetched = {k: np.asarray(outs[k]) for k in fetch}   # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = fn(params, rays_mat, ts_mat, jnp.asarray(False), key)
        fetched = {k: np.asarray(outs[k]) for k in fetch}
        times.append(time.perf_counter() - t0)
    n_rays = rays_mat.shape[0] * rays_mat.shape[1]
    return n_rays / min(times), fetched


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--guided", type=int, default=64)
    a = ap.parse_args(argv)

    from __graft_entry__ import _flagship_configs, _make_batch
    from brdfnerf_tpu.parallel.train_step import create_train_state

    mcfg, rcfg, _tcfg = _flagship_configs(n_samples=a.n_samples,
                                          guided=a.guided)
    state, _ = create_train_state(jax.random.PRNGKey(0), mcfg,
                                  _tcfg, steps_per_epoch=10000)
    params = state.params

    n = a.chunks * a.chunk
    batch = _make_batch(n, np.random.RandomState(3))
    rays_mat = jnp.asarray(np.asarray(batch["rays"], np.float32)
                           .reshape(a.chunks, a.chunk, -1))
    ts_mat = jnp.zeros((a.chunks, a.chunk), jnp.int32)

    variants = {
        "bf16": (mcfg, rcfg),
        "bf16+surf": (mcfg, dc.replace(rcfg, normal_at_surface=True)),
        "int8": (dc.replace(mcfg, compute_dtype="int8"), rcfg),
        "int8+surf": (dc.replace(mcfg, compute_dtype="int8"),
                      dc.replace(rcfg, normal_at_surface=True)),
    }
    results, outs = {}, {}
    for name, (m, r) in variants.items():
        rate, fetched = measure(m, r, params, rays_mat, ts_mat)
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
    out = os.path.join(os.path.dirname(__file__), "results",
                       "int8_serving.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"written: {out}")
    return results


if __name__ == "__main__":
    main()
