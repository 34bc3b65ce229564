"""Peak-HBM measurement of the one-hot inverse-CDF at serving chunk sizes.

sample_pdf's gather-free lookups materialize two (N, U, B+1) one-hot
operands for the dot_general reductions (ops/sampling.py:82-88) plus the
(N, U, B+1) broadcast compare for searchsorted — at the serving chunk
(5120 rays) and production sample counts this transient dominates the
op's footprint.  This script measures the device peak-memory delta of a
jitted sample_pdf at the shapes the render paths actually use and prints
one JSON blob; results documented in BASELINE.md next to the auto-split
bound (BRDFNERF_SAMPLE_PDF_MAX_ELEMS).

Run on the real TPU: python examples/sample_pdf_memory.py
(CPU backends report no memory_stats; the script then reports the
analytic bound only.)
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from brdfnerf_tpu.ops.sampling import sample_pdf, _MAX_LOOKUP_ELEMS


def peak_bytes():
    st = jax.local_devices()[0].memory_stats() or {}
    return st.get("peak_bytes_in_use")


def measure(n_rays, n_bins, n_imp):
    """High-water-mark delta of one jitted sample_pdf call at (n_rays,
    n_bins+1 edges, n_imp draws).

    peak_bytes_in_use is monotone per process, so the per-row delta is a
    LOWER bound on the op's transient: rows run smallest-to-largest, and
    each delta records how much this shape raised the process high-water
    mark beyond everything before it (0 = the transient fits inside a
    prior row's peak).  Backends without memory_stats (CPU, some tunnel
    devices) report measured=null and the analytic bound stands alone."""
    key = jax.random.PRNGKey(0)
    bins = jnp.linspace(0.0, 1.0, n_bins + 1)[None, :].repeat(n_rays, 0)
    w = jax.random.uniform(jax.random.PRNGKey(1), (n_rays, n_bins)) + 0.1
    fn = jax.jit(lambda k, b, ww: sample_pdf(k, b, ww, n_imp))
    base = peak_bytes()
    out = fn(key, bins, w)
    jax.block_until_ready(out)
    peak = peak_bytes()
    onehot_elems = n_rays * n_imp * (n_bins + 1)
    analytic = {
        "onehot_elems": onehot_elems,
        # two f32 one-hots + the i32 compare for inds; XLA may fuse or
        # rematerialize some — this is the no-fusion worst case
        "analytic_transient_mb": onehot_elems * (4 + 4 + 4) / 2 ** 20,
    }
    if base is None or peak is None:
        return {"shape": [n_rays, n_imp, n_bins + 1], **analytic,
                "measured": None}
    return {"shape": [n_rays, n_imp, n_bins + 1], **analytic,
            "measured_peak_mb": peak / 2 ** 20,
            "measured_delta_mb": (peak - base) / 2 ** 20}


def main():
    shapes = [
        (1024, 63, 64),      # training: batch 1024, guided 64
        (5120, 63, 64),      # serving chunk, guided 64
        (5120, 127, 128),    # serving chunk, 128 importance/guided draws
        (5120, 127, 256),    # stress: 256 draws
    ]
    rows = [measure(*s) for s in shapes]
    out = {"backend": jax.default_backend(),
           "device": str(jax.local_devices()[0]),
           "rows": rows,
           # the ACTUAL bound sample_pdf runs with (module default or the
           # BRDFNERF_SAMPLE_PDF_MAX_ELEMS override) — a hardcoded copy
           # here once drifted to 4x the shipped default
           "split_bound_elems": int(_MAX_LOOKUP_ELEMS)}
    print(json.dumps(out, indent=2))
    res = os.path.join(REPO, "examples", "results")
    os.makedirs(res, exist_ok=True)
    with open(os.path.join(res, "sample_pdf_memory.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
