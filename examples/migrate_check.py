"""Prove checkpoint migration on a REAL trained model.

Given a training run directory (opts.json) and one of its native
`epoch={n}.npz` checkpoints, this script:

1. exports the checkpoint to the reference's Lightning format via the
   convert_ckpt CLI (`utils/torch_export`),
2. strict-loads the result into the ACTUAL reference `SpSBRDFNeRF`
   module (`/root/reference/models/spsbrdfnerf.py`) at the trained
   shape, and
3. compares the full forward — sigma, rgb, analytic normals, RPV heads
   — on identical points against our network with the same weights
   (exact sin, f32, so the two frameworks are bit-comparable).

Run on the full-scale run's stage-2 output (BASELINE.md):

    python examples/migrate_check.py \
        /tmp/brdfnerf_fullscale/logs/stage2-80k \
        /tmp/brdfnerf_fullscale/ckpts/stage2-80k/epoch=15.npz

Measured there: strict load_state_dict OK (36 tensors), max forward
diff 1.2e-5 across all heads — a model trained HERE runs unchanged in
the reference, and vice versa (tests/test_torch_import.py covers the
import direction with golden tests).

Requires torch (CPU) and the reference repo mounted at /root/reference;
exits 0 on PASS, raises on any mismatch.
"""
import dataclasses as dc
import importlib
import os
import sys
import tempfile
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"


def main(run_dir: str, npz_path: str) -> None:
    from conftest import stub_reference_deps
    import jax
    import jax.numpy as jnp
    from brdfnerf_tpu.cli import opts as opts_mod
    from brdfnerf_tpu.cli.convert_ckpt import main as conv
    from brdfnerf_tpu.models.network import (init_network,
                                             apply_network_with_normals)
    from brdfnerf_tpu.utils import checkpoint as ckpt_mod

    args = opts_mod.load_opts(run_dir)
    run_cfg = opts_mod.to_run_config(args)
    # exact numerics for bit-comparable torch/jax forward
    mcfg = dc.replace(run_cfg.model, fast_sin=False,
                      compute_dtype="float32")
    print(f"model: {mcfg.layers}x{mcfg.feat} skips={mcfg.skips} "
          f"funcMFH={int(mcfg.func_m)}{int(mcfg.func_f)}{mcfg.func_h}")

    out_ckpt = os.path.join(tempfile.mkdtemp(prefix="migrate_"),
                            "exported.ckpt")
    assert conv(["--input", npz_path, "--output", out_ckpt]) == 0

    template = {"coarse": init_network(jax.random.PRNGKey(0), mcfg)}
    params = ckpt_mod.restore_params(template, npz_path)["coarse"]

    stub_reference_deps()
    sys.path.insert(0, REF)
    import torch as t

    spsb = importlib.import_module("models.spsbrdfnerf")
    ref_args = types.SimpleNamespace(
        input_viewdir=False, funcM=bool(mcfg.func_m),
        funcF=bool(mcfg.func_f), funcH=mcfg.func_h,
        b=False, c=False, theta=False)
    model = spsb.SpSBRDFNeRF(
        ref_args, layers=mcfg.layers, feat=mcfg.feat, mapping=True,
        mapping_sizes=[10, 4], skips=list(mcfg.skips), siren=True,
        beta=False, roughness=False, normal="analystic", sun_v="none",
        indirect_light=False, dim_RPV=mcfg.dim_rpv)
    d = t.load(out_ckpt, map_location="cpu", weights_only=True)
    stripped = {k[len("nerf_coarse."):]: v
                for k, v in d["state_dict"].items()}
    model.load_state_dict(stripped, strict=True)
    model.eval()
    print(f"strict load_state_dict OK ({len(stripped)} tensors, "
          f"global_step {int(d['global_step'])})")

    xyz = np.random.RandomState(7).uniform(
        -1, 1, (256, 3)).astype(np.float32)
    ours = apply_network_with_normals(params, mcfg, jnp.asarray(xyz),
                                      apply_brdf=True)
    xt = t.from_numpy(xyz)
    xt.requires_grad_(True)
    out = model(xt, sigma_only=False, apply_brdf=True,
                nr_an_on=True).detach().numpy()
    # reference layout: rgb(3) sigma(1) normal_an(3) k(3) theta(3) rhoc(3)
    checks = [("rgb", ours["rgb"], out[:, 0:3], 2e-5),
              ("sigma", ours["sigma"], out[:, 3], 2e-4),
              ("normal_an", ours["normal_an"], out[:, 4:7], 1e-3),
              ("rpv_k", ours["rpv_k"], out[:, 7:10], 2e-5),
              ("rpv_theta", ours["rpv_theta"], out[:, 10:13], 5e-5),
              ("rpv_rhoc", ours["rpv_rhoc"], out[:, 13:16], 2e-5)]
    for name, a, b, atol in checks:
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4, atol=atol,
                                   err_msg=name)
        print(f"  {name}: max|d|="
              f"{np.max(np.abs(np.asarray(a) - b)):.2e} PASS")
    print("REAL-TRAINED-CHECKPOINT MIGRATION: PASS")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
