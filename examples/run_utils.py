"""Shared helpers for the example run harnesses (convergence_runs /
full_scale_run): invoke the real training CLI into a clean workdir and
harvest the PSNR / DSM-MAE convergence curve from its scalars.jsonl."""

import json
import os
import shutil
import time


def force_requested_platform(min_devices: int = 0):
    """Honor a shell-level ``JAX_PLATFORMS=cpu`` request under the axon
    site hook.

    The axon sitecustomize registers the TPU-tunnel backend at interpreter
    startup and programmatically sets ``jax_platforms='axon,cpu'``, which
    overrides the JAX_PLATFORMS env var (tests/conftest.py documents the
    same fight).  Without this, ``JAX_PLATFORMS=cpu python examples/...``
    silently runs on the single real TPU chip — a 1-device "8-device mesh"
    that produces wrong-scale ablation numbers.  Call before any jax
    computation; re-applies the env request at the config level and, for a
    cpu request, defaults the virtual host device count to max(8,
    min_devices) so mesh examples get their devices without extra flags.
    """
    req = os.environ.get("JAX_PLATFORMS", "").strip()
    if not req:
        return
    if "cpu" in req.split(","):
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            n = max(8, min_devices)
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
    import jax
    if jax.config.jax_platforms != req:
        jax.config.update("jax_platforms", req)


def harvest_curve(run_dir: str):
    """Parse scalars.jsonl into [{step, psnr, mae}] — mean over the val
    images' `val/psnr_<i>` / `val/mae_<i>` scalars ('all'/'nr' variants
    excluded)."""
    curve = []
    with open(os.path.join(run_dir, "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            psnrs = [v for k, v in rec.items()
                     if k.startswith("val/psnr_") and "all" not in k]
            maes = [v for k, v in rec.items() if k.startswith("val/mae_")
                    and "nr" not in k]
            if psnrs:
                curve.append({"step": rec["step"],
                              "psnr": round(sum(psnrs) / len(psnrs), 2),
                              "mae": (round(sum(maes) / len(maes), 3)
                                      if maes else None)})
    return curve


def run_config(name, argv, logs, ckpts):
    """Train through the CLI into fresh logs/ckpts dirs (scalars.jsonl
    appends and stage-2 harvests the max epoch=N.npz, so a rerun must not
    merge two runs' artifacts).  Returns {"curve": [...], "wall_s": s}."""
    from brdfnerf_tpu.cli.train import main as train_main
    print(f"==== {name} ====", flush=True)
    shutil.rmtree(os.path.join(logs, name), ignore_errors=True)
    shutil.rmtree(os.path.join(ckpts, name), ignore_errors=True)
    t0 = time.time()
    rc = train_main(argv)
    wall = time.time() - t0
    assert rc == 0, name
    return {"curve": harvest_curve(os.path.join(logs, name)),
            "wall_s": round(wall, 1)}


def last_epoch_ckpt(ckpt_dir: str) -> str:
    """Path of the highest epoch=N.npz in a checkpoint dir (the stage-2
    handoff input)."""
    last = max(int(f[len("epoch="):-len(".npz")])
               for f in os.listdir(ckpt_dir)
               if f.startswith("epoch=") and ".opt." not in f)
    return os.path.join(ckpt_dir, f"epoch={last}.npz")
