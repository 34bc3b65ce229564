"""A/B fidelity of the sun-march sample count on the bumpy AOI.

sun_march_samples=0 (default since round 4) marches the analytic
sun-visibility ray at the REFERENCE'S count (N_samples,
rendering.py:251-253) and linearly resamples the transparency onto the
merged final axis; -1 marches at the merged final count (rounds 1-3
behavior, ~2x the march FLOPs).  The TPU A/B measured +5.0% train
throughput for the default (BASELINE.md).  This script checks the
fidelity side: same config, same seed, both march counts, bumpy AOI —
compare val PSNR and DSM MAE after the same number of steps.

Run (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/sun_march_ab.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_utils import force_requested_platform

# honor JAX_PLATFORMS=cpu even under the axon site hook (which would
# otherwise silently run the "CPU" A/B on the real TPU chip)
force_requested_platform()

import dataclasses as dc

from brdfnerf_tpu.config import (ModelConfig, RenderConfig, TrainConfig,
                                 RunConfig)
from brdfnerf_tpu.data.satellite import SatelliteConfig, SatelliteDataset
from brdfnerf_tpu.data.synth_aoi import build_aoi
from brdfnerf_tpu.train import Trainer, TrainerPaths


def run_leg(tag, sms, store, val_ds, aoi, out_dir, steps, seed):
    mcfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                       normal="analystic", sun_v="analystic",
                       func_m=True, func_f=True, func_h=1,
                       layers=4, feat=64, skips=(2,))
    rcfg = RenderConfig(n_samples=8, guided_samples=8, apply_brdf=True,
                        sun_march_samples=sms)
    tcfg = TrainConfig(lr=1e-3, batch_size=1024, max_train_steps=steps,
                       ds_lambda=10.0, brdf_on=0.0)
    paths = TrainerPaths(logs_dir=os.path.join(out_dir, tag, "l"),
                         ckpts_dir=os.path.join(out_dir, tag, "c"),
                         gt_dir=aoi["gt_dir"], aoi_id=aoi["aoi_id"])
    tr = Trainer(RunConfig(model=mcfg, render=rcfg, train=tcfg), store,
                 paths, seed=seed, val_dataset=val_ds)
    last = tr.fit(max_steps=steps, log_every=steps,
                  eval_every_n_epochs=10 ** 9,
                  save_ckpt_every_n_epochs=10 ** 9, progress=False,
                  scan_chunk=16)
    scal = tr.validate(epoch=0)
    psnr = max(v for k, v in scal.items() if k.startswith("val/psnr"))
    mae = min(v for k, v in scal.items() if "mae_" in k and "nr" not in k)
    return {"sun_march_samples": sms, "final_loss": float(last["loss"]),
            "val_psnr": float(psnr), "dsm_mae": float(mae)}


def main():
    out_dir = "/tmp/sun_march_ab"
    aoi = build_aoi(os.path.join(out_dir, "aoi"), bumpy=True, size=192)
    dcfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                           scene_loc_stride=2)
    store = SatelliteDataset(dcfg, split="train").store
    val_ds = SatelliteDataset(dcfg, split="val")
    steps = int(os.environ.get("SMA_STEPS", "400"))
    seeds = [int(s) for s in os.environ.get("SMA_SEEDS", "0,1").split(",")]

    legs = {"ref_count_0": [], "final_count_-1": []}
    for seed in seeds:
        legs["ref_count_0"].append(
            run_leg(f"s{seed}_ref", 0, store, val_ds, aoi, out_dir,
                    steps, seed))
        legs["final_count_-1"].append(
            run_leg(f"s{seed}_fin", -1, store, val_ds, aoi, out_dir,
                    steps, seed))
        print(f"seed {seed}: ref {legs['ref_count_0'][-1]} | "
              f"final {legs['final_count_-1'][-1]}", flush=True)

    def avg(rows, k):
        return float(np.mean([r[k] for r in rows]))

    out = {"steps": steps, "seeds": seeds,
           "config": "spsbrdf 4x64 analytic sun_v, 8+8 samples, "
                     "bumpy AOI 192px",
           "legs": legs,
           "mean": {name: {k: avg(rows, k)
                           for k in ("val_psnr", "dsm_mae", "final_loss")}
                    for name, rows in legs.items()}}
    print(json.dumps(out, indent=2))
    res = os.path.join(REPO, "examples", "results")
    os.makedirs(res, exist_ok=True)
    with open(os.path.join(res, "sun_march_ab.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
