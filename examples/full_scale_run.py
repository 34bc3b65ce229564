"""FULL-reference-scale two-stage blessed workload on one TPU chip.

Runs the flagship spsbrdf-nerf workflow at the reference's REAL step
counts (README.md:97-133: stage-1 Lambertian pretrain 100k steps, then
stage-2 RPV-111 finetune 80k steps @ lr 2.152e-4 with the checkpoint
handoff) — not the 1/10-scale convergence runs of
examples/convergence_runs.py — on a bumpy synthetic AOI sized so the
per-epoch StepLR(0.9) follows the same ~20-epoch schedule geometry as
the reference's real-dataset runs.

AOI: 1600 px images -> 2 train images x 2.56M rays = 5.12M-ray store,
5000 steps/epoch at batch 1024 -> stage-1 spans 20 epochs
(lr_end ~ 6e-5), stage-2 16 epochs.  This also exercises the ingestion
pipeline at real Pleiades crop scale (MicMac triplets of 2.56M dense
depth points per image).

Runs with the TPU production settings: --compute_dtype bfloat16_all and
--scan_chunk 16 (N fused steps per host dispatch, so a high-latency
tunnel still drives the chip at its scan-bench rate).

    python examples/full_scale_run.py [workdir]

Expected wall-clock on one v5e chip: ~1.5-2 h for 180k total steps
(the reference's own GPU rig would take ~13 h at its ~3-4 steps/s).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_utils import last_epoch_ckpt, run_config


def main(workdir: str = "/tmp/brdfnerf_fullscale"):
    os.makedirs(workdir, exist_ok=True)
    from synth_aoi import build_aoi

    print("== building bumpy synthetic AOI at 1600 px (5.12M-ray store) ==",
          flush=True)
    t0 = time.time()
    aoi = build_aoi(os.path.join(workdir, "aoi"), bumpy=True, size=1600)
    print(f"AOI built in {time.time()-t0:.0f}s", flush=True)

    logs = os.path.join(workdir, "logs")
    ckpts = os.path.join(workdir, "ckpts")
    common = ["--root_dir", aoi["root"], "--logs_dir", logs,
              "--ckpts_dir", ckpts, "--gt_dir", aoi["gt_dir"],
              "--aoi_id", aoi["aoi_id"], "--mapping",
              "--fc_feat", "512", "--fc_layers", "8",
              "--batch_size", "1024",
              "--n_samples", "64", "--guided_samples", "64",
              "--ds_lambda", "10",
              "--compute_dtype", "bfloat16_all",
              "--scan_chunk", "16",
              # validate every 4 epochs (20k steps); ckpt on the same cadence
              "--eval_every_n_epochs", "4",
              "--save_ckpt_every_n_epochs", "4"]

    results = {}

    # Stage 1: Lambertian pretrain, 100k steps (README.md:99-110)
    results["stage1-100k"] = run_config(
        "stage1-100k",
        ["--model", "spsbrdf-nerf", "--exp_name", "stage1-100k",
         "--lr", "5e-4", "--max_train_steps", "100000"] + common,
        logs, ckpts)

    s1_ckpt = last_epoch_ckpt(os.path.join(ckpts, "stage1-100k"))

    # Stage 2: RPV-111 finetune with handoff, 80k steps (README.md:113-133)
    results["stage2-80k"] = run_config(
        "stage2-80k",
        ["--model", "spsbrdf-nerf", "--exp_name", "stage2-80k",
         "--in_ckpts", s1_ckpt, "--normal", "analystic",
         "--funcM", "1", "--funcF", "1", "--funcH", "1",
         "--brdf_on", "0", "--cos_irra_on", "0",
         "--lr", "2.152e-4", "--max_train_steps", "80000"] + common,
        logs, ckpts)

    out = os.path.join(workdir, "full_scale_curves.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\n== curves written to {out} ==")
    for name, res in results.items():
        curve = res["curve"]
        pts = " -> ".join(f"{c['step']}: {c['psnr']}dB"
                          + (f"/{c['mae']}m" if c["mae"] is not None else "")
                          for c in curve[:: max(1, len(curve) // 6)])
        print(f"{name} ({res['wall_s']/60:.1f} min): {pts}")
        if curve:
            last = curve[-1]
            print(f"  final: psnr {last['psnr']} mae {last['mae']} "
                  f"at step {last['step']}")
    return results


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/brdfnerf_fullscale")
