"""Convergence runs for the blessed configs (BASELINE.md list, configs
2-5) on the bumpy synthetic AOI at ~1/10 the reference step counts.

Each run trains through the real CLI at the blessed network shape
(8x512 siren trunk, 64+64 samples for the spsbrdf stages), validating on
a cadence so scalars.jsonl carries a PSNR / DSM-MAE convergence curve.
The script ends by printing a per-config summary (curve points + plateau)
and writing curves.json into the workdir — the numbers BASELINE.md's
"Convergence" section quotes.

    python examples/convergence_runs.py [workdir]

Reference workload definition: README.md:97-144 (stage-1 100k steps,
stage-2 80k @ lr 2.152e-4); sat-nerf / s-nerf variants per opt.py
defaults. On one TPU chip the four runs take ~30 min total.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_utils import last_epoch_ckpt, run_config as _run_config


def run_config(name, argv, logs, ckpts):
    return _run_config(name, argv, logs, ckpts)["curve"]


def main(workdir: str = "/tmp/brdfnerf_convergence"):
    os.makedirs(workdir, exist_ok=True)
    from synth_aoi import build_aoi

    print("== building bumpy synthetic AOI (with BA keypoints) ==")
    # 512 px images -> 524k-ray store -> 512 steps/epoch at batch 1024,
    # so the 10k-step runs span ~20 epochs and the reference's per-epoch
    # StepLR(0.9) follows its real-dataset geometry (lr_end ~ 7e-5, like
    # the reference's ~17-epoch 100k-step runs). At the test AOI's 32 px
    # the lr decays 0.9 every 2 steps and training freezes by step ~1000.
    aoi = build_aoi(os.path.join(workdir, "aoi"), with_keypoints=True,
                    bumpy=True, size=512)
    logs = os.path.join(workdir, "logs")
    ckpts = os.path.join(workdir, "ckpts")
    common = ["--root_dir", aoi["root"], "--logs_dir", logs,
              "--ckpts_dir", ckpts, "--gt_dir", aoi["gt_dir"],
              "--aoi_id", aoi["aoi_id"], "--mapping",
              "--fc_feat", "512", "--fc_layers", "8",
              "--batch_size", "1024",
              # validate every 2 epochs (~1000 steps); checkpoint every 4
              "--eval_every_n_epochs", "2",
              "--save_ckpt_every_n_epochs", "4"]

    curves = {}

    # config 2: sat-nerf (uncertainty beta + t embedding + learned sun +
    # solar correction + sparse keypoint depth) — reference opt.py defaults
    curves["sat-nerf"] = run_config(
        "sat-nerf", ["--model", "sat-nerf", "--exp_name", "sat-nerf",
                     "--beta", "--sun_v", "learned", "--sc_lambda", "0.05",
                     "--ds_lambda", "10",
                     "--n_samples", "64",
                     "--lr", "5e-4", "--max_train_steps", "10000"] + common,
        logs, ckpts)

    # config 3: s-nerf shadow-aware variant
    curves["s-nerf"] = run_config(
        "s-nerf", ["--model", "s-nerf", "--exp_name", "s-nerf",
                   "--sun_v", "learned", "--sc_lambda", "0.05",
                   "--n_samples", "64",
                   "--lr", "5e-4", "--max_train_steps", "10000"] + common,
        logs, ckpts)

    # config 4: spsbrdf-nerf stage-1 Lambertian pretrain, ds_lambda=10
    # (README.md:99-110 at 1/10 steps)
    curves["spsbrdf-stage1"] = run_config(
        "spsbrdf-stage1",
        ["--model", "spsbrdf-nerf", "--exp_name", "spsbrdf-stage1",
         "--ds_lambda", "10", "--n_samples", "64", "--guided_samples", "64",
         "--lr", "5e-4", "--max_train_steps", "10000"] + common, logs, ckpts)

    s1_ckpt = last_epoch_ckpt(os.path.join(ckpts, "spsbrdf-stage1"))

    # config 5: spsbrdf-nerf stage-2 RPV-111 finetune with handoff
    # (README.md:113-133 at 1/10 steps, lr 2.152e-4)
    curves["spsbrdf-stage2"] = run_config(
        "spsbrdf-stage2",
        ["--model", "spsbrdf-nerf", "--exp_name", "spsbrdf-stage2",
         "--in_ckpts", s1_ckpt, "--normal", "analystic",
         "--funcM", "1", "--funcF", "1", "--funcH", "1",
         "--brdf_on", "0", "--cos_irra_on", "0",
         "--ds_lambda", "10", "--n_samples", "64", "--guided_samples", "64",
         "--lr", "2.152e-4", "--max_train_steps", "8000"] + common, logs, ckpts)

    out = os.path.join(workdir, "curves.json")
    with open(out, "w") as f:
        json.dump(curves, f, indent=2)
    print(f"\n== curves written to {out} ==")
    for name, curve in curves.items():
        pts = " -> ".join(f"{c['step']}: {c['psnr']}dB"
                          + (f"/{c['mae']}m" if c["mae"] is not None else "")
                          for c in curve[:: max(1, len(curve) // 6)])
        print(f"{name}: {pts}")
        if curve:
            last = curve[-1]
            print(f"  plateau: psnr {last['psnr']} mae {last['mae']} "
                  f"at step {last['step']}")
    return curves


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/brdfnerf_convergence")
