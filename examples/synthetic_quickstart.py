"""End-to-end quickstart on a synthetic satellite AOI.

Builds a tiny self-consistent scene (affine RPCs, dense MicMac-style depth,
lidar GT DSM), then runs the full reference workflow through the CLIs:

  1. stage-1 spsbrdf-nerf Lambertian pretrain with depth supervision
  2. stage-2 RPV BRDF finetune with checkpoint handoff
  3. evaluation: PSNR / SSIM / registered DSM MAE + GeoTIFF artifacts
  4. most-nadir DSM extraction
  5. per-pixel BRF probe

Runs on CPU in a few minutes (tiny network); on TPU it is seconds.

    python examples/synthetic_quickstart.py [workdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(workdir: str = "/tmp/brdfnerf_quickstart"):
    os.makedirs(workdir, exist_ok=True)
    from synth_aoi import build_aoi
    from brdfnerf_tpu.cli.train import main as train_main
    from brdfnerf_tpu.cli.eval import main as eval_main
    from brdfnerf_tpu.cli.create_dsm import main as dsm_main
    from brdfnerf_tpu.cli.brf_probe import main as probe_main

    print("== building synthetic AOI ==")
    aoi = build_aoi(os.path.join(workdir, "aoi"))
    logs = os.path.join(workdir, "logs")
    ckpts = os.path.join(workdir, "ckpts")
    common = ["--root_dir", aoi["root"], "--logs_dir", logs,
              "--ckpts_dir", ckpts, "--gt_dir", aoi["gt_dir"],
              "--aoi_id", aoi["aoi_id"], "--mapping",
              "--fc_feat", "64", "--fc_layers", "4",
              "--n_samples", "8", "--guided_samples", "8",
              "--batch_size", "256", "--lr", "1e-3",
              "--eval_every_n_epochs", "1000"]

    print("== stage 1: Lambertian pretrain (depth-supervised) ==")
    train_main(["--model", "spsbrdf-nerf", "--exp_name", "stage1",
                "--ds_lambda", "10", "--max_train_steps", "300"] + common)

    s1_dir = os.path.join(ckpts, "stage1")
    s1_last = max(int(f[len("epoch="):-len(".npz")])
                  for f in os.listdir(s1_dir)
                  if f.startswith("epoch=") and ".opt." not in f)
    s1_ckpt = os.path.join(s1_dir, f"epoch={s1_last}.npz")

    print("== stage 2: RPV BRDF finetune (handoff) ==")
    train_main(["--model", "spsbrdf-nerf", "--exp_name", "stage2",
                "--in_ckpts", s1_ckpt, "--normal", "analystic",
                "--funcM", "1", "--funcF", "1", "--funcH", "1",
                "--brdf_on", "0", "--cos_irra_on", "0",
                "--ds_lambda", "10", "--max_train_steps", "200"] + common)
    s2_dir = os.path.join(ckpts, "stage2")
    s2_last = max(int(f[len("epoch="):-len(".npz")])
                  for f in os.listdir(s2_dir)
                  if f.startswith("epoch=") and ".opt." not in f)

    print("== evaluation ==")
    eval_main(["--logs_dir", os.path.join(logs, "stage2"),
               "--epoch_number", str(s2_last)])

    print("== most-nadir DSM ==")
    dsm_main(["--logs_dir", os.path.join(logs, "stage2"),
              "--epoch_number", str(s2_last)])

    print("== BRF probe (principal-plane reflectance curve) ==")
    probe_main(["--logs_dir", os.path.join(logs, "stage2"),
                "--epoch_number", str(s2_last), "--n_views", "17"])

    print(f"\nall artifacts under {workdir}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
