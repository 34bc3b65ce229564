"""CLI contract tests: train CLI -> opts.json + checkpoints -> eval CLI."""

import json
import os

import numpy as np
import pytest

from synth_aoi import build_aoi


@pytest.fixture(scope="module")
def aoi(tmp_path_factory):
    return build_aoi(str(tmp_path_factory.mktemp("synth_aoi_cli")))


def _last_epoch(ckpt_dir):
    return max(int(f[len("epoch="):-len(".npz")])
               for f in os.listdir(ckpt_dir)
               if f.startswith("epoch=") and ".opt." not in f)


@pytest.fixture(scope="module")
def spsnerf_run(aoi, tmp_path_factory):
    """One fitted sps-nerf CLI run shared by the eval / create_dsm /
    freeze-all tests (each previously trained its own ~30-60-step model;
    the repeated CPU compiles dominated test wall-clock)."""
    from brdfnerf_tpu.cli.train import main as train_main
    base = str(tmp_path_factory.mktemp("spsnerf_run"))
    logs, ckpts = os.path.join(base, "logs"), os.path.join(base, "ckpts")
    argv = [
        "--model", "sps-nerf", "--exp_name", "cli_smoke",
        "--root_dir", aoi["root"], "--logs_dir", logs,
        "--ckpts_dir", ckpts, "--gt_dir", aoi["gt_dir"],
        "--aoi_id", aoi["aoi_id"],
        # --mapping so the int8-override eval test exercises the actual
        # quantized trunk (the int8 gate needs mapping AND siren)
        "--mapping",
        "--fc_feat", "64", "--fc_layers", "4",
        "--n_samples", "8", "--guided_samples", "8",
        "--batch_size", "256", "--max_train_steps", "60",
        "--ds_lambda", "10", "--lr", "1e-3",
        "--eval_every_n_epochs", "1000",
        "--sun_v", "learned", "--sc_lambda", "0.05",
    ]
    assert train_main(argv) == 0
    run_dir = os.path.join(logs, "cli_smoke")
    ckpt_dir = os.path.join(ckpts, "cli_smoke")
    return {"run_dir": run_dir, "ckpt_dir": ckpt_dir,
            "last_epoch": _last_epoch(ckpt_dir)}


def test_train_then_eval_cli(aoi, spsnerf_run, tmp_path):
    from brdfnerf_tpu.cli.eval import main as eval_main

    run_dir = spsnerf_run["run_dir"]
    with open(os.path.join(run_dir, "opts.json")) as f:
        opts = json.load(f)
    assert opts["model"] == "sps-nerf"
    assert opts["sc_lambda"] == pytest.approx(0.05)   # kept: sun_v==learned

    last_epoch = spsnerf_run["last_epoch"]
    assert eval_main(["--logs_dir", run_dir,
                      "--epoch_number", str(last_epoch)]) == 0
    out_dir = os.path.join(run_dir, f"eval_epoch{last_epoch}")
    files = os.listdir(out_dir)
    assert any(f.endswith("_rgb.tif") for f in files)
    assert any(f.endswith("_depth.tif") for f in files)
    assert any(f.endswith("_panels.png") for f in files)
    assert os.path.isdir(os.path.join(out_dir, "rdsm"))

    # --split train renders every TRAINING image (eval.py:238-249)
    tdir = str(tmp_path / "train_eval")
    assert eval_main(["--logs_dir", run_dir, "--output_dir", tdir,
                      "--epoch_number", str(last_epoch),
                      "--split", "train"]) == 0
    rgbs = [f for f in os.listdir(tdir) if f.endswith("_rgb.tif")]
    with open(os.path.join(run_dir, "opts.json")) as f:
        root = json.load(f)["root_dir"]
    n_train = len(open(os.path.join(root, "train.txt")).read().split())
    assert len(rgbs) == n_train


def test_eval_find_best_t(aoi, tmp_path):
    """--find_best_t searches the t-embedding vocab per val image
    (eval.py:184-199): only meaningful for models with a transient
    embedding (sat-nerf), and the eval must succeed with the winning t."""
    from brdfnerf_tpu.cli.train import main as train_main
    from brdfnerf_tpu.cli.eval import main as eval_main
    base = str(tmp_path)
    logs, ckpts = os.path.join(base, "logs"), os.path.join(base, "ckpts")
    assert train_main([
        "--model", "sat-nerf", "--exp_name", "bt",
        "--root_dir", aoi["root"], "--logs_dir", logs,
        "--ckpts_dir", ckpts, "--gt_dir", aoi["gt_dir"],
        "--aoi_id", aoi["aoi_id"],
        "--fc_feat", "64", "--fc_layers", "4",
        "--n_samples", "8", "--guided_samples", "0",
        "--batch_size", "256", "--max_train_steps", "20",
        "--t_embbeding_vocab", "4",
        "--eval_every_n_epochs", "1000"]) == 0
    run_dir = os.path.join(logs, "bt")
    last = _last_epoch(os.path.join(ckpts, "bt"))
    out_dir = str(tmp_path / "bt_eval")
    assert eval_main(["--logs_dir", run_dir, "--output_dir", out_dir,
                      "--epoch_number", str(last),
                      "--find_best_t", "1"]) == 0
    assert any(f.endswith("_rgb.tif") for f in os.listdir(out_dir))


def test_sc_lambda_zeroed_without_learned_sun():
    from brdfnerf_tpu.cli.opts import train_parser, postprocess
    args = postprocess(train_parser().parse_args(
        ["--root_dir", "/tmp", "--exp_name", "x", "--sc_lambda", "0.3"]))
    assert args.sc_lambda == 0.0                      # opt.py:339-341


def test_sun_march_samples_legacy_reload(tmp_path):
    """Pre-knob runs (rounds 1-3) trained with the sun march at the
    merged final count; their reloaded opts.json must re-evaluate with
    that behavior (-1), not today's default (0 = N_samples) — otherwise a
    round-3 checkpoint's sun-visibility renders silently change under
    re-evaluation.  Fresh runs keep the new default and the eval CLI can
    override either way."""
    import json as _json

    from brdfnerf_tpu.cli.opts import (train_parser, postprocess,
                                       to_run_config, dump_opts, load_opts,
                                       eval_parser)

    base = ["--root_dir", "/tmp", "--exp_name", "x"]
    args = postprocess(train_parser().parse_args(base))
    # fresh parse: reference-intent default, dumped into opts.json
    assert to_run_config(args).render.sun_march_samples == 0
    run_dir = str(tmp_path / "run")
    dump_opts(args, run_dir)

    # a legacy opts.json = today's dump minus the key
    with open(run_dir + "/opts.json") as f:
        d = _json.load(f)
    del d["sun_march_samples"]
    with open(run_dir + "/opts.json", "w") as f:
        _json.dump(d, f)
    legacy = load_opts(run_dir)
    assert legacy.sun_march_samples == -1             # merged final count
    assert to_run_config(legacy).render.sun_march_samples == -1
    # a fresh run's dump round-trips its recorded value unchanged
    dump_opts(args, run_dir)
    assert load_opts(run_dir).sun_march_samples == 0

    # eval-time override flag exists and reaches the render config
    ea = eval_parser().parse_args(
        ["--logs_dir", "/tmp", "--epoch_number", "1",
         "--sun_march_samples", "-1"])
    assert ea.sun_march_samples == -1
    import dataclasses as dc
    cfg = to_run_config(legacy)
    cfg = dc.replace(cfg, render=dc.replace(
        cfg.render, sun_march_samples=int(ea.sun_march_samples)))
    assert cfg.render.sun_march_count(final_count=128) == 128


def test_reference_readme_cmdline_parses():
    """The verbatim stage-2 BRDF training command from the reference README
    (README.md:99-132) parses and maps onto the run config, flag names
    unchanged — plus the reference-only spellings --GNLL / --std_range /
    --fresnel_f0 / --MultiBRDF 1 / --fc_feat_ref (opt.py:213,259,279,312)."""
    from brdfnerf_tpu.cli.opts import train_parser, postprocess, to_run_config
    argv = [
        "--aoi_id", "Dji_012", "--model", "spsbrdf-nerf",
        "--exp_name", "BRDF-NeRF-Dji_012-ds10-ir0_Imscl1-nranalystic-bo0-RPV111",
        "--root_dir", "/tmp/root", "--img_dir", "/tmp/img",
        "--cache_dir", "/tmp/cache", "--gt_dir", "/tmp/gt",
        "--logs_dir", "/tmp/logs", "--ckpts_dir", "/tmp/ckpts",
        "--max_train_steps", "80000", "--lr", "0.0002152",
        "--ds_lambda", "10", "--mapping", "--in_ckpts", "/tmp/epoch=9.npz",
        "--normal", "analystic", "--brdf_on", "0", "--visu_scale", "2",
        "--scale", "1", "--funcM", "1", "--funcF", "1", "--funcH", "1",
        "--cos_irra_on", "0",
        # reference-only spellings
        "--GNLL", "--std_range", "2.5", "--fresnel_f0", "0.05",
        "--MultiBRDF", "1", "--fc_feat_ref", "256", "--fc_layers_ref", "2",
        "--mod_alt_bound", "1", "--infile_postfix", "",
    ]
    args = postprocess(train_parser().parse_args(argv))
    assert args.gnll is True
    assert args.std_range == pytest.approx(2.5)
    assert args.f0 == pytest.approx(0.05)
    assert args.multi_brdf == 1 and args.visu_scale == pytest.approx(2.0)
    assert args.infile_postfix == ".txt"              # opt.py:343
    assert args.fc_feat_ref == 256                    # explicit value kept
    cfg = to_run_config(args)
    assert cfg.model.variant == "spsbrdf-nerf"
    assert cfg.model.func_m and cfg.model.func_f and cfg.model.func_h == 1
    assert cfg.model.multi_brdf is True
    assert cfg.model.fresnel_f0 == pytest.approx(0.05)
    assert cfg.render.std_range == pytest.approx(2.5)
    assert cfg.train.gnll is True
    # fc_feat_ref defaults to fc_feat when 0 (opt.py:334-335)
    args2 = postprocess(train_parser().parse_args(
        ["--root_dir", "/tmp", "--exp_name", "x", "--fc_feat", "256"]))
    assert args2.fc_feat_ref == 256
    # --eval 1 without --in_ckpts refuses (main.py:91-92)
    with pytest.raises(SystemExit):
        postprocess(train_parser().parse_args(
            ["--root_dir", "/tmp", "--exp_name", "x", "--eval", "1"]))


def test_compute_dtype_flag():
    """--compute_dtype exposes ModelConfig.compute_dtype (the TPU bf16
    production setting) through the CLI; absent in old opts.json it falls
    back to float32."""
    from brdfnerf_tpu.cli.opts import train_parser, postprocess, to_run_config
    base = ["--root_dir", "/tmp", "--exp_name", "x"]
    args = postprocess(train_parser().parse_args(
        base + ["--compute_dtype", "bfloat16_all"]))
    assert to_run_config(args).model.compute_dtype == "bfloat16_all"
    assert to_run_config(postprocess(train_parser().parse_args(
        base))).model.compute_dtype == "float32"
    # old opts.json reloaded without the key (pre-flag runs) still builds
    ns = postprocess(train_parser().parse_args(base))
    delattr(ns, "compute_dtype")
    assert to_run_config(ns).model.compute_dtype == "float32"
    with pytest.raises(SystemExit):
        train_parser().parse_args(base + ["--compute_dtype", "fp8"])


def test_eval_freeze_all_mode(aoi, spsnerf_run, tmp_path):
    """--eval 1 + --in_ckpts: every parameter frozen — a training step
    changes nothing (reference load mode (c), main.py:91-96).  The
    pretrained checkpoint is the shared spsnerf_run fixture's (the sps-nerf
    head set is identical; --sun_v only gates the loss terms)."""
    from brdfnerf_tpu.cli.train import main as train_main
    logs, ckpts = str(tmp_path / "l"), str(tmp_path / "c")
    base = [
        "--model", "sps-nerf", "--root_dir", aoi["root"],
        "--logs_dir", logs, "--ckpts_dir", ckpts,
        "--aoi_id", aoi["aoi_id"],
        "--mapping",     # match spsnerf_run's trunk input width
        "--fc_feat", "64", "--fc_layers", "4",
        "--n_samples", "8", "--guided_samples", "8",
        "--batch_size", "256", "--ds_lambda", "10", "--lr", "1e-3",
        "--eval_every_n_epochs", "1000"]
    in_ckpts = os.path.join(spsnerf_run["ckpt_dir"],
                            f"epoch={spsnerf_run['last_epoch']}.npz")

    from brdfnerf_tpu.utils import checkpoint as ckpt_mod
    before = ckpt_mod.load_flat(in_ckpts)
    assert train_main(base + ["--exp_name", "frozen", "--eval", "1",
                              "--in_ckpts", in_ckpts,
                              "--max_train_steps", "10"]) == 0
    ck2 = os.path.join(ckpts, "frozen")
    last2 = sorted(f for f in os.listdir(ck2)
                   if f.startswith("epoch=") and ".opt." not in f)[-1]
    after = ckpt_mod.load_flat(os.path.join(ck2, last2))
    for k in before:
        if k.startswith("__"):
            continue
        np.testing.assert_array_equal(before[k], after[k])


def test_eval_cli_int8_override(spsnerf_run, tmp_path):
    """--compute_dtype int8 serves a trained run through the quantized
    trunk end-to-end (scan render included) and scores within
    quantization noise of the run's own precision."""
    from brdfnerf_tpu.cli.eval import evaluate

    run_dir = spsnerf_run["run_dir"]
    last = spsnerf_run["last_epoch"]
    base = evaluate(run_dir, last, output_dir=str(tmp_path / "f32"))
    q = evaluate(run_dir, last, output_dir=str(tmp_path / "int8"),
                 compute_dtype="int8")
    assert np.isfinite(q["psnr"])
    # the quantized trunk actually ran (identical scores would mean the
    # int8 gate silently fell back -- it needs mapping AND siren)
    assert q["psnr"] != base["psnr"]
    # int8 perturbs sampled z positions too, so allow ~1 dB
    assert abs(q["psnr"] - base["psnr"]) < 1.5, (q["psnr"], base["psnr"])
    assert abs(q["ssim"] - base["ssim"]) < 0.05


def test_eval_normal_at_surface_override(aoi, tmp_path):
    """--normal_at_surface through the eval CLI must actually reach the
    render: it only changes the ANALYTIC-normal path, so the test trains
    a spsbrdf model with --normal analystic (sps-nerf would make the
    override a silent no-op) and asserts the two renders differ while
    scoring in the same ballpark."""
    from brdfnerf_tpu.cli.train import main as train_main
    from brdfnerf_tpu.cli.eval import evaluate
    logs, ckpts = str(tmp_path / "l"), str(tmp_path / "c")
    assert train_main([
        "--model", "spsbrdf-nerf", "--exp_name", "srf",
        "--root_dir", aoi["root"], "--logs_dir", logs,
        "--ckpts_dir", ckpts, "--gt_dir", aoi["gt_dir"],
        "--aoi_id", aoi["aoi_id"], "--mapping",
        "--normal", "analystic",
        "--funcM", "1", "--funcF", "1", "--funcH", "1",
        "--brdf_on", "0", "--cos_irra_on", "0",
        "--fc_feat", "64", "--fc_layers", "4",
        "--n_samples", "8", "--guided_samples", "8",
        "--batch_size", "256", "--max_train_steps", "40",
        "--ds_lambda", "10", "--lr", "1e-3",
        "--eval_every_n_epochs", "1000"]) == 0
    run_dir = os.path.join(logs, "srf")
    last = _last_epoch(os.path.join(ckpts, "srf"))
    base = evaluate(run_dir, last, output_dir=str(tmp_path / "b"))
    srf = evaluate(run_dir, last, output_dir=str(tmp_path / "s"),
                   normal_at_surface=True)
    assert np.isfinite(srf["psnr"])
    # the override reached the render (per-sample vs surface normals
    # genuinely differ on an analytic-normal BRDF model)...
    assert srf["psnr"] != base["psnr"], srf["psnr"]
    # ...but stays in the same ballpark (appearance trade-off only)
    assert abs(srf["psnr"] - base["psnr"]) < 6.0, (srf["psnr"],
                                                   base["psnr"])


def test_serve_api(spsnerf_run):
    """serve.load_renderer: the one-call serving API behind the
    eval/create_dsm/brf_probe CLIs — and multi-chip serving via
    n_devices (rays shard over the mesh, identical image)."""
    import jax
    from brdfnerf_tpu.serve import load_renderer

    r = load_renderer(spsnerf_run["run_dir"], spsnerf_run["last_epoch"])
    assert len(r) >= 1
    out = r.render_image(0)
    s = r.get_image(0)
    rgb = out["rgb_coarse"].reshape(s["h"], s["w"], 3)
    assert np.isfinite(rgb).all()

    if jax.device_count() >= 8:
        rm = load_renderer(spsnerf_run["run_dir"],
                           spsnerf_run["last_epoch"], n_devices=8)
        out8 = rm.render_image(0)
        # scan-vs-loop fusion differences are ~1e-4 mean (BASELINE.md);
        # mesh sharding itself is bit-identical per dryrun_multichip
        d = np.abs(np.asarray(out8["rgb_coarse"])
                   - np.asarray(out["rgb_coarse"]))
        assert float(d.mean()) < 5e-3, float(d.mean())


def test_nr_spv_type_derivation():
    from brdfnerf_tpu.cli.opts import train_parser, postprocess
    args = postprocess(train_parser().parse_args(
        ["--root_dir", "/tmp", "--exp_name", "x",
         "--normal", "analystic"]))
    assert args.nr_spv_type == 3                      # opt.py:328-334


def test_depth_qa_cli(aoi, capsys):
    """Supervision-source QA: flat-terrain depth triplets vs flat GT -> ~0."""
    from brdfnerf_tpu.cli.depth_qa import depth_qa
    res = depth_qa(aoi["root"], aoi["gt_dir"], aoi["aoi_id"])
    assert len(res) == 3          # one per image with depth files
    assert all(v < 0.05 for v in res.values()), res


def test_create_dsm_cli(spsnerf_run):
    """Extract the most-nadir DSM from the shared fitted run."""
    from brdfnerf_tpu.cli.create_dsm import main as dsm_main

    last = spsnerf_run["last_epoch"]
    assert dsm_main(["--logs_dir", spsnerf_run["run_dir"],
                     "--epoch_number", str(last)]) == 0
    out_dir = os.path.join(spsnerf_run["run_dir"], f"dsm_epoch{last}")
    assert any(f.endswith("_dsm.tif") for f in os.listdir(out_dir))


@pytest.fixture(scope="module")
def two_stage_run(aoi, tmp_path_factory):
    """The canonical reference workflow (README.md:97-133): stage-1
    Lambertian pretrain with depth supervision, stage-2 BRDF finetune
    restoring the stage-1 trunk via --in_ckpts.  Shared by the workflow
    test and the BRF-probe test (which previously trained its own
    spsbrdf model)."""
    from brdfnerf_tpu.cli.train import main as train_main

    base = str(tmp_path_factory.mktemp("two_stage"))
    logs, ckpts = os.path.join(base, "logs"), os.path.join(base, "ckpts")
    common = ["--root_dir", aoi["root"], "--logs_dir", logs,
              "--ckpts_dir", ckpts, "--gt_dir", aoi["gt_dir"],
              "--aoi_id", aoi["aoi_id"], "--mapping",
              "--fc_feat", "64", "--fc_layers", "4",
              "--n_samples", "8", "--guided_samples", "8",
              "--batch_size", "256", "--lr", "1e-3",
              "--eval_every_n_epochs", "1000"]
    # stage 1
    assert train_main(["--model", "spsbrdf-nerf", "--exp_name", "s1",
                       "--ds_lambda", "10", "--max_train_steps", "40"]
                      + common) == 0
    s1_last = _last_epoch(os.path.join(ckpts, "s1"))
    s1_ckpt = os.path.join(ckpts, "s1", f"epoch={s1_last}.npz")

    # stage 2: BRDF finetune with handoff
    assert train_main(["--model", "spsbrdf-nerf", "--exp_name", "s2",
                       "--in_ckpts", s1_ckpt, "--normal", "analystic",
                       "--funcM", "1", "--funcF", "1", "--funcH", "1",
                       "--brdf_on", "0", "--cos_irra_on", "0",
                       "--ds_lambda", "10", "--max_train_steps", "30"]
                      + common) == 0
    s2_last = _last_epoch(os.path.join(ckpts, "s2"))
    return {"logs": logs, "ckpts": ckpts,
            "s2_run_dir": os.path.join(logs, "s2"),
            "s2_ckpt_dir": os.path.join(ckpts, "s2"), "s2_last": s2_last}


def test_two_stage_workflow_cli(two_stage_run):
    from brdfnerf_tpu.cli.eval import main as eval_main
    from brdfnerf_tpu.utils import checkpoint as ckpt_mod

    s2_last = two_stage_run["s2_last"]
    # stage-2 checkpoint carries the BRDF heads
    flat = ckpt_mod.load_flat(os.path.join(two_stage_run["s2_ckpt_dir"],
                                           f"epoch={s2_last}.npz"))
    assert any("k_from_xyz" in k for k in flat)

    assert eval_main(["--logs_dir", two_stage_run["s2_run_dir"],
                      "--epoch_number", str(s2_last)]) == 0


def test_brf_probe_cli(two_stage_run):
    from brdfnerf_tpu.cli.brf_probe import main as probe_main
    run_dir = two_stage_run["s2_run_dir"]
    last = two_stage_run["s2_last"]
    assert probe_main(["--logs_dir", run_dir, "--epoch_number", str(last),
                       "--n_views", "9", "--param_probe"]) == 0
    out = os.path.join(run_dir, f"brf_epoch{last}")
    assert any(f.endswith(".txt") for f in os.listdir(out))


def test_eval_cli_multichip_matches_single_device(spsnerf_run, tmp_path):
    """--n_devices 8 (multi-chip serving through serve.load_renderer's
    mesh) scores the same metrics as the single-device eval: the ray-
    sharded scan render is a pure layout change (the dryrun pins the
    rendered pixels; this pins the full eval CLI consumer on the mesh)."""
    from brdfnerf_tpu.cli.eval import evaluate

    run_dir = spsnerf_run["run_dir"]
    last = spsnerf_run["last_epoch"]
    base = evaluate(run_dir, last, output_dir=str(tmp_path / "one"))
    mesh = evaluate(run_dir, last, output_dir=str(tmp_path / "mesh"),
                    n_devices=8)
    assert np.isfinite(mesh["psnr"])
    assert mesh["psnr"] == pytest.approx(base["psnr"], rel=1e-4)
    assert mesh["ssim"] == pytest.approx(base["ssim"], rel=1e-4)
    if np.isfinite(base.get("mae", np.nan)):
        assert mesh["mae"] == pytest.approx(base["mae"], rel=1e-3)


def test_train_cli_tp_rejects_bad_mesh_spec(tmp_path):
    """--tp without a compatible --n_devices fails fast at parse time
    (before dataset ingestion, which can take minutes)."""
    from brdfnerf_tpu.cli.train import main as train_main
    argv = ["--model", "sps-nerf", "--exp_name", "bad_tp",
            "--root_dir", str(tmp_path), "--logs_dir", str(tmp_path / "l"),
            "--ckpts_dir", str(tmp_path / "c")]
    with pytest.raises(SystemExit, match="--tp 4 needs --n_devices"):
        train_main(argv + ["--n_devices", "6", "--tp", "4"])
    with pytest.raises(SystemExit, match="--tp 4 needs --n_devices"):
        train_main(argv + ["--tp", "4"])
