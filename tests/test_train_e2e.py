"""End-to-end training smoke tests on the synthetic AOI (CPU).

The reference has no test suite; its de-facto regression harness is
"PSNR goes up during training" (SURVEY.md 4).  These tests encode that:
a few hundred steps of the sps pipeline on a tiny flat scene must reduce
the loss and beat the untrained PSNR, the checkpoint roundtrip must be
exact, and the two-stage handoff must restore exactly the trunk subset.
"""

import os

import numpy as np
import pytest

import jax

from synth_aoi import build_aoi
from brdfnerf_tpu.config import (ModelConfig, RenderConfig, TrainConfig,
                                 RunConfig)
from brdfnerf_tpu.data.satellite import SatelliteConfig, SatelliteDataset
from brdfnerf_tpu.train import Trainer, TrainerPaths
from brdfnerf_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def aoi(tmp_path_factory):
    return build_aoi(str(tmp_path_factory.mktemp("synth_aoi_e2e")))


@pytest.fixture(scope="module")
def datasets(aoi):
    cfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                          scene_loc_stride=2)
    return (SatelliteDataset(cfg, split="train"),
            SatelliteDataset(cfg, split="val"))


def _run_cfg(**train_over):
    mcfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                       layers=4, feat=64, skips=(2,), normal="none")
    rcfg = RenderConfig(n_samples=8, guided_samples=8)
    tdefaults = dict(lr=1e-3, batch_size=256, max_train_steps=300,
                     ds_lambda=10.0, ds_drop=1.0)
    tdefaults.update(train_over)
    return RunConfig(model=mcfg, render=rcfg, train=TrainConfig(**tdefaults))


def test_training_reduces_loss(datasets, aoi, tmp_path):
    train_ds, val_ds = datasets
    cfg = _run_cfg()
    paths = TrainerPaths(logs_dir=str(tmp_path / "logs"),
                         ckpts_dir=str(tmp_path / "ckpts"),
                         gt_dir=aoi["gt_dir"], aoi_id=aoi["aoi_id"])
    tr = Trainer(cfg, train_ds.store, paths, val_dataset=None, seed=0)
    # capture the first-step loss, then train
    first = tr.fit(max_steps=1, log_every=1, progress=False)
    last = tr.fit(max_steps=300, log_every=100, progress=False)
    assert last["loss"] < first["loss"] * 0.7, (first, last)
    assert last["psnr"] > first["psnr"] + 2.0
    # checkpoints written
    assert ckpt.latest_checkpoint(paths.ckpts_dir) is not None


def test_scan_chunk_trainer_fit(datasets, aoi, tmp_path):
    """fit(scan_chunk=N) drives the chunked dispatch path end-to-end:
    trains (loss drops), clamps chunks at epoch boundaries (epoch-end
    checkpoints land exactly as with per-step dispatch), and the phase
    flip from brdf_on mid-run compiles its own scan program."""
    import dataclasses as dc
    train_ds, val_ds = datasets
    cfg = _run_cfg()
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, func_m=True,
                                           normal="analystic"),
                     render=dc.replace(cfg.render, apply_brdf=True),
                     train=dc.replace(cfg.train, brdf_on=0.2,
                                      max_train_steps=120))
    paths = TrainerPaths(logs_dir=str(tmp_path / "logs"),
                         ckpts_dir=str(tmp_path / "ckpts"),
                         gt_dir=aoi["gt_dir"], aoi_id=aoi["aoi_id"])
    tr = Trainer(cfg, train_ds.store, paths, val_dataset=None, seed=0)
    first = tr.fit(max_steps=1, log_every=1, progress=False)
    last = tr.fit(max_steps=120, log_every=50, progress=False,
                  scan_chunk=7)    # does not divide epochs/log cadence
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"], (first, last)
    assert int(tr.state.step) == 120
    assert ckpt.latest_checkpoint(paths.ckpts_dir) is not None
    # both the pre-flip and post-flip (apply_brdf) scan programs compiled
    scan_keys = [k for k in tr._step_fns if k[0] == "scan"]
    assert len(scan_keys) >= 2, tr._step_fns.keys()


def test_scan_chunk_log_cadence_and_inactive_phase(datasets, aoi, tmp_path):
    """A scan chunk larger than log_every clamps so each log point gets
    its own scalars row at exactly its own step; and a brdf_on threshold
    whose render flag is OFF (apply_brdf=False) neither splits the chunk
    stream nor compiles a second scan program."""
    import dataclasses as dc
    import json
    train_ds, val_ds = datasets
    cfg = _run_cfg()
    # brdf_on mid-run but apply_brdf stays False -> static phase constant
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, brdf_on=0.5,
                                           max_train_steps=100))
    paths = TrainerPaths(logs_dir=str(tmp_path / "logs"),
                         ckpts_dir=str(tmp_path / "ckpts"),
                         gt_dir=aoi["gt_dir"], aoi_id=aoi["aoi_id"])
    tr = Trainer(cfg, train_ds.store, paths, val_dataset=None, seed=0)
    assert tr._next_phase_change(0) == 10 ** 18   # no active static gate
    tr.fit(max_steps=100, log_every=10, progress=False, scan_chunk=64)
    logged = []
    with open(os.path.join(paths.logs_dir, "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec:
                logged.append(rec["step"])
    # one row per multiple of log_every, stamped at the log point itself
    # (plus the final step, which the loop always logs)
    assert [s for s in logged if s != 99] == list(range(0, 100, 10)), logged
    # exactly ONE scan program (the 0.5*max_steps threshold is inert)
    scan_keys = [k for k in tr._step_fns if k[0] == "scan"]
    assert len(scan_keys) == 1, tr._step_fns.keys()


def test_scan_render_matches_chunk_loop(datasets, aoi, tmp_path,
                                        monkeypatch):
    """render_image's one-dispatch lax.scan path returns the same maps
    as the chunk-per-dispatch host loop (all per-ray keys and reduced
    panel fields), including the padded last chunk."""
    import dataclasses as dc
    train_ds, val_ds = datasets
    cfg = _run_cfg()
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, func_m=True,
                                           normal="analystic"),
                     render=dc.replace(cfg.render, apply_brdf=True))
    paths = TrainerPaths(logs_dir=str(tmp_path / "logs"),
                         ckpts_dir=str(tmp_path / "ckpts"))
    tr = Trainer(cfg, train_ds.store, paths, val_dataset=val_ds, seed=0)
    tr.fit(max_steps=5, log_every=100, eval_every_n_epochs=0,
           save_ckpt_every_n_epochs=0, progress=False)
    s = val_ds.get_image(0)
    # chunk 100 does not divide 1024 rays -> exercises the padded tail;
    # block 4 over 11 chunks -> 3 blocks incl. a padded final block
    monkeypatch.delenv("BRDFNERF_NO_SCAN_RENDER", raising=False)
    monkeypatch.setenv("BRDFNERF_RENDER_SCAN_BLOCK", "4")
    scan_out = tr.render_image(s, chunk=100)
    monkeypatch.setenv("BRDFNERF_NO_SCAN_RENDER", "1")
    loop_out = tr.render_image(s, chunk=100)
    assert set(scan_out) == set(loop_out)
    assert "rgb_coarse" in scan_out and "normal_an_coarse" in scan_out
    for k in loop_out:
        assert scan_out[k].shape == loop_out[k].shape, k
        # normals come from jax.grad of the trunk; scan vs loop fuse
        # differently in XLA and round at ~1e-4 in f32
        atol = 1e-3 if "normal" in k else 1e-5
        np.testing.assert_allclose(scan_out[k], loop_out[k],
                                   rtol=1e-4, atol=atol, err_msg=k)


def test_validation_and_dsm(datasets, aoi, tmp_path):
    train_ds, val_ds = datasets
    cfg = _run_cfg(max_train_steps=200)
    paths = TrainerPaths(logs_dir=str(tmp_path / "logs"),
                         ckpts_dir=str(tmp_path / "ckpts"),
                         gt_dir=aoi["gt_dir"], aoi_id=aoi["aoi_id"])
    tr = Trainer(cfg, train_ds.store, paths, val_dataset=val_ds, seed=0)
    tr.fit(max_steps=200, log_every=100, eval_every_n_epochs=1000,
           progress=False)   # no mid-train validation; explicit below
    scal = tr.validate(epoch=0)
    keys = list(scal)
    assert any(k.startswith("val/psnr") for k in keys)
    assert any(k.startswith("train_/psnr") for k in keys)   # debug train img
    maes = [v for k, v in scal.items() if "mae_" in k and "nr" not in k]
    assert maes and all(np.isfinite(m) for m in maes)
    # depth supervision on a flat scene pins the DSM within a few meters
    assert min(maes) < 10.0
    # artifacts on disk
    assert os.path.isdir(os.path.join(paths.logs_dir, "rdsm"))


def test_validation_panel_stack(datasets, aoi, tmp_path):
    """validate() writes the full multi-panel summary (rgb/gt/depth +
    BRDF parameter, normal, sun maps + fair-MAE diff panels on the train
    image), the main.py:426-558 analog; render_image exposes the per-ray
    accumulated maps the panels need."""
    train_ds, val_ds = datasets
    mcfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                       normal="analystic", sun_v="analystic",
                       func_m=True, func_f=True, func_h=1,
                       layers=4, feat=64, skips=(2,))
    rcfg = RenderConfig(n_samples=8, guided_samples=8, apply_brdf=True)
    tcfg = TrainConfig(lr=1e-3, batch_size=256, max_train_steps=20,
                       ds_lambda=10.0, brdf_on=0.0)
    cfg = RunConfig(model=mcfg, render=rcfg, train=tcfg)
    paths = TrainerPaths(logs_dir=str(tmp_path / "lp"),
                         ckpts_dir=str(tmp_path / "cp"),
                         gt_dir=aoi["gt_dir"], aoi_id=aoi["aoi_id"])
    tr = Trainer(cfg, train_ds.store, paths, val_dataset=val_ds, seed=0)
    tr.fit(max_steps=20, log_every=20, eval_every_n_epochs=1000,
           progress=False)

    s = val_ds.get_image(0)
    out = tr.render_image(s)
    # per-ray accumulated BRDF/normal maps are exposed
    n = s["rays"].shape[0]
    assert out["rpv_k_coarse"].shape == (n, 3)
    assert out["normal_an_coarse"].shape == (n, 3)
    assert out["sun_coarse"].shape == (n, 1)

    tr.validate(epoch=0)
    from PIL import Image
    for idx in range(len(val_ds)):
        p = os.path.join(paths.logs_dir, f"val_{idx}_epoch0.png")
        assert os.path.exists(p), p
    img = np.asarray(Image.open(
        os.path.join(paths.logs_dir, "val_0_epoch0.png")))
    h = s["h"]
    n_panels = (img.shape[0] + 2) // (h + 2)
    # rgb + gt + depth + albedo + sun + normal_an + rpv k/theta/rhoc +
    # irradiance >= 10, plus the train-image diff panels
    assert n_panels >= 10, n_panels


def test_render_fn_cache_keys_by_rcfg(datasets, tmp_path, monkeypatch):
    """render_image(rcfg=...) with a new config must compile a new program
    instead of silently reusing the first cached one (round-1 bug) — on
    BOTH render paths (the default block-scan and the chunk loop)."""
    import dataclasses as dc
    train_ds, val_ds = datasets
    cfg = _run_cfg(max_train_steps=10)
    paths = TrainerPaths(logs_dir=str(tmp_path / "l3"),
                         ckpts_dir=str(tmp_path / "c3"))
    tr = Trainer(cfg, train_ds.store, paths, seed=0)
    s = val_ds.get_image(0)
    rc2 = dc.replace(cfg.render, n_samples=cfg.render.n_samples * 4)
    monkeypatch.delenv("BRDFNERF_NO_SCAN_RENDER", raising=False)
    out1 = tr.render_image(s)
    out2 = tr.render_image(s, rcfg=rc2)
    assert len(tr._scan_render_fns) == 2
    # the second config provably drives the render: 4x samples changes depth
    assert not np.allclose(out1["depth_coarse"], out2["depth_coarse"])
    # the loop path (BRDFNERF_NO_SCAN_RENDER, also _save_cross_section's
    # path) keys its own cache by rcfg too
    monkeypatch.setenv("BRDFNERF_NO_SCAN_RENDER", "1")
    lo1 = tr.render_image(s)
    lo2 = tr.render_image(s, rcfg=rc2)
    assert len(tr._render_fns) == 2
    assert not np.allclose(lo1["depth_coarse"], lo2["depth_coarse"])


def test_checkpoint_roundtrip_and_handoff(datasets, tmp_path):
    train_ds, _ = datasets
    cfg = _run_cfg(max_train_steps=20)
    paths = TrainerPaths(logs_dir=str(tmp_path / "l2"),
                         ckpts_dir=str(tmp_path / "c2"))
    tr = Trainer(cfg, train_ds.store, paths, seed=0)
    tr.fit(max_steps=20, log_every=10, progress=False)
    path = ckpt.latest_checkpoint(paths.ckpts_dir)
    assert path is not None

    # full roundtrip is exact
    restored = ckpt.restore_params(tr.state.params, path)
    flat_a = jax.tree_util.tree_leaves(tr.state.params)
    flat_b = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # handoff: fresh BRDF model restores only trunk+sigma+feats+rgb
    cfg2 = RunConfig(
        model=ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                          layers=4, feat=64, skips=(2,), normal="analystic",
                          func_m=True, func_f=True, func_h=1),
        render=RenderConfig(n_samples=8, guided_samples=8, apply_brdf=True),
        train=TrainConfig(lr=1e-3, batch_size=256, max_train_steps=20,
                          brdf_on=0.0))
    tr2 = Trainer(cfg2, train_ds.store, paths, seed=1, in_ckpts=path)
    # trunk matches stage 1, BRDF heads are fresh
    a = np.asarray(tr2.state.params["coarse"]["fc_net"][0]["w"])
    b = np.asarray(tr.state.params["coarse"]["fc_net"][0]["w"])
    np.testing.assert_array_equal(a, b)
    assert "k_from_xyz" in tr2.state.params["coarse"]
    # one step of stage 2 runs
    tr2.fit(max_steps=int(tr2.state.step) + 2, log_every=1, progress=False)


def test_freeze_mask(datasets, tmp_path):
    train_ds, _ = datasets
    cfg = _run_cfg(max_train_steps=10)
    paths = TrainerPaths(logs_dir=str(tmp_path / "l3"),
                         ckpts_dir=str(tmp_path / "c3"))
    tr = Trainer(cfg, train_ds.store, paths, seed=0,
                 freeze=["coarse/fc_net"])
    before = np.asarray(tr.state.params["coarse"]["fc_net"][0]["w"]).copy()
    sig_before = np.asarray(
        tr.state.params["coarse"]["sigma_from_xyz"][0]["w"]).copy()
    tr.fit(max_steps=10, log_every=5, progress=False)
    after = np.asarray(tr.state.params["coarse"]["fc_net"][0]["w"])
    sig_after = np.asarray(tr.state.params["coarse"]["sigma_from_xyz"][0]["w"])
    np.testing.assert_array_equal(before, after)        # frozen
    assert not np.array_equal(sig_before, sig_after)    # trainable moved


def test_resume_restores_optimizer_state(datasets, tmp_path):
    train_ds, _ = datasets
    cfg = _run_cfg(max_train_steps=12)
    paths = TrainerPaths(logs_dir=str(tmp_path / "l4"),
                         ckpts_dir=str(tmp_path / "c4"))
    tr = Trainer(cfg, train_ds.store, paths, seed=0)
    tr.fit(max_steps=12, log_every=6, progress=False)
    path = ckpt.latest_checkpoint(paths.ckpts_dir)
    opt_path = path.replace(".npz", ".opt.npz")
    assert os.path.exists(opt_path)

    tr2 = Trainer(cfg, train_ds.store, paths, seed=1, resume_from=path)
    assert int(tr2.state.step) == 12
    # Adam moments restored exactly (not re-initialized to zeros)
    l1 = jax.tree_util.tree_leaves(tr.state.opt_state)
    l2 = jax.tree_util.tree_leaves(tr2.state.opt_state)
    assert len(l1) == len(l2)
    nonzero = 0
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if np.asarray(a).size and np.abs(np.asarray(a)).max() > 0:
            nonzero += 1
    assert nonzero > 0
    # training continues
    tr2.fit(max_steps=14, log_every=2, progress=False)


def test_shape_recovery_on_bumpy_terrain(tmp_path):
    """Non-flat terrain: training with dense depth supervision must recover
    the +/-15 m hill field — DSM MAE well below the bump amplitude (a flat
    prediction would score ~BUMP_AMP/2 ~ 6 m)."""
    from synth_aoi import build_aoi, BUMP_AMP
    aoi = build_aoi(str(tmp_path / "bumpy"), bumpy=True)
    cfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                          scene_loc_stride=2)
    train_ds = SatelliteDataset(cfg, split="train")
    val_ds = SatelliteDataset(cfg, split="val")

    run = _run_cfg(max_train_steps=400)
    paths = TrainerPaths(logs_dir=str(tmp_path / "l"),
                         ckpts_dir=str(tmp_path / "c"),
                         gt_dir=aoi["gt_dir"], aoi_id=aoi["aoi_id"])
    tr = Trainer(run, train_ds.store, paths, val_dataset=val_ds, seed=0)
    tr.fit(max_steps=400, log_every=200, eval_every_n_epochs=1000,
           progress=False)
    scal = tr.validate(epoch=0)
    maes = [v for k, v in scal.items()
            if "mae_" in k and "nr" not in k]
    assert maes, scal
    assert min(maes) < BUMP_AMP / 3.0, (maes, BUMP_AMP)


def test_normal_at_surface_accel(tmp_path):
    """The opt-in surface-normal acceleration trains stably and still
    recovers shape on bumpy terrain.

    Deliberately NOT a surf-vs-exact comparative bound: at 150-300 steps
    the DSM MAE of this config spreads 7-9.2 m across RNG seeds (measured
    over seeds 0-2 at both step counts), so a 1.5x comparison against one
    exact-mode run is seed luck, not fidelity evidence.  The like-for-like
    fidelity claim lives in BASELINE.md's longer-run measurement; here we
    assert stable training, appearance learning, and coarse shape recovery
    with bounds outside the measured seed spread."""
    from synth_aoi import build_aoi, BUMP_AMP
    aoi = build_aoi(str(tmp_path / "nsurf"), bumpy=True)
    cfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                          scene_loc_stride=2)
    train_ds = SatelliteDataset(cfg, split="train")
    val_ds = SatelliteDataset(cfg, split="val")

    mcfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                       layers=4, feat=64, skips=(2,), normal="analystic",
                       func_m=True, func_f=True, func_h=1)
    rcfg = RenderConfig(n_samples=8, guided_samples=8, apply_brdf=True,
                        normal_at_surface=True)
    tcfg = TrainConfig(lr=1e-3, batch_size=256, max_train_steps=150,
                       ds_lambda=10.0, brdf_on=0.0, nr_reg_an_lambda=0.1)

    run_used = RunConfig(model=mcfg, render=rcfg, train=tcfg)
    pth = TrainerPaths(logs_dir=str(tmp_path / "l_surf"),
                       ckpts_dir=str(tmp_path / "c_surf"),
                       gt_dir=aoi["gt_dir"], aoi_id=aoi["aoi_id"])
    tr = Trainer(run_used, train_ds.store, pth, val_dataset=val_ds, seed=0)
    scal0 = tr.validate(epoch=0)
    psnr0 = max(v for k, v in scal0.items() if k.startswith("val/psnr"))
    last = tr.fit(max_steps=150, log_every=150,
                  eval_every_n_epochs=1000, progress=False)
    assert np.isfinite(last["loss"])
    scal = tr.validate(epoch=1)
    psnr1 = max(v for k, v in scal.items() if k.startswith("val/psnr"))
    mae = min(v for k, v in scal.items() if "mae_" in k and "nr" not in k)
    # appearance learns (untrained ~11.5 dB, trained 16-18.6 across seeds)
    assert psnr1 > psnr0 + 2.0, (psnr0, psnr1)
    # shape recovered well below the +/-15 m bump amplitude (seed spread
    # 7-9.2 m at this step count)
    assert mae < BUMP_AMP * 0.75, mae


def test_normal_at_surface_fidelity_bound(tmp_path):
    """Seed-AVERAGED comparative bound on the normal_at_surface DSM
    degradation (the deviation BASELINE.md documents as ~2x MAE on
    high-relief terrain).  A single-seed comparison at this scale is seed
    luck (per-seed surf MAE spreads 5.9-8.1 m; see
    test_normal_at_surface_accel), but the 2-seed MEANS are stable enough
    to bound: measured exact means 3.69-4.11 m (tight), surf means
    6.6-7.7 m, ratios 1.7-2.1 across seed subsets — so a 2.9x bound on
    the mean ratio catches a real fidelity regression of either mode
    while staying outside seed noise."""
    from synth_aoi import build_aoi, BUMP_AMP
    aoi = build_aoi(str(tmp_path / "nsurf_bound"), bumpy=True)
    cfg = SatelliteConfig(root_dir=aoi["root"], aoi_id=aoi["aoi_id"],
                          scene_loc_stride=2)
    train_ds = SatelliteDataset(cfg, split="train")
    val_ds = SatelliteDataset(cfg, split="val")
    mcfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                       layers=4, feat=64, skips=(2,), normal="analystic",
                       func_m=True, func_f=True, func_h=1)
    tcfg = TrainConfig(lr=1e-3, batch_size=256, max_train_steps=150,
                       ds_lambda=10.0, brdf_on=0.0, nr_reg_an_lambda=0.1)

    def mean_mae(surf):
        maes = []
        for seed in (0, 1):
            rcfg = RenderConfig(n_samples=8, guided_samples=8,
                                apply_brdf=True, normal_at_surface=surf)
            pth = TrainerPaths(
                logs_dir=str(tmp_path / f"l_{surf}_{seed}"),
                ckpts_dir=str(tmp_path / f"c_{surf}_{seed}"),
                gt_dir=aoi["gt_dir"], aoi_id=aoi["aoi_id"])
            tr = Trainer(RunConfig(model=mcfg, render=rcfg, train=tcfg),
                         train_ds.store, pth, val_dataset=val_ds, seed=seed)
            tr.fit(max_steps=150, log_every=150, eval_every_n_epochs=1000,
                   progress=False, scan_chunk=16)
            scal = tr.validate(epoch=1)
            maes.append(min(v for k, v in scal.items()
                            if "mae_" in k and "nr" not in k))
        return float(np.mean(maes))

    exact, surf = mean_mae(False), mean_mae(True)
    # exact mode holds its measured band (regression guard on the
    # per-sample-normal path itself)
    assert exact < 5.0, exact
    # the acceleration's degradation stays bounded: a round-5 4-seed
    # PAIRED study measured per-seed ratios 1.44-2.76 (mean 2.07) —
    # the seed spread is intrinsic training noise, so pairing cannot
    # justify a much tighter upper bound; 2.9 = regression alarm.
    assert surf < 2.9 * exact, (surf, exact)
    # LOWER bound (round 5): the exact path being genuinely better is
    # the property under guard — if a regression broke the per-sample
    # normal (ratio -> ~1), this trips.  Measured seed-0/1 mean ratio
    # 2.03, min single-seed ratio 1.44; 1.15 sits well below both.
    assert surf > 1.15 * exact, (surf, exact)
    # and both recover shape well inside the +/-15 m bump amplitude
    assert surf < BUMP_AMP * 0.75, surf
