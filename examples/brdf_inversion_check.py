"""BRDF ground-truth inversion study: train the two-stage workload on
synthetic imagery shaded with KNOWN BRDF parameters and measure how
well stage-2 recovers them — for all three published families
(--family rpv / hapke / microfacet).

The full-scale run (BASELINE.md) proves the inversion recovers the
Lambertian LIMIT (k ~ 1, theta ~ 0) from Lambertian imagery; this study
is the stronger converse the reference itself cannot do with real
imagery (no ground truth exists for a real surface's BRDF): the bumpy
synthetic AOI is shaded with I = |sun_z| * BRDF(view, sun, normal;
params*) per pixel through the framework's own BRDF kernels
(brdfnerf_tpu/data/synth_aoi.py {rpv,hapke,microfacet}_radiance), and
the recovered per-pixel parameter / albedo / normal maps are compared
against the generator's ground truth.

Knobs that decide identifiability (measured, BASELINE.md study table):
--n_train >= 6 (golden-angle view/sun spiral: per-point inversion
overdetermined), --normal learned --nr_spv_lambda 1.0 (the BRDF
consumes the supervised grad_from_xyz head instead of sigma-gradient
noise), --hotspot_view (one sun-aligned view so hotspot/specular
parameters — RPV rhoc, Microfacet roughness — become observable).
The defaults reproduce the reference's blessed-but-under-determined
3-view configuration (the recorded negative result).

    python examples/brdf_inversion_check.py [workdir] [--size 512]
        [--steps1 10000] [--steps2 10000] [--family rpv]
        [--n_train 8 --normal learned --nr_spv_lambda 1.0 --hotspot_view]

Reference workload semantics: README.md:97-133 (stage-1 Lambertian
pretrain -> stage-2 BRDF finetune with checkpoint handoff,
--brdf_on 0 --cos_irra_on 0, lr 2.152e-4).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from run_utils import last_epoch_ckpt, run_config


# per-family ground truth, recovered-map keys, and stage-2 CLI flags
FAMILIES = {
    "rpv": dict(
        keys={"k": "rpv_k_coarse", "theta": "rpv_theta_coarse",
              "rhoc": "rpv_rhoc_coarse"},
        flags=["--funcM", "1", "--funcF", "1", "--funcH", "1"]),
    "hapke": dict(
        keys={"b": "hpk_b_coarse", "c": "hpk_c_coarse",
              "theta": "hpk_theta_coarse"},
        flags=["--b", "--c", "--theta"]),
    "microfacet": dict(
        keys={"rough": "roughness_coarse"},
        flags=["--roughness"]),
}


def recovered_maps(run_dir: str, ckpts_dir: str, epoch: int,
                   family: str = "rpv"):
    """Render every val image of the run and return per-image dicts of
    recovered maps: the family's BRDF parameters (weighted-sum),
    albedo_accu, the BRDF-consumed normal (weighted-sum), depth, mask,
    rays, src_id."""
    from brdfnerf_tpu.serve import load_renderer

    ren = load_renderer(run_dir, epoch, checkpoints_dir=ckpts_dir)
    keys = FAMILIES[family]["keys"]

    out = []
    for idx in range(len(ren)):
        s = ren.get_image(idx)
        r = ren.render_image(s)
        missing = [key for key in keys.values() if key not in r]
        if missing:
            raise KeyError(
                f"render output lacks {missing} — was the run trained "
                f"with the '{family}' family's heads active?")
        out.append(dict(
            src_id=s.get("src_id", str(idx)), h=s["h"], w=s["w"],
            rays=s["rays"], mask=s.get("mask"),
            is_val=bool(s.get("is_val", True)),
            params={p: r[key] for p, key in keys.items()},
            albedo=r.get("albedo_accu_coarse"),
            # score the normal the BRDF consumed (normal_lr preferred
            # when present, spsbrdfnerf.py:234-239)
            normal=r.get("normal_lr_coarse", r.get("normal_an_coarse")),
            depth=r.get("depth_coarse"), rgb=r.get("rgb_coarse")))
    return out


def ground_truth_fields(aoi_root: str, src_id: str, h: int, w: int):
    """GT albedo / normal at each pixel's terrain intersection, from the
    generator's own world model (brdfnerf_tpu.data.synth_aoi)."""
    import synth_aoi as sa
    with open(os.path.join(aoi_root, src_id + ".json")) as f:
        rpc_d = json.load(f)["rpc"]
    cols, rows = np.meshgrid(np.arange(w), np.arange(h))
    lon, lat, _alt = sa.intersect_terrain(rpc_d, cols, rows, True)
    albedo = sa.ALB_SCALE * sa.ground_texture(lon, lat)
    normal = sa.terrain_normal(lon, lat, True)
    return albedo.reshape(-1), normal.reshape(-1, 3)


def score(maps, aoi_root: str, gt: dict, val_only: bool = True):
    """Per-image and pooled recovery errors vs the generator ground
    truth, masked to the image footprint.  val_only=False scores the
    TRAIN view(s) instead — where the two-pass geometry is anchored by
    the depth supervision, so parameter maps are weight-summed through
    converged weights (the val view additionally measures novel-view
    geometry, which the blessed 3-view workload does not constrain)."""
    names = sorted(gt)
    rows = []
    pooled = {p: [] for p in names}
    alb_err, nr_err = [], []
    for m in maps:
        if m["is_val"] != val_only:
            continue
        msk = (np.asarray(m["mask"]).reshape(-1) > 0
               if m["mask"] is not None
               else np.ones(m["h"] * m["w"], bool))
        rec = {}
        for p in names:
            v = np.asarray(m["params"][p])[msk].mean(-1)  # tied chans -> 1
            rec[p] = dict(mean=float(v.mean()), std=float(v.std()),
                          gt=float(gt[p]),
                          abs_err=float(abs(v.mean() - gt[p])))
            pooled[p].append(v)
        alb_gt, nr_gt = ground_truth_fields(aoi_root, m["src_id"],
                                            m["h"], m["w"])
        alb = np.asarray(m["albedo"])[msk].mean(-1)
        rec["albedo_mae"] = float(np.abs(alb - alb_gt[msk]).mean())
        nr = np.asarray(m["normal"])[msk]
        nr = nr / np.maximum(np.linalg.norm(nr, axis=-1, keepdims=True),
                             1e-12)
        cosang = np.clip(np.sum(nr * nr_gt[msk], -1), -1, 1)
        rec["normal_mae_deg"] = float(np.degrees(np.arccos(cosang)).mean())
        alb_err.append(rec["albedo_mae"])
        nr_err.append(rec["normal_mae_deg"])
        rows.append({"src_id": m["src_id"], **rec})
    summary = {p: dict(gt=float(gt[p]),
                       recovered_mean=float(np.concatenate(pooled[p]).mean()),
                       recovered_std=float(np.concatenate(pooled[p]).std()),
                       abs_err=float(abs(np.concatenate(pooled[p]).mean()
                                         - gt[p])))
               for p in names}
    summary["albedo_mae"] = float(np.mean(alb_err))
    summary["normal_mae_deg"] = float(np.mean(nr_err))
    return {"per_image": rows, "summary": summary}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/brdfnerf_inversion")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps1", type=int, default=10000)
    ap.add_argument("--steps2", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed for both stages (init + ray "
                         "sampling); the AOI itself is deterministic")
    # model/batch scale knobs (defaults = the flagship 8x512 workload;
    # small values make a CPU smoke of the whole pipeline feasible)
    ap.add_argument("--fc_feat", type=int, default=512)
    ap.add_argument("--fc_layers", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--guided_samples", type=int, default=64)
    ap.add_argument("--n_train", type=int, default=3,
                    help="<= 3 = the reference's blessed fixed 4-entry "
                         "view/sun tables (per-point inversion "
                         "under-determined; the recorded negative "
                         "result); >= 4 (n_train + 1 test > 4) switches "
                         "to the golden-angle view/sun spiral — use >= 6 "
                         "to make the 4-unknown per-point inversion "
                         "overdetermined")
    ap.add_argument("--nr_spv_lambda", type=float, default=0.0,
                    help="normal supervision weight for stage 2 "
                         "(reference capability, 0 in its blessed "
                         "command; the analytic normals the BRDF "
                         "consumes are unsupervised noise without it)")
    ap.add_argument("--hotspot_view", action="store_true",
                    help="align the last train view's sun with its view "
                         "direction (phase angle ~0 at image center) so "
                         "the RPV hotspot factor — and hence rhoc — "
                         "becomes observable")
    ap.add_argument("--normal", default="analystic",
                    choices=["analystic", "learned", "analystic_learned"],
                    help="stage-2 normal mode (opt.py:328-334 derives "
                         "nr_spv_type: analystic->3 supervises the "
                         "sigma-gradient normal; learned->2 supervises "
                         "the grad_from_xyz head, which the BRDF then "
                         "prefers, spsbrdfnerf.py:234-239)")
    ap.add_argument("--family", default="rpv", choices=sorted(FAMILIES),
                    help="BRDF family to shade the imagery with and "
                         "invert: rpv (k/theta/rhoc), hapke (b/c/theta, "
                         "full BRF shell 0) or microfacet (rough — pair "
                         "with --hotspot_view: the 0.04-factor glossy "
                         "lobe is only strong near specular geometry)")
    ap.add_argument("--fit_family", default=None, choices=sorted(FAMILIES),
                    help="BRDF family the MODEL fits (default: same as "
                         "--family). Different = a model-mismatch "
                         "robustness experiment: real surfaces are never "
                         "exactly the assumed BRDF; parameter scoring "
                         "then reports the fitted family's maps against "
                         "the OTHER family's truth only for albedo and "
                         "normals (the parameter tables are skipped)")
    a = ap.parse_args(argv)

    os.makedirs(a.workdir, exist_ok=True)
    from synth_aoi import build_aoi, RPV_GT, HAPKE_GT, MICROFACET_GT

    gt = {"rpv": RPV_GT, "hapke": HAPKE_GT,
          "microfacet": MICROFACET_GT}[a.family]
    fit_family = a.fit_family or a.family
    fam = dict(FAMILIES[fit_family])
    if fit_family == "hapke":
        # generator and trained model must agree on the BRF normalizer
        from synth_aoi import HAPKE_HPK_SCL
        fam["flags"] = fam["flags"] + ["--hpk_scl", str(HAPKE_HPK_SCL)]
    print(f"== building BRDF-shaded AOI ({a.family} gt {gt}) ==",
          flush=True)
    aoi = build_aoi(os.path.join(a.workdir, "aoi"), n_train=a.n_train,
                    n_test=1, bumpy=True, size=a.size, brdf=gt,
                    hotspot_view=a.hotspot_view)
    logs = os.path.join(a.workdir, "logs")
    ckpts = os.path.join(a.workdir, "ckpts")
    common = ["--root_dir", aoi["root"], "--logs_dir", logs,
              "--ckpts_dir", ckpts, "--gt_dir", aoi["gt_dir"],
              "--aoi_id", aoi["aoi_id"], "--mapping",
              "--fc_feat", str(a.fc_feat), "--fc_layers", str(a.fc_layers),
              "--batch_size", str(a.batch_size),
              "--n_samples", str(a.n_samples),
              "--guided_samples", str(a.guided_samples),
              "--ds_lambda", "10",
              "--eval_every_n_epochs", "2",
              "--save_ckpt_every_n_epochs", "2",
              "--seed", str(a.seed)]

    run_config("inv-stage1",
               ["--model", "spsbrdf-nerf", "--exp_name", "inv-stage1",
                "--lr", "5e-4", "--max_train_steps", str(a.steps1)] + common,
               logs, ckpts)
    s1 = last_epoch_ckpt(os.path.join(ckpts, "inv-stage1"))

    res2 = run_config(
        "inv-stage2",
        ["--model", "spsbrdf-nerf", "--exp_name", "inv-stage2",
         "--in_ckpts", s1, "--normal", a.normal,
         "--nr_spv_lambda", str(a.nr_spv_lambda)]
        + fam["flags"]
        + ["--brdf_on", "0", "--cos_irra_on", "0",
           "--lr", "2.152e-4", "--max_train_steps", str(a.steps2)]
        + common,
        logs, ckpts)

    run2 = os.path.join(logs, "inv-stage2")
    ck2 = os.path.join(ckpts, "inv-stage2")
    last = int(os.path.basename(last_epoch_ckpt(ck2))[len("epoch="):-4])
    print(f"== reading recovered parameter maps (epoch {last}) ==",
          flush=True)
    maps = recovered_maps(run2, ck2, last, family=fit_family)
    # model-mismatch runs can only score albedo/normals against truth —
    # the fitted family's parameters have no ground-truth counterpart
    score_gt = gt if fit_family == a.family else {}
    result = score(maps, aoi["root"], score_gt)
    train_sc = score(maps, aoi["root"], score_gt, val_only=False)
    result["train_view"] = {"per_image": train_sc["per_image"],
                            "summary": train_sc["summary"]}
    result["stage2_curve_tail"] = res2["curve"][-3:]
    result["config"] = {"n_train": a.n_train, "size": a.size,
                        "steps1": a.steps1, "steps2": a.steps2,
                        "nr_spv_lambda": a.nr_spv_lambda,
                        "normal": a.normal,
                        "hotspot_view": bool(a.hotspot_view),
                        "seed": a.seed, "family": a.family,
                        "fit_family": fit_family}
    out = os.path.join(a.workdir, "inversion_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["summary"], indent=2))
    print(f"written: {out}")
    return result


if __name__ == "__main__":
    main()
