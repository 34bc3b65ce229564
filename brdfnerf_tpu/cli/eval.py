"""Evaluation CLI: python -m brdfnerf_tpu.cli.eval --logs_dir <logs/exp>
--epoch_number N --split eval (reference eval.py:225-517 semantics).

Reloads opts.json as the config source of truth (eval.py:228-229), loads
the epoch checkpoint, renders every image of the requested split through
the jitted chunked renderer, writes rgb/depth/DSM GeoTIFFs plus registered
DSM diffs (rdsm/, rdsm_diff/), and prints mean PSNR / SSIM / DSM MAE.

Gate semantics on eval: apply_brdf = (brdf_on < 1), apply_theta likewise,
cos_irra = (cos_irra_on < 1) (eval.py:383-384).
"""

from __future__ import annotations

import os
import sys
from typing import Dict

import numpy as np

from . import opts as opts_mod


def find_best_t_for_val_image(tr, sample, psnr_fn, n_vocab: int):
    """Best-PSNR transient-embedding search (eval.py:184-199): render the
    image once per vocab index, score unmasked PSNR, keep the argmax —
    returning the winning render too, so the caller never re-renders."""
    import jax.numpy as jnp
    gt = jnp.asarray(sample["rgbs"].reshape(-1, 3))
    best_t, best_psnr, best_out = 0, -float("inf"), None
    for t in range(n_vocab):
        out = tr.render_image(sample, t=t)
        rgb = jnp.asarray(out.get("rgb_fine", out["rgb_coarse"]))
        p = float(psnr_fn(rgb.reshape(-1, 3), gt))
        if p > best_psnr:
            best_t, best_psnr, best_out = t, p, out
    return best_t, best_psnr, best_out


def evaluate(run_dir: str, epoch_number: int, split: str = "val",
             checkpoints_dir: str = None, output_dir: str = None,
             find_best_t: bool = False, compute_dtype: str = None,
             normal_at_surface: bool = None) -> Dict:
    import jax.numpy as jnp
    from ..train import Trainer, TrainerPaths
    from ..utils import checkpoint as ckpt
    from ..utils.geotiff import write_geotiff, GeoProfile
    from ..metrics import psnr as psnr_m, masked_scores
    from ..geo import dsm as dsm_mod

    args = opts_mod.load_opts(run_dir)
    cfg = opts_mod.to_run_config(args)
    if compute_dtype or normal_at_surface is not None:
        # serving overrides (BASELINE.md "Serving precision"):
        # --compute_dtype int8 runs a bf16/f32-trained checkpoint through
        # the quantized trunk; --normal_at_surface 1 takes one analytic
        # normal per ray at the expected surface
        import dataclasses as dc
        if compute_dtype:
            cfg = dc.replace(cfg, model=dc.replace(
                cfg.model, compute_dtype=compute_dtype))
        if normal_at_surface is not None:
            cfg = dc.replace(cfg, render=dc.replace(
                cfg.render, normal_at_surface=bool(normal_at_surface)))
    out_dir = output_dir or os.path.join(run_dir, f"eval_epoch{epoch_number}")
    os.makedirs(out_dir, exist_ok=True)

    # --split: 'train' renders every training image, anything else the
    # fixed val set (train img 0 + test imgs) (eval.py:238-249)
    ds_split = "train_render" if split == "train" else "val"
    if args.data == "blender":
        from ..data.blender import BlenderDataset
        val_ds = BlenderDataset(
            args.root_dir,
            split=("train" if split == "train" else "val"),
            img_wh=tuple(args.img_wh))
        store = None
    else:
        from ..data.satellite import SatelliteDataset
        sat_cfg = opts_mod.sat_config_from_opts(args)
        val_ds = SatelliteDataset(sat_cfg, split=ds_split)
        store = None

    ckpts_dir = checkpoints_dir or os.path.join(args.ckpts_dir, args.exp_name)
    # native .npz, or a reference-trained Lightning .ckpt converted on load
    ckpt_path = ckpt.resolve_epoch_ckpt(ckpts_dir, epoch_number)

    # trainer used purely as the render harness; params come from the ckpt
    dummy_store = _dummy_store(val_ds)
    paths = TrainerPaths(logs_dir=out_dir, ckpts_dir=ckpts_dir,
                         gt_dir=args.gt_dir, aoi_id=args.aoi_id)
    tr = Trainer(cfg, dummy_store, paths, val_dataset=val_ds, seed=0)
    tr.eval_chunk = int(getattr(args, "chunk", 5120) or 5120)
    # --TestSun_v from the reloaded opts.json forces the sun-vis march
    tr.test_sun_v = bool(getattr(args, "test_sun_v", 0))
    params = ckpt.restore_params(tr.state.params, ckpt_path)
    tr.state = tr.state._replace(params=params)

    psnrs, ssims, maes, maes_nr = [], [], [], []
    # best-PSNR embedding bookkeeping only applies to models that carry a
    # transient t embedding (param 't' from embedding_t, main.py:115)
    search_t = find_best_t and "t" in tr.state.params
    for idx in range(len(val_ds)):
        s = val_ds.get_image(idx)
        t_idx, out = 0, None
        if search_t:
            t_idx, best_p, out = find_best_t_for_val_image(
                tr, s, psnr_m, int(getattr(args, "t_embbeding_vocab", 30)))
            print(f"[eval] best t for image {idx}: {t_idx} "
                  f"(psnr {best_p:.2f})")
        if out is None:
            out = tr.render_image(s, t=t_idx)
        h, w = s["h"], s["w"]
        # score the fine pass when a fine model exists (reference eval typ)
        rgb = out.get("rgb_fine", out["rgb_coarse"]).reshape(h, w, 3)
        gt = s["rgbs"].reshape(h, w, 3)
        mask = s.get("mask")
        mval = jnp.asarray(mask.reshape(h, w, 1)) if mask is not None else None
        rgb_j, gt_j = jnp.asarray(rgb), jnp.asarray(gt)
        # masked + max(gt)-rescaled scoring, reference convention
        # (eval.py:469-471); single implementation in metrics.masked_scores
        sc = masked_scores(rgb_j, gt_j, mval, scl=True)
        p, sv = sc["psnr"], sc["ssim"]
        p_scl, sv_scl = sc["psnr_scl"], sc["ssim_scl"]
        src = s.get("src_id", str(idx))
        # full diagnostic panel stack (eval.py:494-497 save_nerf_output
        # analog): rgb/gt/depth + BRDF parameter / normal / sun maps
        try:
            from ..utils import viz
            panel = viz.render_summary_panels(
                out, gt, h, w,
                visu_scale=float(getattr(args, "visu_scale", 1.0)))
            viz.save_png(os.path.join(out_dir, f"{src}_panels.png"), panel)
        except Exception as e:
            print(f"[eval] panel save failed: {e}")
        write_geotiff(os.path.join(out_dir, f"{src}_rgb.tif"),
                      (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
                      .transpose(2, 0, 1), GeoProfile())
        depth = out.get("depth_fine", out["depth_coarse"])
        write_geotiff(os.path.join(out_dir, f"{src}_depth.tif"),
                      depth.reshape(1, h, w).astype(np.float32), GeoProfile())
        scene = getattr(val_ds, "scene", None)
        if scene is not None:
            roi = (dsm_mod.load_roi(args.gt_dir, args.aoi_id)
                   if args.gt_dir else None)
            dsm, prof = dsm_mod.dsm_from_depth(
                s["rays"], depth, scene, cs=val_ds.cfg.cs,
                utm_zone=val_ds.utm_zone,
                resolution=(float(roi[3]) if roi is not None else 0.5),
                dsm_path=os.path.join(out_dir, "dsm", f"{src}_dsm.tif"))
            if args.gt_dir:
                rep = dsm_mod.mae_report(
                    dsm, prof, args.gt_dir, args.aoi_id,
                    out_dir=os.path.join(out_dir, "rdsm"),
                    src_id=src, epoch_number=epoch_number)
                if s.get("is_val", True) or split == "train":
                    maes.append(rep.mae)
                    maes_nr.append(rep.mae_nr)
        if s.get("is_val", True) or split == "train":
            psnrs.append(p)
            ssims.append(sv)
        print(f"{src}: psnr {p:.2f} ({p_scl:.2f} scl) "
              f"ssim {sv:.3f} ({sv_scl:.3f} scl)"
              + (f" mae {maes[-1]:.2f}" if maes and s.get("is_val", True)
                 else ""))

    result = {"psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
              "ssim": float(np.mean(ssims)) if ssims else float("nan"),
              "mae": float(np.mean(maes)) if maes else float("nan"),
              "mae_nr": float(np.mean(maes_nr)) if maes_nr else float("nan")}
    print(f"mean: psnr {result['psnr']:.2f} ssim {result['ssim']:.3f} "
          f"mae {result['mae']:.3f} mae_nr {result['mae_nr']:.2f}")
    return result


def _dummy_store(val_ds):
    """Minimal ray store so Trainer can initialize without train data."""
    s = val_ds.get_image(0)
    n = 16
    store = {"rays": s["rays"][:n], "rgbs": s["rgbs"][:n],
             "ts": np.zeros(n, np.int32)}
    return store


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = opts_mod.eval_parser().parse_args(argv)
    # reference contract: the run directory is logs_dir/run_id
    # (eval.py:225-228); with no run_id, logs_dir IS the run directory
    run_dir = (os.path.join(args.logs_dir, args.run_id)
               if args.run_id else args.logs_dir)
    evaluate(run_dir, args.epoch_number, split=args.split,
             checkpoints_dir=args.checkpoints_dir,
             output_dir=args.output_dir,
             find_best_t=bool(args.find_best_t),
             compute_dtype=args.compute_dtype,
             normal_at_surface=args.normal_at_surface)
    return 0


if __name__ == "__main__":
    sys.exit(main())
