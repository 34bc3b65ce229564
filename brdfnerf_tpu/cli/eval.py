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
             normal_at_surface: bool = None,
             sun_march_samples: int = None,
             n_devices: int = 0) -> Dict:
    import jax.numpy as jnp
    from ..utils.geotiff import write_geotiff, GeoProfile
    from ..metrics import psnr as psnr_m, masked_scores
    from ..geo import dsm as dsm_mod
    from ..serve import load_renderer

    out_dir = output_dir or os.path.join(run_dir, f"eval_epoch{epoch_number}")
    os.makedirs(out_dir, exist_ok=True)

    # serve.load_renderer: opts.json reload, split dataset ('train' =
    # every training image, eval.py:238-249), checkpoint restore into
    # the render harness, serving overrides (BASELINE.md "Serving
    # precision")
    r = load_renderer(run_dir, epoch_number,
                      checkpoints_dir=checkpoints_dir, split=split,
                      compute_dtype=compute_dtype,
                      normal_at_surface=normal_at_surface,
                      sun_march_samples=sun_march_samples,
                      output_dir=out_dir, n_devices=n_devices)
    args, tr, val_ds = r.args, r.trainer, r.dataset

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
    """Back-compat alias: moved to serve.dummy_store."""
    from ..serve import dummy_store
    return dummy_store(val_ds)


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
             normal_at_surface=args.normal_at_surface,
             sun_march_samples=args.sun_march_samples,
             n_devices=args.n_devices)
    return 0


if __name__ == "__main__":
    sys.exit(main())
