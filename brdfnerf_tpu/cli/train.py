"""Training CLI: python -m brdfnerf_tpu.cli.train --model spsbrdf-nerf
--exp_name ... --root_dir ... (reference main.py:694-736 semantics).

Dumps opts.json into logs_dir/exp_name for the eval CLI to reload, trains
with the Trainer loop, writes epoch={n}.npz checkpoints.
"""

from __future__ import annotations

import os
import sys

from . import opts as opts_mod


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = opts_mod.postprocess(opts_mod.train_parser().parse_args(argv))
    # fail fast on a bad mesh spec — dataset ingestion below can take
    # minutes, and the mesh isn't built until after it
    n_dev = getattr(args, "n_devices", 0)
    tp = getattr(args, "tp", 1)
    if tp > 1 and (not n_dev or n_dev % tp):
        raise SystemExit(
            f"--tp {tp} needs --n_devices set to a multiple of it "
            f"(got {n_dev})")
    run_dir = os.path.join(args.logs_dir, args.exp_name)
    opts_mod.dump_opts(args, run_dir)
    cfg = opts_mod.to_run_config(args)

    if args.print_debuginfo:
        from ..utils import guards
        guards.enable(True)

    from ..train import Trainer, TrainerPaths

    if args.data == "blender":
        from ..data.blender import BlenderDataset
        train_ds = BlenderDataset(args.root_dir, split="train",
                                  img_wh=tuple(args.img_wh))
        val_ds = BlenderDataset(args.root_dir, split="val",
                                img_wh=tuple(args.img_wh))
        store = train_ds.train_store
        scene = None
    else:
        from ..data.satellite import SatelliteConfig, SatelliteDataset
        sat_cfg = SatelliteConfig(
            root_dir=args.root_dir, img_dir=args.img_dir,
            depth_subdir=args.inputdds, aoi_id=args.aoi_id, cs=args.cs,
            img_downscale=args.img_downscale, scale=args.scale,
            corrscale=args.corrscale, stdscale=args.stdscale,
            margin=args.margin, mod_alt_bound=bool(args.mod_alt_bound),
            infile_postfix=args.infile_postfix,
            cache_dir=args.cache_dir,
            std_quirk=bool(args.std_quirk),
            load_depth=(args.model in ("sps-nerf", "spsbrdf-nerf")),
            sparse_depth=(args.model == "sat-nerf" and args.ds_lambda > 0))
        train_ds = SatelliteDataset(sat_cfg, split="train")
        val_ds = SatelliteDataset(sat_cfg, split="val")
        store = train_ds.store

    mesh = None
    if tp > 1:           # validated against n_dev right after parse above
        from ..parallel.tensor import tp_mesh
        mesh = tp_mesh(n_dev // tp, tp)
    elif n_dev:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(n_dev)

    ckpts_dir = os.path.join(args.ckpts_dir, args.exp_name)
    paths = TrainerPaths(logs_dir=run_dir, ckpts_dir=ckpts_dir,
                         gt_dir=args.gt_dir, aoi_id=args.aoi_id)
    # --eval 1: load in_ckpts fully, freeze ALL parameters (the reference's
    # load mode (c), main.py:91-96 + opt.py:320)
    freeze = ["all"] if args.eval_mode else None
    trainer = Trainer(cfg, store, paths, val_dataset=val_ds, mesh=mesh,
                      seed=args.seed, use_tb=args.tensorboard,
                      in_ckpts=args.in_ckpts, resume_from=args.ckpt_path,
                      depth_store=getattr(train_ds, "depth_store", None),
                      freeze=freeze, visu_scale=args.visu_scale,
                      save_first_n_visu=args.save_first_n_visu,
                      save_visu_every_n_epochs=args.save_visu_every_n_epochs,
                      test_sun_v=bool(args.test_sun_v),
                      sharded_store=bool(getattr(args, "sharded_store", 0)),
                      scale_global_batch=bool(
                          getattr(args, "scale_global_batch", 0)))
    trainer.eval_chunk = args.chunk
    trainer.fit(eval_every_n_epochs=args.eval_every_n_epochs,
                save_ckpt_every_n_epochs=args.save_ckpt_every_n_epochs,
                scan_chunk=args.scan_chunk)
    return 0


if __name__ == "__main__":
    sys.exit(main())
