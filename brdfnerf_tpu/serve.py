"""Serving API: load a trained run for rendering, no training store.

The reference has no serving layer — its eval path rebuilds the model by
hand each time (eval.py:78-105 `load_nerf` + per-script dataset setup).
Here the pattern the CLIs shared (reload opts.json -> RunConfig -> build
the split's dataset -> Trainer as render harness over a dummy store ->
restore the epoch checkpoint) is one call:

    from brdfnerf_tpu.serve import load_renderer
    r = load_renderer(run_dir, epoch_number=40, compute_dtype="int8")
    out = r.render_image(0)          # index into the split, or a sample
    # out["rgb_coarse"], out["depth_coarse"], BRDF parameter maps, ...

Serving overrides mirror the eval CLI: `compute_dtype` (e.g. 'int8' —
quantized trunk, BASELINE.md "Serving precision") and
`normal_at_surface` (one analytic normal per ray, +25% throughput).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Union

import numpy as np


def dummy_store(ds) -> Dict[str, np.ndarray]:
    """Minimal ray store so Trainer can initialize without train data."""
    s = ds.get_image(0)
    n = 16
    return {"rays": s["rays"][:n], "rgbs": s["rgbs"][:n],
            "ts": np.zeros(n, np.int32)}


@dataclass
class Renderer:
    """A trained run loaded for rendering.  `trainer` is the underlying
    render harness (Trainer with restored params); `dataset` the split's
    dataset; `args` the reloaded opts.json namespace; `cfg` the
    RunConfig actually used (serving overrides applied)."""
    args: object
    cfg: object
    dataset: object
    trainer: object

    def __len__(self) -> int:
        return len(self.dataset)

    def get_image(self, idx: int) -> Dict:
        return self.dataset.get_image(idx)

    def render_image(self, sample: Union[int, Dict],
                     t: int = 0) -> Dict[str, np.ndarray]:
        """Render a full image: per-ray rgb/depth plus every weighted-sum
        diagnostic map (albedo, normals, BRDF parameters, sun...)."""
        if isinstance(sample, (int, np.integer)):
            sample = self.dataset.get_image(int(sample))
        return self.trainer.render_image(sample, t=t)


def load_renderer(run_dir: str, epoch_number: int,
                  checkpoints_dir: Optional[str] = None,
                  split: str = "val",
                  compute_dtype: Optional[str] = None,
                  normal_at_surface: Optional[bool] = None,
                  sun_march_samples: Optional[int] = None,
                  output_dir: Optional[str] = None,
                  n_devices: int = 0) -> Renderer:
    """Reload a run's opts.json (the reference contract, eval.py:228-229),
    build the requested split's dataset, and restore the epoch checkpoint
    into a render harness.

    split: 'val' = train img 0 + test imgs; 'train' = every training
    image (eval.py:238-249).  Native epoch={n}.npz checkpoints and
    reference-format Lightning .ckpt files both resolve
    (utils/checkpoint.resolve_epoch_ckpt).

    n_devices > 0: multi-chip serving — a 1-D ray-sharding mesh over
    the first N devices; params replicate, each image's rays shard
    over the mesh (the same sharded/scan render paths dryrun_multichip
    certifies)."""
    import dataclasses as dc

    from .cli import opts as opts_mod
    from .train import Trainer, TrainerPaths
    from .utils import checkpoint as ckpt

    args = opts_mod.load_opts(run_dir)
    cfg = opts_mod.to_run_config(args)
    if compute_dtype:
        allowed = ("float32", "bfloat16", "bfloat16_all", "int8")
        if compute_dtype not in allowed:
            # _linear's dtype ladder silently falls through to f32 for
            # unknown strings — reject here so a typo ('bf16', 'fp8')
            # can't masquerade as a quantized-serving A/B
            raise ValueError(f"compute_dtype={compute_dtype!r} not in "
                             f"{allowed}")
        cfg = dc.replace(cfg, model=dc.replace(
            cfg.model, compute_dtype=compute_dtype))
    if normal_at_surface is not None:
        cfg = dc.replace(cfg, render=dc.replace(
            cfg.render, normal_at_surface=bool(normal_at_surface)))
    if sun_march_samples is not None:
        cfg = dc.replace(cfg, render=dc.replace(
            cfg.render, sun_march_samples=int(sun_march_samples)))

    if args.data == "blender":
        from .data.blender import BlenderDataset
        ds = BlenderDataset(args.root_dir,
                            split=("train" if split == "train" else "val"),
                            img_wh=tuple(args.img_wh))
    else:
        from .data.satellite import SatelliteDataset
        ds = SatelliteDataset(
            opts_mod.sat_config_from_opts(args),
            split=("train_render" if split == "train" else "val"))

    ckpts_dir = checkpoints_dir or os.path.join(args.ckpts_dir,
                                                args.exp_name)
    ckpt_path = ckpt.resolve_epoch_ckpt(ckpts_dir, epoch_number)

    mesh = None
    if n_devices:
        import jax
        from .parallel.mesh import make_mesh
        if jax.device_count() < n_devices:
            raise ValueError(
                f"n_devices={n_devices} but only {jax.device_count()} "
                f"device(s) visible — a silently smaller mesh would "
                f"serve at a fraction of the expected rate")
        mesh = make_mesh(n_devices)

    paths = TrainerPaths(logs_dir=output_dir or run_dir,
                         ckpts_dir=ckpts_dir,
                         gt_dir=args.gt_dir, aoi_id=args.aoi_id)
    tr = Trainer(cfg, dummy_store(ds), paths, val_dataset=ds, seed=0,
                 mesh=mesh)
    tr.eval_chunk = int(getattr(args, "chunk", 5120) or 5120)
    tr.test_sun_v = bool(getattr(args, "test_sun_v", 0))
    tr.state = tr.state._replace(
        params=ckpt.restore_params(tr.state.params, ckpt_path))
    return Renderer(args=args, cfg=cfg, dataset=ds, trainer=tr)
