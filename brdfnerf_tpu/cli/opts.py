"""Flag definitions + opts.json round-trip (reference: opt.py:10-355).

Training dumps opts.json into the run directory; eval reloads it as the
source of truth (opt.py:349-351, eval.py:228-229).  Flag names/defaults
match the reference so run scripts port unchanged; flags are mapped onto
the static RunConfig dataclasses that drive XLA specialization.

Reference post-processing reproduced (opt.py:328-351): nr_spv_type derived
from --normal; fc_feat_ref defaults to fc_feat; sc_lambda zeroed unless
sun_v == 'learned'; exp_name required.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

from ..config import (ModelConfig, RenderConfig, TrainConfig, RunConfig,
                      derive_nr_spv_type)


def train_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="brdfnerf_tpu training")
    # paths (opt.py:127-151)
    p.add_argument("--root_dir", type=str, required=True)
    p.add_argument("--img_dir", type=str, default=None)
    p.add_argument("--ckpts_dir", type=str, default="ckpts")
    p.add_argument("--logs_dir", type=str, default="logs")
    p.add_argument("--gt_dir", type=str, default=None)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--in_ckpts", type=str, default=None)
    p.add_argument("--exp_name", type=str, required=True)
    # core training (opt.py:152-184)
    p.add_argument("--gpu_id", type=int, default=1)
    p.add_argument("--model", type=str, default="spsbrdf-nerf",
                   choices=["nerf", "s-nerf", "sat-nerf", "sps-nerf",
                            "spsbrdf-nerf"])
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--img_downscale", type=float, default=1.0)
    p.add_argument("--max_train_steps", type=int, default=300000)
    p.add_argument("--save_ckpt_every_n_epochs", type=int, default=1)
    p.add_argument("--eval_every_n_epochs", type=int, default=1)
    p.add_argument("--scan_chunk", type=int, default=None,
                   help="TPU loop acceleration: dispatch N fused train "
                        "steps per host round-trip via lax.scan (same "
                        "trajectory; chunks clamp at epoch/phase "
                        "boundaries). 1 = one dispatch per step; unset "
                        "falls back to $BRDFNERF_SCAN_CHUNK, then 1")
    p.add_argument("--fc_feat", type=int, default=512)
    p.add_argument("--fc_layers", type=int, default=8)
    p.add_argument("--n_samples", type=int, default=64)
    p.add_argument("--n_importance", type=int, default=0)
    p.add_argument("--noise_std", type=float, default=0.0)
    p.add_argument("--chunk", type=int, default=1024 * 5)
    p.add_argument("--data", type=str, default="sat",
                   choices=["sat", "blender"])
    # loss weights (opt.py:186-245)
    p.add_argument("--lambda_rgb", type=float, default=1.0)
    p.add_argument("--sc_lambda", type=float, default=0.0)
    p.add_argument("--ds_lambda", type=float, default=0.0)
    p.add_argument("--ds_drop", type=float, default=1.0)
    p.add_argument("--ds_noweights", action="store_true")
    p.add_argument("--first_beta_epoch", type=int, default=2)
    p.add_argument("--t_embbeding_tau", type=int, default=4)
    p.add_argument("--t_embbeding_vocab", type=int, default=30)
    p.add_argument("--beta", action="store_true")
    p.add_argument("--mapping", action="store_true")
    p.add_argument("--GNLL", "--gnll", dest="gnll", action="store_true")
    p.add_argument("--usealldepth", action="store_true")
    p.add_argument("--guided_samples", type=int, default=64)
    p.add_argument("--margin", type=float, default=0.0001)
    p.add_argument("--stdscale", type=float, default=1.0)
    p.add_argument("--corrscale", type=float, default=1.0)
    p.add_argument("--siren", type=int, default=1)
    # reference: type=int default=1 (opt.py:323); nargs='?' keeps the
    # bare --mod_alt_bound spelling working too
    p.add_argument("--mod_alt_bound", type=int, nargs="?", const=1,
                   default=1)
    p.add_argument("--sun_v", type=str, default="none",
                   choices=["none", "analystic", "learned"])
    p.add_argument("--indirect_light", action="store_true")
    p.add_argument("--normal", type=str, default="none",
                   choices=["none", "analystic", "learned",
                            "analystic_learned"])
    p.add_argument("--nr_reg_an_lambda", type=float, default=0.0)
    p.add_argument("--nr_reg_lr_lambda", type=float, default=0.0)
    p.add_argument("--nr_spv_lambda", type=float, default=0.0)
    p.add_argument("--nr_spv_type", type=int, default=0)
    p.add_argument("--hs_lambda", type=float, default=0.0)
    p.add_argument("--brdf_on", type=float, default=1.0)
    p.add_argument("--nrrg_on", type=float, default=0.0)
    p.add_argument("--cos_irra_on", type=float, default=1.0)
    p.add_argument("--gsam_only_on", type=float, default=1.0)
    p.add_argument("--gsam_only", action="store_true")
    # BRDF (opt.py:261-309)
    p.add_argument("--MultiBRDF", dest="multi_brdf", type=int, default=0)
    p.add_argument("--roughness", action="store_true")
    p.add_argument("--pretrain_normal", action="store_true",
                   help="parsed for script compatibility; inert in the "
                        "reference too (opt.py:305 has no consumer)")
    p.add_argument("--toyBRDF", dest="toy_brdf", action="store_true",
                   help="reference debug visualization (manual normal/"
                        "roughness in val images, main.py:557); parsed but "
                        "not implemented here")
    p.add_argument("--glossy_scale", type=float, default=1.0)
    p.add_argument("--fresnel_f0", "--f0", dest="f0", type=float,
                   default=0.04)
    p.add_argument("--shell_hapke", type=int, default=0)
    p.add_argument("--hpk_scl", type=float, default=4.0)
    p.add_argument("--b", dest="hapke_b", action="store_true")
    p.add_argument("--c", dest="hapke_c", action="store_true")
    p.add_argument("--B0", dest="hapke_b0", action="store_true")
    p.add_argument("--h", dest="hapke_h", action="store_true")
    p.add_argument("--theta", dest="hapke_theta", action="store_true")
    p.add_argument("--funcM", dest="func_m", type=int, default=0)
    p.add_argument("--funcF", dest="func_f", type=int, default=0)
    p.add_argument("--funcH", dest="func_h", type=int, default=0)
    p.add_argument("--dim_RPV", dest="dim_rpv", type=int, default=1)
    p.add_argument("--input_viewdir", type=int, default=0)
    # reflectance-encoder flags: parsed by the reference (opt.py:312-315)
    # but consumed NOWHERE in its model code — kept here with the same
    # parse-only behavior (postprocess defaults fc_feat_ref to fc_feat,
    # opt.py:334-335) so run scripts port unchanged
    p.add_argument("--fc_feat_ref", type=int, default=0)
    p.add_argument("--fc_layers_ref", type=int, default=0)
    p.add_argument("--eval", dest="eval_mode", type=int, default=0,
                   help="1 = load in_ckpts fully and freeze ALL parameters "
                        "(reference load mode (c), main.py:91-96)")
    # dataset details
    p.add_argument("--aoi_id", type=str, default="Dji_012")
    p.add_argument("--cs", type=str, default="utm", choices=["utm", "ecef"])
    p.add_argument("--inputdds", type=str, default="DenseDepth_ZM4")
    # reference default is "" with ".txt" appended in postprocess
    # (opt.py:343)
    p.add_argument("--infile_postfix", type=str, default="")
    p.add_argument("--scale", type=float, default=1.0 / 255.0)
    p.add_argument("--std_range", "--dRange", dest="std_range", type=float,
                   default=3.0)
    p.add_argument("--use_disp", action="store_true")
    p.add_argument("--img_wh", type=int, nargs=2, default=(400, 400))
    p.add_argument("--std_quirk", type=int, default=1,
                   help="reproduce the reference's zero-std GT-delta "
                        "guided sampling (satellite_rgb_dep.py:407-408)")
    p.add_argument("--normal_at_surface", action="store_true",
                   help="TPU acceleration: analytic normal once per ray at "
                        "the expected surface (~1.8x step speedup; deviates "
                        "from reference per-sample-normal semantics)")
    p.add_argument("--fast_sin", type=int, default=1,
                   help="polynomial siren activation (1.7e-5 abs err); "
                        "0 = exact jnp.sin for strict parity")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16", "bfloat16_all"],
                   help="matmul compute dtype (ModelConfig.compute_dtype). "
                        "'bfloat16' = bf16 MXU matmuls with f32 "
                        "accumulation/activations; 'bfloat16_all' also "
                        "keeps activations bf16 (the TPU production "
                        "setting bench.py measures)")
    p.add_argument("--fused_trunk", type=int, default=None,
                   help="fused custom-VJP Pallas trunk for analytic-normal "
                        "configs (semantics-equivalent, gradient-parity "
                        "tested; 18.1k -> 22.8k rays/s on v5e). Default: "
                        "on for TPU backends, off on CPU (interpret mode "
                        "is slow)")
    p.add_argument("--use_pallas", type=int, default=None,
                   help="fused forward Pallas kernel for the stop-grad "
                        "sigma passes; same backend-dependent default")
    # visualization / logging cadence (opt.py:164-167,246-250,267-268,298)
    p.add_argument("--visu_scale", type=float, default=1.0,
                   help="brightness multiplier on rgb/gt/albedo panels")
    p.add_argument("--save_visu_every_n_epochs", type=int, default=1)
    p.add_argument("--save_file_every_n_epochs", type=int, default=-1)
    p.add_argument("--save_first_n_visu", type=int, default=0)
    p.add_argument("--TestNormal", dest="test_normal", type=int, default=0,
                   choices=[0, 1])
    p.add_argument("--TestSun_v", dest="test_sun_v", type=int, default=0,
                   choices=[0, 1])
    p.add_argument("--print_debuginfo", action="store_true",
                   help="enable the NaN-guard debug layer (utils.guards)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--n_devices", type=int, default=0,
                   help="data-parallel devices (0 = single device; N builds "
                        "a 1-D ray-sharding mesh over the first N devices)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel width: with --n_devices N and "
                        "--tp T, builds a 2-D (data=N/T, model=T) mesh and "
                        "shards the trunk Megatron-style over the 'model' "
                        "axis (parallel/tensor.py; pays only when the "
                        "per-device batch or model no longer fits — see "
                        "BASELINE.md 'Tensor parallelism: memory "
                        "economics')")
    p.add_argument("--sharded_store", type=int, default=0, choices=[0, 1],
                   help="shard the device ray store over the mesh 'data' "
                        "axis (1/N of the rays + HBM per device, per-shard "
                        "stratified minibatch draws) instead of "
                        "replicating it; needs --n_devices > 1")
    p.add_argument("--scale_global_batch", type=int, default=0,
                   choices=[0, 1],
                   help="N-chip scaled-batch data parallelism: global "
                        "batch = batch_size * n_devices (per-device batch "
                        "stays at batch_size) with linear lr scaling")
    p.add_argument("--lr_warmup_steps", type=int, default=0,
                   help="linear lr warmup steps from lr/10 (0 = off, the "
                        "default; -1 = two epochs; positive = explicit "
                        "count). Opt-in even under --scale_global_batch: "
                        "the measured lr-rule grid (BASELINE.md) found "
                        "warmup costs ~2 dB at equal epochs at the tested "
                        "horizon; reach for it only if the linearly "
                        "scaled lr destabilizes on a larger mesh")
    p.add_argument("--sun_march_samples", type=int, default=0,
                   help="analytic sun-visibility march sample count: 0 = "
                        "reference intent (N_samples; rendering.py:251-253 "
                        "marches N_samples and this framework fixes its "
                        "downstream shape error by resampling the "
                        "transparency onto the final axis); -1 = the merged "
                        "final count (rounds 1-3 behavior, ~2x the march "
                        "FLOPs); any positive int = explicit count")
    return p


def eval_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="brdfnerf_tpu evaluation")
    # (reference Test_parser, opt.py:10-29)
    p.add_argument("--run_id", type=str, default=None)
    p.add_argument("--logs_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--epoch_number", type=int, required=True)
    p.add_argument("--split", type=str, default="val",
                   help="'val' = train img 0 + test imgs; 'train' = render "
                        "every training image (eval.py:238-249)")
    p.add_argument("--infile_postfix", type=str, default="")
    p.add_argument("--checkpoints_dir", type=str, default=None)
    p.add_argument("--find_best_t", type=int, default=0,
                   help="search the t-embedding vocab per val image and "
                        "score with the best-PSNR index instead of the "
                        "predefined t=0 (eval.py:184-199,215)")
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["float32", "bfloat16", "bfloat16_all", "int8"],
                   help="override the run's training compute_dtype for "
                        "this evaluation; 'int8' runs the (siren, mapped) "
                        "trunk through the int8 MXU path — serving-only, "
                        "pair with --normal_at_surface-trained or accept "
                        "bf16 gradients for per-sample analytic normals")
    p.add_argument("--normal_at_surface", type=int, default=None,
                   help="override the run's normal_at_surface for this "
                        "evaluation (1/0). One analytic normal per ray at "
                        "the expected surface: +25%% serving throughput "
                        "(93.6k vs 74.7k rays/s flagship, BASELINE.md), "
                        "rgb mean|dev| ~0.03 vs per-sample semantics — "
                        "serving accel, not a metrics-parity mode")
    p.add_argument("--sun_march_samples", type=int, default=None,
                   help="override the run's sun-visibility march sample "
                        "count for this evaluation (0 = reference intent "
                        "N_samples; -1 = merged final count — what "
                        "pre-knob runs trained with and what their "
                        "reloaded opts.json defaults to; positive = "
                        "explicit count)")
    p.add_argument("--n_devices", type=int, default=0,
                   help="multi-chip serving: shard each image's rays over "
                        "a 1-D mesh of the first N devices (params "
                        "replicate; same sharded/scan render paths the "
                        "multichip dryrun certifies). 0 = single device")
    return p


def postprocess(args: argparse.Namespace) -> argparse.Namespace:
    args.nr_spv_type = derive_nr_spv_type(args.normal, args.nr_spv_type)
    if args.sun_v != "learned":
        args.sc_lambda = 0.0                      # opt.py:339-341
    if not args.infile_postfix.endswith(".txt"):
        args.infile_postfix += ".txt"             # opt.py:343
    if getattr(args, "fc_feat_ref", 0) == 0:
        args.fc_feat_ref = args.fc_feat           # opt.py:334-335
    if getattr(args, "eval_mode", 0) and not args.in_ckpts:
        raise SystemExit(
            "--eval 1 requires --in_ckpts (main.py:91-92). If you meant "
            "the validation cadence, spell out --eval_every_n_epochs.")
    return args


def _backend_default(v):
    """None -> enable the fused Pallas paths on real accelerators only
    (interpret mode on CPU is correct but slow)."""
    if v is not None:
        return v
    import jax
    return jax.default_backend() != "cpu"


def to_run_config(args: argparse.Namespace) -> RunConfig:
    mcfg = ModelConfig(
        variant=args.model, layers=args.fc_layers, feat=args.fc_feat,
        siren=bool(args.siren), mapping=bool(args.mapping),
        input_viewdir=bool(args.input_viewdir), beta=args.beta,
        t_embedding_vocab=args.t_embbeding_vocab,
        t_embedding_tau=args.t_embbeding_tau,
        sun_v=args.sun_v, indirect_light=args.indirect_light,
        normal=args.normal, roughness=args.roughness,
        func_m=bool(args.func_m), func_f=bool(args.func_f),
        func_h=args.func_h, dim_rpv=args.dim_rpv,
        hapke_b=args.hapke_b, hapke_c=args.hapke_c,
        hapke_theta=args.hapke_theta, hapke_h=args.hapke_h,
        hapke_b0=args.hapke_b0, shell_hapke=args.shell_hapke,
        hpk_scl=args.hpk_scl, glossy_scale=args.glossy_scale,
        fresnel_f0=args.f0, multi_brdf=bool(args.multi_brdf),
        fast_sin=bool(getattr(args, "fast_sin", 1)),
        compute_dtype=getattr(args, "compute_dtype", "float32"))
    brdf_requested = (args.roughness or args.func_m or args.func_f
                      or args.func_h or args.hapke_b or args.shell_hapke)
    rcfg = RenderConfig(
        n_samples=args.n_samples, n_importance=args.n_importance,
        guided_samples=args.guided_samples, use_disp=args.use_disp,
        noise_std=args.noise_std, std_range=args.std_range,
        stdscale=args.stdscale, margin=args.margin,
        apply_brdf=bool(brdf_requested and args.brdf_on < 1.0),
        apply_theta=bool(brdf_requested and args.brdf_on < 0.5),
        gsam_only=args.gsam_only,
        sun_march_samples=getattr(args, "sun_march_samples", 0),
        normal_at_surface=bool(getattr(args, "normal_at_surface", False)),
        fused_trunk=bool(_backend_default(
            getattr(args, "fused_trunk", None))),
        use_pallas=bool(_backend_default(
            getattr(args, "use_pallas", None))),
        use_sat_sun=(args.data == "sat"))
    tcfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size,
        max_train_steps=args.max_train_steps,
        lambda_rgb=args.lambda_rgb, sc_lambda=args.sc_lambda,
        ds_lambda=args.ds_lambda, ds_drop=args.ds_drop,
        ds_noweights=args.ds_noweights, gnll=args.gnll,
        usealldepth=args.usealldepth,
        nr_reg_an_lambda=args.nr_reg_an_lambda,
        nr_reg_lr_lambda=args.nr_reg_lr_lambda,
        nr_spv_lambda=args.nr_spv_lambda, nr_spv_type=args.nr_spv_type,
        lr_warmup_steps=getattr(args, "lr_warmup_steps", 0),
        hs_lambda=args.hs_lambda, first_beta_epoch=args.first_beta_epoch,
        brdf_on=args.brdf_on, nrrg_on=args.nrrg_on,
        cos_irra_on=args.cos_irra_on, gsam_only_on=args.gsam_only_on)
    return RunConfig(model=mcfg, render=rcfg, train=tcfg)


def dump_opts(args: argparse.Namespace, run_dir: str) -> str:
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "opts.json")
    with open(path, "w") as f:
        json.dump(vars(args), f, indent=2)
    return path


def load_opts(run_dir: str) -> argparse.Namespace:
    """eval.py:228-229: reload opts.json as the config source of truth."""
    with open(os.path.join(run_dir, "opts.json")) as f:
        d = json.load(f)
    # Back-compat: runs recorded before --sun_march_samples existed
    # trained (and validated) with the march at the merged final count —
    # today's spelling -1, NOT today's default 0 (= N_samples).  Filling
    # the legacy value here keeps their re-evaluation bit-true to the
    # behavior the checkpoint was trained with; fresh runs always dump
    # the key.
    d.setdefault("sun_march_samples", -1)
    return argparse.Namespace(**d)


def sat_config_from_opts(args: argparse.Namespace):
    """SatelliteConfig from a run's (re)loaded opts — ONE place for the
    dataset-affecting fields so eval / create_dsm / brf_probe rebuild the
    exact dataset the run trained on (a subset here once silently dropped
    infile_postfix, probing a different split than was trained)."""
    from ..data.satellite import SatelliteConfig
    return SatelliteConfig(
        root_dir=args.root_dir, img_dir=args.img_dir,
        depth_subdir=args.inputdds, aoi_id=args.aoi_id, cs=args.cs,
        img_downscale=args.img_downscale, scale=args.scale,
        corrscale=args.corrscale, stdscale=args.stdscale,
        margin=args.margin, mod_alt_bound=args.mod_alt_bound,
        infile_postfix=args.infile_postfix,
        cache_dir=args.cache_dir,
        std_quirk=bool(getattr(args, "std_quirk", 1)),
        load_depth=(args.model in ("sps-nerf", "spsbrdf-nerf")))
