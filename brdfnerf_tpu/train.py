"""Host training driver: schedule gates, compiled-step specialization,
validation, checkpointing.

Replaces the reference's Lightning module + Trainer (main.py:31-736) with a
plain loop around ONE jitted train step.  Dynamic schedule gates
(step-vs-threshold booleans, main.py:60-63,202-230) feed the compiled step;
the two gates that change program *structure* (apply_brdf at
brdf_on*max_steps, apply_theta at 2*brdf_on*max_steps, main.py:202-210)
swap between at most three compiled specializations.

Validation renders full images through a fixed-size chunked jitted render
step (pad-last-chunk, device-resident; replaces the host chunk loop at
main.py:120-141), then computes PSNR/SSIM and the DSM MAE chain.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .config import RunConfig, RenderConfig
from .data.batcher import RayBatcher, DeviceRayBatcher
from .parallel.train_step import (TrainGates, TrainState, create_train_state,
                                  make_train_step, make_render_step,
                                  make_optimizer)
from .utils import checkpoint as ckpt
from .metrics import masked_scores
from .geo import dsm as dsm_mod


@dataclass
class TrainerPaths:
    logs_dir: str
    ckpts_dir: str
    gt_dir: Optional[str] = None
    aoi_id: str = ""


class ScalarLog:
    """JSONL scalar logger (+ optional TensorBoard when torch is present)."""

    def __init__(self, logs_dir: str, use_tb: bool = False):
        os.makedirs(logs_dir, exist_ok=True)
        self.f = open(os.path.join(logs_dir, "scalars.jsonl"), "a")
        self.tb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(logs_dir)
            except Exception:
                self.tb = None

    def log(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)

    def log_image(self, step: int, tag: str, img_hw3_uint8):
        """TensorBoard image grid (main.py:680-685 add_images analog);
        no-op without a TB writer (the PNG on disk is always written)."""
        if self.tb is not None:
            self.tb.add_image(tag, img_hw3_uint8, step, dataformats="HWC")


def batch_to_device(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()}


class Trainer:
    def __init__(self, cfg: RunConfig, train_store: Dict[str, np.ndarray],
                 paths: TrainerPaths, val_dataset=None,
                 mesh=None, seed: int = 0, use_tb: bool = False,
                 freeze: Optional[List[str]] = None,
                 in_ckpts: Optional[str] = None,
                 resume_from: Optional[str] = None,
                 depth_store: Optional[Dict[str, np.ndarray]] = None,
                 visu_scale: float = 1.0,
                 save_first_n_visu: int = 0,
                 save_visu_every_n_epochs: int = 1,
                 test_sun_v: bool = False,
                 sharded_store: bool = False,
                 scale_global_batch: bool = False):
        """sharded_store (mesh only): shard the device ray store over the
        'data' axis (1/D of the rays — and HBM — per device) with
        per-shard stratified index draws, instead of replicating it; see
        data/batcher.ShardedRayBatcher.  scale_global_batch (mesh only):
        the N-chip scaled-batch mode — global batch becomes
        batch_size * n_devices (each device keeps the single-chip
        per-device batch) and the learning rate scales LINEARLY with the
        same factor (Goyal et al. linear-scaling rule; per-epoch StepLR
        cadence is preserved automatically because steps_per_epoch
        shrinks by the same factor)."""
        self.cfg = cfg
        self.paths = paths
        self.val_dataset = val_dataset
        self.mesh = mesh
        self.log = ScalarLog(paths.logs_dir, use_tb)
        os.makedirs(paths.ckpts_dir, exist_ok=True)

        # the batch-scaling factor is the DATA-parallel width, not the
        # whole mesh: on a 2-D (data, model) mesh the model axis
        # replicates the batch, so scaling by mesh.size would over-scale
        # batch and lr by the TP factor
        if scale_global_batch and mesh is not None:
            from .parallel.tensor import data_axis_size
            k = data_axis_size(mesh)
        else:
            k = 1
        if k > 1:
            import dataclasses as _dc
            cfg = _dc.replace(cfg, train=_dc.replace(
                cfg.train, batch_size=cfg.train.batch_size * k,
                lr=cfg.train.lr * k))
            self.cfg = cfg
            warm = cfg.train.lr_warmup_steps
            print(f"[mesh] scaled global batch: {cfg.train.batch_size} "
                  f"rays/step ({k} devices), lr -> {cfg.train.lr:.3e}"
                  + (f", lr warmup {'2 epochs' if warm == -1 else warm}"
                     if warm not in (0, -2) else ""))
        tcfg = cfg.train
        # observability guard: fitting hotspot-gated BRDF parameters
        # (RPV rhoc, Hapke c) on geometry that never samples the hotspot
        # leaves them at their priors — warn up front (inversion study,
        # BASELINE.md)
        if "rays" in train_store:
            from .analysis import warn_unobservable_brdf_params
            warn_unobservable_brdf_params(train_store["rays"], cfg.model,
                                          once=True)
        batch_keys = [k for k in ("rays", "rgbs", "ts", "depths",
                                  "valid_depth", "depth_std", "normals",
                                  "valid_normal") if k in train_store]
        # fused loop (default): store lives on device — replicated over the
        # mesh when one is given — and each step's minibatch gather happens
        # inside the jitted train step; only the index vector crosses H2D.
        # Escape hatch BRDFNERF_NO_FUSED_LOOP=1 restores the host-gather
        # loop (RayBatcher + shard_batch placement on the mesh path).
        # "0"/"" = fused (default), anything else = host-gather loop —
        # same =0-means-off convention as BRDFNERF_COMPILE_CACHE
        self.fused_loop = os.environ.get(
            "BRDFNERF_NO_FUSED_LOOP", "0") in ("", "0")
        self.sharded_store = bool(sharded_store and mesh is not None
                                  and self.fused_loop)
        if sharded_store and not self.sharded_store:
            print("[mesh] sharded_store ignored: needs a mesh and the "
                  "fused loop", flush=True)
        self._store_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._store_sharding = NamedSharding(mesh, PartitionSpec())
        if self.fused_loop:
            def batcher_cls(arrays, bs, seed):
                return DeviceRayBatcher(arrays, bs, seed=seed,
                                        sharding=self._store_sharding)
        else:
            batcher_cls = RayBatcher if mesh is not None else DeviceRayBatcher
        if self.sharded_store:
            from .data.batcher import ShardedRayBatcher
            self.batcher = ShardedRayBatcher(
                {k: train_store[k] for k in batch_keys},
                tcfg.batch_size, mesh, seed=seed)
        else:
            self.batcher = batcher_cls(
                {k: train_store[k] for k in batch_keys},
                tcfg.batch_size, seed=seed)
        # sat-nerf keypoint depth: a second batcher over the tie-point store;
        # each step's batch carries a kp_* sub-batch for the extra forward
        # pass in compute_losses (reference main.py:177-183 second loader,
        # same batch size, sat-nerf only)
        self.depth_batcher = None
        if (depth_store is not None and tcfg.ds_lambda > 0
                and cfg.model.variant == "sat-nerf"):
            n_kp = depth_store["rays"].shape[0]
            kp_bs = min(tcfg.batch_size, n_kp)
            kp_store = {"rays": depth_store["rays"],
                        "depths": depth_store["depths"],
                        "ts": depth_store["ts"]}
            if mesh is not None:
                # shard_batch splits axis 0 over the mesh — keep the
                # keypoint sub-batch divisible by the device count.  With
                # fewer tie points than devices, tile the store up so a
                # full device-multiple batch exists (tiny stores only).
                n_dev = int(mesh.size)
                if n_kp < n_dev:
                    reps = -(-n_dev // n_kp)
                    kp_store = {k: np.concatenate([v] * reps, 0)
                                for k, v in kp_store.items()}
                    kp_bs = n_dev
                else:
                    # n_kp >= n_dev guarantees a full device-multiple batch
                    kp_bs = max(n_dev, kp_bs - kp_bs % n_dev)
            self.depth_batcher = batcher_cls(kp_store, kp_bs, seed=seed + 7)
        self.steps_per_epoch = self.batcher.steps_per_epoch
        self.max_steps = tcfg.max_train_steps

        key = jax.random.PRNGKey(seed)
        self.state, self.opt = create_train_state(
            key, cfg.model, tcfg, self.steps_per_epoch,
            n_importance=cfg.render.n_importance)
        if freeze:
            mask = ckpt.freeze_mask(self.state.params, freeze)
            labels = jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", mask)
            base, _ = make_optimizer(tcfg, self.steps_per_epoch)
            self.opt = optax.multi_transform(
                {"train": base, "freeze": optax.set_to_zero()}, labels)
            self.state = TrainState(self.state.params,
                                    self.opt.init(self.state.params),
                                    self.state.step)
        if in_ckpts:
            if freeze and "all" in freeze:
                # --eval load mode (c): restore EVERYTHING, all frozen
                # (main.py:91-96)
                include = None
            else:
                # two-stage handoff: trunk + sigma + feats (+ rgb unless
                # Hapke)
                include = ckpt.handoff_include("coarse", cfg.model.hapke_b)
            params = ckpt.restore_params(self.state.params, in_ckpts,
                                         include=include)
            if include is None:
                # freeze-all eval: every template parameter must come from
                # the checkpoint — frozen random-init heads would silently
                # produce garbage metrics
                ck_keys = set(ckpt.load_flat(in_ckpts))
                missing = [k for k in ckpt._flatten(self.state.params)
                           if k not in ck_keys]
                if missing:
                    raise ValueError(
                        f"--eval in_ckpts {in_ckpts} is missing "
                        f"{len(missing)} parameters of this model config "
                        f"(e.g. {missing[:3]}); a freeze-all evaluation "
                        f"needs a checkpoint from the same config")
            self.state = TrainState(params, self.opt.init(params),
                                    self.state.step)
            print(f"[handoff] restored {include or 'ALL'} from {in_ckpts}")
        if resume_from:
            params = ckpt.restore_params(self.state.params, resume_from)
            step = ckpt.checkpoint_step(resume_from)
            opt_state = self.opt.init(params)
            opt_path = resume_from.replace(".npz", ".opt.npz")
            if os.path.exists(opt_path):
                try:
                    opt_state = ckpt.restore_opt_state(opt_state, opt_path)
                except ValueError as e:
                    print(f"[resume] optimizer state not restored: {e}")
            self.state = TrainState(params, opt_state,
                                    jnp.asarray(step, jnp.int32))
            print(f"[resume] step {step} from {resume_from}")

        # schedule thresholds (fractions of max_steps, main.py:60-63)
        self.t_brdf = tcfg.brdf_on * self.max_steps
        self.t_theta = 2.0 * tcfg.brdf_on * self.max_steps
        self.t_nrrg = tcfg.nrrg_on * self.max_steps
        self.t_cos_irra = tcfg.cos_irra_on * self.max_steps
        self.t_gsam_only = tcfg.gsam_only_on * self.max_steps
        self.t_ds_drop = tcfg.ds_drop * self.max_steps

        # mesh placement: replicate on the 1-D data-parallel mesh; on a
        # 2-D (data, model) mesh the trunk shards Megatron-style over the
        # 'model' axis (parallel/tensor.py) and every step/render fn below
        # receives the matching state shardings so GSPMD keeps the layout
        self._state_shardings = None
        if mesh is not None:
            from .parallel.tensor import model_axis_size
            if model_axis_size(mesh) > 1:
                from .parallel.tensor import shard_state, state_shardings
                skips = cfg.model.skips
                self._state_shardings = state_shardings(
                    mesh, self.state, skips=skips)
                self.state = shard_state(mesh, self.state, skips=skips)
                print(f"[mesh] tensor parallelism: trunk sharded over "
                      f"{model_axis_size(mesh)} 'model' devices x "
                      f"{dict(mesh.shape).get('data', 1)} 'data'")
            else:
                from .parallel.mesh import replicate
                self.state = replicate(mesh, self.state)

        self._step_fns: Dict[Any, Any] = {}
        # render fns cached BY RenderConfig (frozen dataclass -> hashable):
        # a later render_image(rcfg=...) with a different config compiles a
        # new program instead of silently reusing the first one, and the
        # per-epoch cross-section dump reuses one compiled fn for the run
        self._render_fns: Dict[Any, Any] = {}
        self._scan_render_fns: Dict[Any, Any] = {}
        self._key = jax.random.PRNGKey(seed + 1)
        # fused-path RNG root: the per-step key is fold_in(base, step) on
        # device, so resume reproduces the same key sequence
        self._base_key = jax.random.PRNGKey(seed + 1)
        self.eval_chunk = 16384          # --chunk (opt.py:182) analog
        # visualization cadence (main.py:368-389): panels written for the
        # first N epochs and every save_visu_every_n_epochs afterwards
        self.visu_scale = visu_scale
        self.save_first_n_visu = save_first_n_visu
        self.save_visu_every_n_epochs = max(1, save_visu_every_n_epochs)
        self.test_sun_v = test_sun_v     # --TestSun_v (main.py:391)

    def _place_batch(self, batch: Dict[str, np.ndarray]):
        if self.mesh is not None:
            from .parallel.mesh import shard_batch
            return shard_batch(self.mesh, batch)
        return batch_to_device(batch)

    # ---------------------------------------------------------- step fns

    def _static_phase(self, step: int):
        rcfg = self.cfg.render
        apply_brdf = step > self.t_brdf
        apply_theta = step > self.t_theta
        gsam_only = step > self.t_gsam_only
        return (apply_brdf and rcfg.apply_brdf,
                apply_theta and rcfg.apply_theta,
                gsam_only and rcfg.gsam_only)

    def _get_step_fn(self, phase):
        if phase not in self._step_fns:
            import dataclasses as dc
            rcfg = dc.replace(self.cfg.render, apply_brdf=phase[0],
                              apply_theta=phase[1], gsam_only=phase[2])
            if self.fused_loop:
                # ONE dispatch per step — store gather, schedule gates, and
                # the per-step key are all computed inside the program (see
                # make_fused_train_step); with a mesh the gather reads the
                # replicated store through a 'data'-sharded index vector
                from .parallel.train_step import make_fused_train_step
                self._step_fns[phase] = make_fused_train_step(
                    self.cfg.model, rcfg, self.cfg.train, self.opt,
                    self._gate_schedule(),
                    has_kp=self.depth_batcher is not None, mesh=self.mesh,
                    store_sharded=self.sharded_store,
                    state_shardings=self._state_shardings)
            else:
                self._step_fns[phase] = make_train_step(
                    self.cfg.model, rcfg, self.cfg.train, self.opt,
                    mesh=self.mesh,
                    state_shardings=self._state_shardings)
        return self._step_fns[phase]

    def _gate_schedule(self):
        from .parallel.train_step import GateSchedule
        return GateSchedule(
            t_cos_irra=float(self.t_cos_irra),
            t_ds_drop=float(self.t_ds_drop),
            t_nrrg=float(self.t_nrrg),
            steps_per_epoch=int(self.steps_per_epoch),
            first_beta_epoch=int(self.cfg.train.first_beta_epoch))

    def _get_scan_fn(self, phase):
        """Chunked variant of the fused step (make_scan_train_step): N
        steps per dispatch; the chunk length is a traced dim, so each
        distinct length compiles once per phase."""
        key = ("scan", phase)
        if key not in self._step_fns:
            import dataclasses as dc
            rcfg = dc.replace(self.cfg.render, apply_brdf=phase[0],
                              apply_theta=phase[1], gsam_only=phase[2])
            from .parallel.train_step import make_scan_train_step
            self._step_fns[key] = make_scan_train_step(
                self.cfg.model, rcfg, self.cfg.train, self.opt,
                self._gate_schedule(),
                has_kp=self.depth_batcher is not None, mesh=self.mesh,
                store_sharded=self.sharded_store,
                state_shardings=self._state_shardings)
        return self._step_fns[key]

    def _gates(self, step: int, epoch: int) -> TrainGates:
        tcfg = self.cfg.train
        return TrainGates(
            cos_irra_on=jnp.asarray(step > self.t_cos_irra),
            ds_on=jnp.asarray(step < self.t_ds_drop),
            nrrg_on=jnp.asarray(step > self.t_nrrg),
            beta_warmup=jnp.asarray(epoch < tcfg.first_beta_epoch),
            hs_on=jnp.asarray(epoch > 2))

    # ------------------------------------------------------------- train

    def _next_phase_change(self, step: int) -> int:
        """First step index > `step` at which a STATIC phase gate flips
        (the `step > t` comparisons of _static_phase): a scan chunk must
        not span it, because the compiled program changes there."""
        nxt = 10 ** 18
        rcfg = self.cfg.render
        for t, enabled in ((self.t_brdf, rcfg.apply_brdf),
                           (self.t_theta, rcfg.apply_theta),
                           (self.t_gsam_only, rcfg.gsam_only)):
            # a threshold whose render flag is off never changes the
            # compiled program (_static_phase ANDs with the flag) — don't
            # split the chunk stream (and force an extra compile) there
            if not enabled:
                continue
            flip = int(np.floor(t)) + 1
            if flip > step:
                nxt = min(nxt, flip)
        return nxt

    def fit(self, max_steps: Optional[int] = None,
            log_every: int = 100, eval_every_n_epochs: int = 1,
            save_ckpt_every_n_epochs: int = 1,
            progress: bool = True,
            scan_chunk: Optional[int] = None) -> Dict[str, float]:
        """scan_chunk > 1 (or BRDFNERF_SCAN_CHUNK): dispatch N fused steps
        per host round-trip via lax.scan — identical trajectory (same
        index/key/gate sequences), one dispatch per chunk; chunks clamp at
        epoch boundaries, static-phase changes and (when scan_chunk >
        log_every) multiples of log_every, so every log point gets its own
        row; with scan_chunk <= log_every logging reports the last step of
        the chunk containing each log point."""
        if self.cfg.model.compute_dtype == "int8":
            # the Trainer object doubles as the eval-CLI render harness,
            # so int8 is rejected here (the training entry), not __init__
            raise ValueError(
                "compute_dtype='int8' is serving-only: the quantizer's "
                "round() has zero gradient, so training would silently "
                "freeze the trunk. Train at float32/bfloat16* and pass "
                "--compute_dtype int8 to the eval CLI instead.")
        max_steps = max_steps or self.max_steps
        if scan_chunk is None:
            scan_chunk = int(os.environ.get("BRDFNERF_SCAN_CHUNK", "1"))
        if scan_chunk > 1 and not self.fused_loop:
            print("[fit] scan_chunk ignored: the host-gather loop "
                  "(BRDFNERF_NO_FUSED_LOOP=1) dispatches one step at a "
                  "time", flush=True)
        t0 = time.perf_counter()
        last_metrics: Dict[str, float] = {}
        start = int(self.state.step)
        epoch = start // self.steps_per_epoch
        # tracing (SURVEY.md 5: replaces Lightning profiler="simple"):
        # BRDFNERF_PROFILE=<dir> captures a jax.profiler trace of steps
        # start+10 .. start+20 for TensorBoard's trace viewer
        profile_dir = os.environ.get("BRDFNERF_PROFILE")
        prof_window = (start + 10, start + 20) if profile_dir else None
        if prof_window:
            scan_chunk = 1       # keep the trace's step<->program mapping
        step = start
        first = True
        while step < max_steps:
            new_epoch = step // self.steps_per_epoch
            if new_epoch != epoch or first:
                if not first:
                    self._on_epoch_end(epoch, eval_every_n_epochs,
                                       save_ckpt_every_n_epochs)
                epoch = new_epoch
            first = False
            if prof_window and step == prof_window[0]:
                jax.profiler.start_trace(profile_dir)
            if prof_window and step == prof_window[1]:
                jax.profiler.stop_trace()
                prof_window = None
            phase = self._static_phase(step)
            chunk = 1
            if self.fused_loop and scan_chunk > 1:
                chunk = min(scan_chunk, max_steps - step,
                            (epoch + 1) * self.steps_per_epoch - step,
                            self._next_phase_change(step) - step)
                if scan_chunk > log_every:
                    # a chunk longer than the log cadence would swallow
                    # log points (one row per chunk instead of one per
                    # log_every); clamp so chunks END exactly on each
                    # multiple of log_every and the logged metrics are
                    # the logged step's own
                    m = ((step + log_every - 1) // log_every) * log_every
                    chunk = min(chunk, m - step + 1)
            if self.fused_loop and chunk > 1:
                idx_mat = np.stack([self.batcher.next_indices()
                                    for _ in range(chunk)]).astype(np.int32)
                args = [self.state, self.batcher.store, idx_mat]
                if self.depth_batcher is not None:
                    kp_mat = np.stack(
                        [self.depth_batcher.next_indices()
                         for _ in range(chunk)]).astype(np.int32)
                    args += [self.depth_batcher.store, kp_mat]
                args.append(self._base_key)
                self.state, metrics = self._get_scan_fn(phase)(*args)
            elif self.fused_loop:
                # fused path: only the int32 index vector(s) cross H2D;
                # on the mesh path jit's in_shardings place them P('data')
                args = [self.state, self.batcher.store,
                        self.batcher.next_indices().astype(np.int32)]
                if self.depth_batcher is not None:
                    args += [self.depth_batcher.store,
                             self.depth_batcher.next_indices()
                             .astype(np.int32)]
                args.append(self._base_key)
                self.state, metrics = self._get_step_fn(phase)(*args)
            else:
                batch = self.batcher.next_batch()
                if self.depth_batcher is not None:
                    kb = self.depth_batcher.next_batch()
                    batch = dict(batch, kp_rays=kb["rays"],
                                 kp_depths=kb["depths"], kp_ts=kb["ts"])
                batch = self._place_batch(batch)
                self._key, k = jax.random.split(self._key)
                gates = self._gates(step, epoch)
                if self.mesh is not None:
                    from .parallel.mesh import replicate
                    gates = replicate(self.mesh, gates)
                    k = replicate(self.mesh, k)
                self.state, metrics = self._get_step_fn(phase)(
                    self.state, batch, k, gates)
            end = step + chunk - 1       # last executed step this chunk
            # log when the chunk contains a multiple of log_every
            # (chunk=1 reduces to the old `step % log_every == 0`)
            if ((step - 1) // log_every != end // log_every
                    or end == max_steps - 1):
                metrics = {k2: float(v) for k2, v in metrics.items()}
                dt = time.perf_counter() - t0
                rays_s = ((end - start + 1) * self.cfg.train.batch_size) / dt
                metrics["rays_per_sec"] = rays_s
                self.log.log(end, {f"train/{k2}": v
                                   for k2, v in metrics.items()})
                if progress:
                    print(f"step {end:6d} epoch {epoch:3d} "
                          f"loss {metrics['loss']:.4f} "
                          f"psnr {metrics['psnr']:.2f} "
                          f"{rays_s:,.0f} rays/s")
                last_metrics = metrics
            step = end + 1
        self._on_epoch_end(epoch, eval_every_n_epochs,
                           save_ckpt_every_n_epochs, final=True)
        return last_metrics

    def _on_epoch_end(self, epoch: int, eval_every: int, save_every: int,
                      final: bool = False):
        """Cadences: every N epochs (N >= 1; epoch 0 included, like the
        reference's Lightning check_val_every_n_epoch), 0 = never during
        training (the final save/validation still runs) — an explicit
        disable, since `epoch % huge == 0` is True at epoch 0."""
        if self.val_dataset is not None and (
                (eval_every > 0 and epoch % eval_every == 0) or final):
            try:
                self.validate(epoch)
            except Exception as e:   # validation must never kill training
                print(f"[val] failed at epoch {epoch}: {e}")
        if (save_every > 0 and epoch % save_every == 0) or final:
            path = os.path.join(self.paths.ckpts_dir, f"epoch={epoch}.npz")
            ckpt.save_checkpoint(path, self.state.params,
                                 step=int(self.state.step))
            ckpt.save_opt_state(path.replace(".npz", ".opt.npz"),
                                self.state.opt_state)

    # -------------------------------------------------------------- eval

    def _get_render_fn(self, rcfg: RenderConfig):
        if rcfg not in self._render_fns:
            self._render_fns[rcfg] = make_render_step(
                self.cfg.model, rcfg, mesh=self.mesh)
        return self._render_fns[rcfg]

    def render_image(self, sample: Dict, chunk: Optional[int] = None,
                     rcfg: Optional[RenderConfig] = None,
                     t: int = 0) -> Dict[str, np.ndarray]:
        """Full-image render via a fixed-shape jitted chunk fn.

        t: transient-embedding index used for every ray; the default 0 is
        the reference's predefined_val_ts (main.py:416-417, eval.py:222-223);
        eval's best-embedding search overrides it (eval.py:184-199)."""
        import dataclasses as dc
        from .render.render import RenderInputs
        if chunk is None:
            chunk = self.eval_chunk
        if rcfg is None:
            # eval uses the final static phase (eval.py:383-384 semantics:
            # apply_brdf when brdf_on < 1)
            rcfg = dc.replace(
                self.cfg.render,
                apply_brdf=(self.cfg.train.brdf_on < 1.0
                            and self.cfg.render.apply_brdf),
                apply_theta=(self.cfg.train.brdf_on < 0.5
                             and self.cfg.render.apply_theta),
                force_sun_march=(self.cfg.render.force_sun_march
                                 or self.test_sun_v))
        rays = sample["rays"]
        n = rays.shape[0]
        key = jax.random.PRNGKey(0)
        # default: chunks render in fixed-size BLOCKS, each block one
        # jitted lax.scan dispatch (make_scan_render_step) — the chunked
        # host loop below round-trips once per chunk and on a high-latency
        # link that latency dominates (~5 min vs <1 min for a 2.56M-ray
        # image through the TPU tunnel). Any truthy
        # BRDFNERF_NO_SCAN_RENDER restores the loop for A/B.
        if os.environ.get("BRDFNERF_NO_SCAN_RENDER", "") in ("", "0"):
            return self._render_image_scan(rcfg, rays, n, chunk, t, key)
        render_fn = self._get_render_fn(rcfg)
        outs: Dict[str, List[np.ndarray]] = {}
        # on a mesh, chunk rays shard over the data axis (committed input
        # shardings drive the jitted render's SPMD partitioning — the
        # make_render_step contract); single-device otherwise
        if self.mesh is not None:
            from .parallel.mesh import batch_sharding
            data_sh = batch_sharding(self.mesh)
            place = lambda a: jax.device_put(jnp.asarray(a), data_sh)
        else:
            place = jnp.asarray
        for i in range(0, n, chunk):
            part = rays[i:i + chunk]
            pad = chunk - part.shape[0]
            if pad > 0:
                part = np.concatenate([part, np.tile(part[-1:], (pad, 1))], 0)
            inp = RenderInputs(rays=place(part),
                               ts=place(np.full(chunk, t, np.int32)),
                               cos_irra_on=jnp.asarray(
                                   self.cfg.train.cos_irra_on < 1.0))
            res = render_fn(self.state.params, inp, key)
            keep = chunk - pad if pad else chunk
            for k2 in self.PER_RAY_KEYS:
                if k2 in res:
                    outs.setdefault(k2, []).append(np.asarray(res[k2])[:keep])
            # per-sample panel fields -> per-ray maps, accumulated ON
            # DEVICE so only (chunk, C) crosses to host, not (chunk, S, C)
            # (the reference hauls full per-sample tensors to the host,
            # main.py:426-455); reduction shared with the scan path
            from .parallel.train_step import reduce_panels
            for k2, acc in reduce_panels(res, self.PANEL_ACCUM).items():
                outs.setdefault(k2, []).append(np.asarray(acc)[:keep])
        return {k2: np.concatenate(v, 0) for k2, v in outs.items()}

    def _render_image_scan(self, rcfg: RenderConfig, rays: np.ndarray,
                           n: int, chunk: int, t: int, key):
        """Block-scan full-image render (see render_image): chunks render
        in fixed-size blocks of BRDFNERF_RENDER_SCAN_BLOCK chunks
        (default 32), each block ONE lax.scan dispatch.  The block size
        is fixed so every image of >= block_size chunks reuses a single
        compiled program regardless of its pixel count — flagship
        compiles cost minutes through a remote-compile tunnel, so
        per-image-shape recompiles would eat the dispatch savings.
        Images smaller than one block scan at their exact chunk count
        (small shapes compile fast).  The last block pads by repeating
        the final ray; a 2.56M-ray image at chunk 5120 renders in 16
        dispatches instead of 500."""
        if rcfg not in self._scan_render_fns:
            from .parallel.train_step import make_scan_render_step
            self._scan_render_fns[rcfg] = make_scan_render_step(
                self.cfg.model, rcfg, self.PER_RAY_KEYS, self.PANEL_ACCUM,
                mesh=self.mesh,
                param_shardings=(None if self._state_shardings is None
                                 else self._state_shardings.params))
        fn = self._scan_render_fns[rcfg]
        n_chunks = max(1, -(-n // chunk))
        block = max(1, int(os.environ.get("BRDFNERF_RENDER_SCAN_BLOCK",
                                          "32")))
        block = min(block, n_chunks)
        n_blocks = -(-n_chunks // block)
        total = n_blocks * block * chunk
        rays_p = (np.concatenate([rays, np.tile(rays[-1:],
                                                (total - n, 1))], 0)
                  if total > n else np.asarray(rays))
        rays_mat = rays_p.reshape(n_blocks, block, chunk,
                                  -1).astype(np.float32)
        ts_blk = np.full((block, chunk), t, np.int32)
        cos_flag = jnp.asarray(self.cfg.train.cos_irra_on < 1.0)
        outs: Dict[str, List[np.ndarray]] = {}
        for b in range(n_blocks):
            res = fn(self.state.params, rays_mat[b], ts_blk, cos_flag, key)
            for k, v in res.items():
                v = np.asarray(v)
                outs.setdefault(k, []).append(
                    v.reshape(block * chunk, *v.shape[2:]))
        return {k: np.concatenate(v, 0)[:n] for k, v in outs.items()}

    # per-ray result keys fetched verbatim by render_image
    # fine-model outputs are harvested too (guarded by `in res`): metric
    # consumers score the FINE pass when n_importance > 0, like the
    # reference eval (typ = 'fine' if present)
    PER_RAY_KEYS = ("rgb_coarse", "depth_coarse", "albedo_accu_coarse",
                    "rgb_fine", "depth_fine")
    # per-sample (N, S, C) fields reduced to per-ray panel maps: weighted
    # sum along samples ('wsum') or plain mean ('mean', irradiance —
    # main.py:446-449 averages it)
    PANEL_ACCUM = {
        "albedo_coarse": "wsum", "sun_coarse": "wsum", "sky_coarse": "wsum",
        "normal_an_coarse": "wsum", "normal_lr_coarse": "wsum",
        "roughness_coarse": "wsum", "rpv_k_coarse": "wsum",
        "rpv_theta_coarse": "wsum", "rpv_rhoc_coarse": "wsum",
        "hpk_b_coarse": "wsum", "hpk_c_coarse": "wsum",
        "hpk_theta_coarse": "wsum", "beta_coarse": "wsum",
        "irradiance_coarse": "mean",
    }

    def _save_cross_section(self, sample: Dict, epoch: int,
                            chunk: int = 4096):
        """Mid-row diagnostic dump: z_vals / sigma / alpha / T for every
        pixel of the middle image row (main.py:567-595 analog)."""
        from .render.render import RenderInputs
        h, w = sample["h"], sample["w"]
        row = h // 2
        rays = sample["rays"][row * w:(row + 1) * w]
        fn = self._get_render_fn(self.cfg.render)
        inp = RenderInputs(rays=jnp.asarray(rays),
                           ts=jnp.zeros(rays.shape[0], jnp.int32),
                           cos_irra_on=jnp.asarray(False))
        res = fn(self.state.params, inp, jax.random.PRNGKey(0))
        path = os.path.join(self.paths.logs_dir,
                            f"cross_epoch{epoch}.txt")
        z = np.asarray(res["z_vals_coarse"])
        sig = np.asarray(res["sigmas_coarse"])[..., 0]
        alpha = np.asarray(res["alphas_coarse"])
        trans = np.asarray(res["transparency_coarse"])
        with open(path, "w") as f:
            f.write("# col sample z sigma alpha transparency\n")
            for c in range(0, z.shape[0], max(1, z.shape[0] // 64)):
                for sidx in range(z.shape[1]):
                    f.write(f"{c} {sidx} {z[c, sidx]:.6f} {sig[c, sidx]:.6f}"
                            f" {alpha[c, sidx]:.6f} {trans[c, sidx]:.6f}\n")

    def validate(self, epoch: int) -> Dict[str, float]:
        ds = self.val_dataset
        all_scalars = {}
        for idx in range(len(ds)):
            s = ds.get_image(idx)
            out = self.render_image(s)
            h, w = s["h"], s["w"]
            is_val = s.get("is_val", True)
            if s.get("save_cross"):
                try:
                    self._save_cross_section(s, epoch)
                except Exception as e:
                    print(f"[val] cross-section dump failed: {e}")
            rgb = out.get("rgb_fine", out["rgb_coarse"]).reshape(h, w, 3)
            gt = s["rgbs"].reshape(h, w, 3)
            mask = s.get("mask")
            mval = (jnp.asarray(mask.reshape(h, w, 1))
                    if mask is not None else None)
            rgb_j, gt_j = jnp.asarray(rgb), jnp.asarray(gt)
            # masked metrics are the primary scalars, unmasked pair
            # alongside (main.py:604-607,668); scl cadence at epoch 2
            # (main.py:603,668-672). Convention lives in metrics.
            sc = masked_scores(rgb_j, gt_j, mval, scl=(epoch == 2),
                               with_unmasked=True)
            p, sv = sc["psnr"], sc["ssim"]
            tag = "val" if is_val else "train_"
            scal = {f"{tag}/psnr_{idx}": p, f"{tag}/ssim_{idx}": sv,
                    f"{tag}/psnr_all_{idx}": sc["psnr_all"],
                    f"{tag}/ssim_all_{idx}": sc["ssim_all"]}
            if epoch == 2:
                print(f"[val] psnr_scl: {sc['psnr_scl']:.3f}, "
                      f"ssim_scl: {sc['ssim_scl']:.3f}"
                      f" | psnr_dif: {p - sc['psnr_scl']:.5f}"
                      f" ssim_dif: {sv - sc['ssim_scl']:.6f}")
            rep = None
            if self.paths.gt_dir and getattr(ds, "scene", None) is not None:
                depth = out.get("depth_fine", out["depth_coarse"])
                roi = dsm_mod.load_roi(self.paths.gt_dir, self.paths.aoi_id)
                dsm, prof = dsm_mod.dsm_from_depth(
                    s["rays"], depth, ds.scene, cs=ds.cfg.cs,
                    utm_zone=ds.utm_zone,
                    resolution=(float(roi[3]) if roi is not None else 0.5))
                if not is_val:
                    # train-image "fair MAE": Cloud2Grid NaN infill before
                    # diffing, so train/val MAE compare apples-to-apples
                    # (main.py:624-629, sat_utils.py:299-313)
                    dsm = dsm_mod.interpolate_nans(dsm)
                rep = dsm_mod.mae_report(
                    dsm, prof, self.paths.gt_dir, self.paths.aoi_id,
                    out_dir=os.path.join(self.paths.logs_dir, "rdsm"),
                    src_id=s.get("src_id", str(idx)), epoch_number=epoch)
                scal[f"{tag}/mae_{idx}"] = rep.mae
                scal[f"{tag}/mae_nr_{idx}"] = rep.mae_nr
            save_visu = (epoch <= self.save_first_n_visu
                         or epoch % self.save_visu_every_n_epochs == 0)
            if save_visu:
                try:
                    from .utils import viz
                    # full panel stack (rgb/gt/depth + BRDF/normal/sun maps;
                    # DSM diff panels on the fair-MAE train image,
                    # main.py:426-558,630-636)
                    panel = viz.render_summary_panels(
                        out, s["rgbs"], h, w,
                        diff=rep.diff if (rep is not None and not is_val)
                        else None,
                        diff_nr=rep.diff_nr if (rep is not None and not is_val)
                        else None,
                        visu_scale=self.visu_scale)
                    viz.save_png(os.path.join(
                        self.paths.logs_dir,
                        f"val_{idx}_epoch{epoch}.png"), panel)
                    self.log.log_image(int(self.state.step),
                                       f"{tag}/panels_{idx}", panel)
                except Exception as e:
                    print(f"[val] panel save failed: {e}")
            all_scalars.update(scal)
        self.log.log(int(self.state.step), all_scalars)
        # masked convention only: psnr_all_* (unmasked) and *_scl stay out
        # of the printed mean (on masked AOIs they are a different metric)
        vals = [v for k2, v in all_scalars.items()
                if k2.startswith("val/psnr_")
                and "all" not in k2 and "scl" not in k2]
        if vals:
            print(f"[val] epoch {epoch} mean psnr {np.mean(vals):.2f}")
        return all_scalars
