"""Jitted, mesh-sharded train / render steps.

The whole reference training_step (main.py:194-353) — render (3 MLP passes),
all losses, schedule gating, optimizer update — compiles to ONE XLA program.
Dynamic schedule gates (step comparisons) enter as booleans and select loss
terms with jnp.where; gates that change program structure (apply_brdf /
apply_theta / gsam_only) are static in RenderConfig and the trainer swaps
between at most three compiled specializations across a run.

Sharding: batch arrays split on axis 0 over the 'data' mesh axis; params and
optimizer state replicated; XLA's SPMD partitioner inserts the gradient
all-reduce over ICI because the loss is a mean over the global batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, RenderConfig, TrainConfig
from ..models.network import init_network, init_t_embedding
from ..render.render import render_rays, RenderInputs
from .. import losses as L
from ..metrics import psnr as psnr_metric


class TrainGates(NamedTuple):
    """Dynamic (traced) schedule gates, all boolean scalars; computed from
    train_steps vs fraction*max_steps like main.py:60-63,202-230."""
    cos_irra_on: jnp.ndarray      # train_steps > cos_irra_on
    ds_on: jnp.ndarray            # train_steps < ds_drop
    nrrg_on: jnp.ndarray          # train_steps > nrrg_on
    beta_warmup: jnp.ndarray      # epoch < first_beta_epoch -> loss w/o beta
    hs_on: jnp.ndarray            # epoch > 2


class GateSchedule(NamedTuple):
    """Static schedule thresholds (fraction*max_steps, precomputed by the
    trainer) for IN-STEP gate computation: the TrainGates become functions
    of state.step inside the jitted program, so the host sends zero gate /
    key scalars per step (5 tiny H2D transfers otherwise — expensive when
    the device sits behind a high-latency link)."""
    t_cos_irra: float
    t_ds_drop: float
    t_nrrg: float
    steps_per_epoch: int
    first_beta_epoch: int


def gates_from_step(step, sched: GateSchedule) -> TrainGates:
    """main.py:60-63,202-230 schedule comparisons, traced on device."""
    epoch = step // sched.steps_per_epoch
    return TrainGates(
        cos_irra_on=step > sched.t_cos_irra,
        ds_on=step < sched.t_ds_drop,
        nrrg_on=step > sched.t_nrrg,
        beta_warmup=epoch < sched.first_beta_epoch,
        hs_on=epoch > 2)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(tcfg: TrainConfig, steps_per_epoch: int):
    """Adam + per-epoch StepLR gamma=0.9 (main.py:147-168,
    train_utils.py:153-155), as an optax exponential staircase.

    tcfg.lr_warmup_steps > 0 (or -1 = two epochs) prepends a linear ramp
    from lr/10 to lr (opt-in, incl. under scale_global_batch — the
    measured lr-rule grid in BASELINE.md found warmup costs ~2 dB at
    equal epochs at the tested horizon); the staircase then decays from
    the end of the ramp."""
    sched = optax.exponential_decay(
        init_value=tcfg.lr, transition_steps=max(1, steps_per_epoch),
        decay_rate=tcfg.lr_gamma, staircase=True)
    warm = tcfg.lr_warmup_steps
    if warm == -1:
        warm = 2 * max(1, steps_per_epoch)
    elif warm < 0:          # -2 = explicitly off (kept as a no-op alias
        warm = 0            # from when scale_global_batch auto-enabled warmup)
    if warm > 0:
        ramp = optax.linear_schedule(init_value=tcfg.lr * 0.1,
                                     end_value=tcfg.lr,
                                     transition_steps=warm)
        sched = optax.join_schedules([ramp, sched], boundaries=[warm])
    return optax.adam(learning_rate=sched), sched


def create_train_state(key, mcfg: ModelConfig, tcfg: TrainConfig,
                       steps_per_epoch: int, n_importance: int = 0):
    k1, k2, k3 = jax.random.split(key, 3)
    params: Dict[str, Any] = {"coarse": init_network(k1, mcfg)}
    if n_importance > 0:
        params["fine"] = init_network(k2, mcfg)
    if mcfg.beta:
        params["t"] = init_t_embedding(k3, mcfg.t_embedding_vocab,
                                       mcfg.t_embedding_tau)
    opt, _ = make_optimizer(tcfg, steps_per_epoch)
    opt_state = opt.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), opt


def compute_losses(params, mcfg: ModelConfig, rcfg: RenderConfig,
                   tcfg: TrainConfig, batch: Dict, key,
                   gates: TrainGates):
    """Full loss of one batch (training_step semantics, main.py:230-327)."""
    inp = RenderInputs(
        rays=batch["rays"], ts=batch.get("ts"),
        valid_depth=batch.get("valid_depth"),
        target_depths=batch.get("depths"),
        target_std=batch.get("depth_std"),
        cos_irra_on=gates.cos_irra_on)
    results = render_rays(params, mcfg, rcfg, inp, key, train=True)
    rgbs = batch["rgbs"]
    typ = "fine" if "rgb_fine" in results else "coarse"
    terms: Dict[str, jnp.ndarray] = {}

    # color loss; beta warmup uses the SNerf (no-beta) loss (main.py:237-238)
    loss_fn = L.load_loss(mcfg.variant, mcfg.beta, tcfg.sc_lambda,
                          tcfg.lambda_rgb)
    color_loss, d = loss_fn(results, rgbs)
    if mcfg.beta and mcfg.variant in ("sat-nerf", "sps-nerf"):
        warm_loss, d_warm = L.snerf_loss(results, rgbs,
                                         lambda_sc=tcfg.sc_lambda)
        color_loss = jnp.where(gates.beta_warmup, warm_loss, color_loss)
    loss = color_loss
    terms.update(d)

    # depth supervision (main.py:248-265), dropped after ds_drop
    if tcfg.ds_lambda > 0 and "depths" in batch:
        kp_depths = batch["depths"][:, 0]
        kp_weights = (jnp.ones_like(batch["depths"][:, 1])
                      if tcfg.ds_noweights else batch["depths"][:, 1])
        dloss, d = L.depth_loss(
            results, kp_depths, kp_weights,
            valid_depth=batch.get("valid_depth"),
            target_std=batch.get("depth_std"),
            lambda_ds=tcfg.ds_lambda, gnll=tcfg.gnll,
            usealldepth=tcfg.usealldepth,
            subset=(mcfg.variant != "sat-nerf"))
        loss = loss + jnp.where(gates.ds_on, dloss, 0.0)
        terms.update(d)

    # sat-nerf sparse keypoint depth: a SECOND forward pass on tie-point
    # rays from the separate keypoint store (main.py:256-262 renders
    # batch['depth'] with mode='test'); the loss is the plain MSE path
    # (DepthLoss subset=False, metrics.py:147 — keypoint weights are NOT
    # applied there, only subset mode uses them).
    if tcfg.ds_lambda > 0 and "kp_rays" in batch:
        kp_inp = RenderInputs(rays=batch["kp_rays"],
                              ts=batch.get("kp_ts"),
                              cos_irra_on=gates.cos_irra_on)
        kp_res = render_rays(params, mcfg, rcfg, kp_inp, key, train=False)
        dloss, d = L.depth_loss(
            kp_res, batch["kp_depths"][:, 0], batch["kp_depths"][:, 1],
            lambda_ds=tcfg.ds_lambda, gnll=tcfg.gnll,
            usealldepth=tcfg.usealldepth, subset=False)
        loss = loss + jnp.where(gates.ds_on, dloss, 0.0)
        terms.update({f"kp_{k}": v for k, v in d.items()})

    perc_bad_nr = jnp.asarray(-1.0)
    if mcfg.variant == "spsbrdf-nerf":
        # normal regularization after nrrg_on (main.py:270-285)
        if tcfg.nr_reg_an_lambda > 0 and f"normal_an_{typ}" in results:
            lr, d, perc_bad_nr = L.normal_reg_loss(
                results, tcfg.nr_reg_an_lambda, "normal_an")
            loss = loss + jnp.where(gates.nrrg_on, lr, 0.0)
            terms.update(d)
        if tcfg.nr_reg_lr_lambda > 0 and f"normal_lr_{typ}" in results:
            lr, d, perc_bad_nr = L.normal_reg_loss(
                results, tcfg.nr_reg_lr_lambda, "normal_lr")
            loss = loss + jnp.where(gates.nrrg_on, lr, 0.0)
            terms.update(d)
        # normal supervision by nr_spv_type (main.py:301-327)
        if abs(tcfg.nr_spv_lambda) > 1e-5:
            w = results[f"weights_{typ}"]
            if tcfg.nr_spv_type == 1 and f"normal_lr_{typ}" in results \
                    and f"normal_an_{typ}" in results:
                ln, d = L.normal_loss(w, results[f"normal_an_{typ}"],
                                      results[f"normal_lr_{typ}"],
                                      tcfg.nr_spv_lambda, keyword="an_lr")
                loss = loss + ln
                terms.update(d)
            elif tcfg.nr_spv_type == 2 and f"normal_lr_{typ}" in results \
                    and "normals" in batch:
                ln, d = L.normal_loss(w, batch["normals"],
                                      results[f"normal_lr_{typ}"],
                                      tcfg.nr_spv_lambda, keyword="lr")
                loss = loss + ln
                terms.update(d)
            elif tcfg.nr_spv_type == 3 and f"normal_an_{typ}" in results \
                    and "normals" in batch:
                ln, d = L.normal_loss(
                    w, batch["normals"], results[f"normal_an_{typ}"],
                    tcfg.nr_spv_lambda,
                    target_weight=batch.get("valid_normal"),
                    valid_depth=batch.get("valid_depth"), keyword="an")
                loss = loss + ln
                terms.update(d)

    # hard-surface after epoch 2 (main.py:290-299)
    if tcfg.hs_lambda > 0:
        hl, d = L.hard_surface_loss(results, tcfg.hs_lambda)
        loss = loss + jnp.where(gates.hs_on, hl, 0.0)
        terms.update(d)

    aux = {
        "psnr": psnr_metric(results[f"rgb_{typ}"], rgbs),
        "perc_bad_nr": perc_bad_nr,
        "depth_std_mean": jnp.mean(
            jnp.sqrt(jnp.sum((results[f"z_vals_{typ}"]
                              - results[f"depth_{typ}"][..., None]) ** 2
                             * results[f"weights_{typ}"], axis=-1))),
    }
    if f"irradiance_{typ}" in results:
        aux["irradiance"] = jnp.mean(results[f"irradiance_{typ}"])
    return loss, (terms, aux)


def make_train_step(mcfg: ModelConfig, rcfg: RenderConfig, tcfg: TrainConfig,
                    optimizer, mesh=None, donate: bool = True,
                    state_shardings=None):
    """Build the jitted train step. With a mesh, batch is sharded on axis 0
    and params replicated (SPMD gradient all-reduce over ICI).

    state_shardings (mesh only): a NamedSharding pytree matching the
    TrainState — the tensor-parallel layout from parallel.tensor — used
    in place of full replication for the state; GSPMD then partitions
    every trunk matmul over the 'model' axis."""

    def step_fn(state: TrainState, batch: Dict, key, gates: TrainGates):
        def loss_fn(params):
            return compute_losses(params, mcfg, rcfg, tcfg, batch, key, gates)

        (loss, (terms, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **aux}
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = repl if state_shardings is None else state_shardings

    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data, repl, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_fused_train_step(mcfg: ModelConfig, rcfg: RenderConfig,
                          tcfg: TrainConfig, optimizer,
                          schedule: GateSchedule, has_kp: bool = False,
                          mesh=None, store_sharded: bool = False,
                          state_shardings=None):
    """Single-dispatch train step: the minibatch gather from the
    device-resident ray store, the schedule gates, and the per-step RNG key
    all happen INSIDE the jitted program.  Per step the host sends one
    (batch,) int32 index vector and nothing else — the batch-building work
    the reference spreads over 4 DataLoader workers plus a host chunk loop
    (main.py:170-184) is one fused XLA program.

    With a mesh, the store is REPLICATED over the devices by default and
    the index vector is sharded over the 'data' axis, so the gather stays
    local (zero collectives) and each device materializes only its shard
    of the batch; the gradient all-reduce over ICI is unchanged.  The
    host-side work per step is identical to the single-device path: one
    small int32 upload.

    store_sharded=True (requires a mesh): the store itself is SHARDED
    over 'data' (axis 0, 1/D of the rays — and of the HBM — per device)
    and `idx` carries PER-SHARD LOCAL indices laid out as D contiguous
    blocks (ShardedRayBatcher's contract); the gather runs inside a
    shard_map so each device reads only its own shard — still zero
    collectives, and the rest of the program (loss mean over the global
    batch, SPMD gradient all-reduce) is untouched.

    Signature: (state, store, idx, [kp_store, kp_idx,] base_key).
    The index sequence still comes from the host batcher, so shuffled-epoch
    (sample-without-replacement) semantics are preserved exactly.

    state_shardings: tensor-parallel state layout (see make_train_step);
    composes with store_sharded — the store stays 'data'-sharded
    (replicated over 'model') and the shard_map gather is unchanged.
    """
    if store_sharded and mesh is None:
        raise ValueError("store_sharded requires a mesh")
    one_step = _fused_step_body(mcfg, rcfg, tcfg, optimizer, schedule,
                                has_kp, mesh if store_sharded else None)

    def step_fn(state: TrainState, store, idx, *rest):
        if has_kp:
            kp_store, kp_idx, base_key = rest
        else:
            kp_store = kp_idx = None
            (base_key,) = rest
        return one_step(state, store, idx, kp_store, kp_idx, base_key)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn,
                   in_shardings=_fused_shardings(mesh, has_kp,
                                                 store_sharded=store_sharded,
                                                 state_sharding=state_shardings),
                   out_shardings=_fused_out_shardings(mesh, state_shardings),
                   donate_argnums=(0,))


def _gather(store, idx):
    return jax.tree_util.tree_map(
        lambda a: jnp.take(a, idx, axis=0), store)


def _gather_sharded(mesh, store, idx):
    """Device-local gather from a 'data'-sharded store with per-shard
    local indices (D contiguous blocks of batch/D): each device takes its
    idx block into its own shard — no collectives.  The result is the
    global (batch, ...) batch sharded over 'data'."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    return shard_map(
        lambda s, i: _gather(s, i), mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=P("data"))(store, idx)


def _fused_step_body(mcfg, rcfg, tcfg, optimizer, schedule, has_kp,
                     sharded_mesh=None):
    """Shared body of the fused and scan-chunked steps: in-program store
    gather, in-program gates/key from state.step, one optimizer update.
    sharded_mesh: when set, the MAIN store is 'data'-sharded and idx holds
    per-shard local indices (the kp store stays replicated — tie-point
    stores are tiny)."""

    def one_step(state, store, idx, kp_store, kp_idx, base_key):
        if sharded_mesh is not None:
            batch = _gather_sharded(sharded_mesh, store, idx)
        else:
            batch = _gather(store, idx)
        if has_kp:
            kb = _gather(kp_store, kp_idx)
            batch = dict(batch, kp_rays=kb["rays"], kp_depths=kb["depths"],
                         kp_ts=kb["ts"])
        key = jax.random.fold_in(base_key, state.step)
        gates = gates_from_step(state.step, schedule)

        def loss_fn(params):
            return compute_losses(params, mcfg, rcfg, tcfg, batch, key,
                                  gates)

        (loss, (terms, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **aux}
        return TrainState(params, opt_state, state.step + 1), metrics

    return one_step


def _fused_shardings(mesh, has_kp, idx_spec=None, store_sharded=False,
                     state_sharding=None):
    """idx_spec: PartitionSpec of the index argument(s) — P('data') for
    the single-step path, P(None, 'data') for the scan path's (N, batch)
    index matrix; everything else is replicated except the main store,
    which shards over 'data' when store_sharded, and the state, which
    takes the tensor-parallel layout when state_sharding is given."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    idx = NamedSharding(mesh, idx_spec if idx_spec is not None
                        else P("data"))
    store = NamedSharding(mesh, P("data")) if store_sharded else repl
    state = repl if state_sharding is None else state_sharding
    shardings = [state, store, idx]          # state, store, idx
    if has_kp:
        shardings += [repl, idx]             # kp_store, kp_idx
    shardings.append(repl)                   # base_key
    return tuple(shardings)


def _fused_out_shardings(mesh, state_sharding=None):
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    state = repl if state_sharding is None else state_sharding
    return (state, repl)


def make_scan_train_step(mcfg: ModelConfig, rcfg: RenderConfig,
                         tcfg: TrainConfig, optimizer,
                         schedule: GateSchedule, has_kp: bool = False,
                         mesh=None, store_sharded: bool = False,
                         state_shardings=None):
    """N fused steps per dispatch via lax.scan — same trajectory as N
    calls of make_fused_train_step (identical index/key/gate sequences;
    the body IS the fused step body), but the host pays ONE dispatch per
    chunk, so end-to-end loop throughput approaches the chip's scan-bench
    rate even behind a high-latency link.  The chunk length is a traced
    dimension of idx_mat, so each distinct chunk size compiles once.

    Signature: (state, store, idx_mat(N, batch),
                [kp_store, kp_idx_mat(N, kp_batch),] base_key)
    -> (state after N steps, metrics of the LAST step).

    On a mesh, idx_mat shards its BATCH axis over 'data' (P(None, 'data'))
    against the replicated store — same local-gather layout as the
    single-step path.  store_sharded shards the main store over 'data'
    with per-shard local idx rows, exactly as in make_fused_train_step.
    """
    if store_sharded and mesh is None:
        raise ValueError("store_sharded requires a mesh")
    one_step = _fused_step_body(mcfg, rcfg, tcfg, optimizer, schedule,
                                has_kp, mesh if store_sharded else None)

    def scan_fn(state: TrainState, store, idx_mat, *rest):
        if has_kp:
            kp_store, kp_idx_mat, base_key = rest
            xs = (idx_mat, kp_idx_mat)
        else:
            kp_store = None
            (base_key,) = rest
            xs = (idx_mat,)

        def body(st, x):
            kp_idx = x[1] if has_kp else None
            return one_step(st, store, x[0], kp_store, kp_idx, base_key)

        state, ms = jax.lax.scan(body, state, xs)
        last = jax.tree_util.tree_map(lambda a: a[-1], ms)
        return state, last

    if mesh is None:
        return jax.jit(scan_fn, donate_argnums=(0,))

    from jax.sharding import PartitionSpec as P
    return jax.jit(scan_fn,
                   in_shardings=_fused_shardings(mesh, has_kp,
                                                 idx_spec=P(None, "data"),
                                                 store_sharded=store_sharded,
                                                 state_sharding=state_shardings),
                   out_shardings=_fused_out_shardings(mesh, state_shardings),
                   donate_argnums=(0,))


def make_render_step(mcfg: ModelConfig, rcfg: RenderConfig, mesh=None,
                     train: bool = False):
    """Jitted inference over a ray batch (eval / full-image rendering);
    rays shard over the mesh so full images render in parallel with no host
    round-trips per chunk (replaces eval.py:56-76 batched_inference)."""

    def fn(params, inp: RenderInputs, key):
        return render_rays(params, mcfg, rcfg, inp, key, train=train)

    # with a mesh, partitioning is driven by the committed shardings of the
    # arguments (params replicated, ray arrays sharded on axis 0 via
    # mesh.shard_batch) — explicit in_shardings would mis-annotate the
    # scalar fields of RenderInputs
    return jax.jit(fn)


def reduce_panels(res: Dict, panel_accum) -> Dict:
    """Per-sample (N, S, C) panel fields -> per-ray maps: weighted sum
    along samples ('wsum') or plain mean ('mean').  Shared by the scan
    render body and Trainer.render_image's chunk loop so the two paths
    cannot drift."""
    out = {}
    w = res.get("weights_coarse")
    if w is None:
        return out
    items = (panel_accum.items() if isinstance(panel_accum, dict)
             else panel_accum)
    for k, how in items:
        if k in res:
            out[k] = (jnp.mean(res[k], axis=-2) if how == "mean"
                      else jnp.sum(w[..., None] * res[k], axis=-2))
    return out


def make_scan_render_step(mcfg: ModelConfig, rcfg: RenderConfig,
                          per_ray_keys, panel_accum, mesh=None,
                          param_shardings=None):
    """Block render: a lax.scan over ray chunks inside a single jitted
    program.  The chunked-loop path dispatches one chunk per host
    round-trip and synchronously fetches each result — on a high-latency
    host link that latency dominates the render (e.g. 500 dispatches for
    a 2.56M-ray image at chunk 5120).  Here a whole BLOCK of chunks
    renders per dispatch and only the per-RAY products come back:
    per-sample (chunk, S, C) panel fields are reduced to per-ray maps
    in-program (reduce_panels, same reduction as Trainer.render_image's
    loop), so the output buffer is O(rays), not O(rays*samples).

    fn(params, rays_mat, ts_mat, cos_irra_on, key) with rays_mat
    (n_chunks, chunk, 8|11) and ts_mat (n_chunks, chunk) int32; the same
    key is reused for every chunk, exactly like the chunked loop.
    Returns {key: (n_chunks, chunk, ...)} for per_ray_keys present plus
    reduced panel_accum fields.  One compile per (n_chunks, chunk) shape
    — Trainer.render_image calls it with FIXED-size blocks so any image
    of >= block_size chunks reuses one compiled program."""
    panel_items = tuple(panel_accum.items())
    per_ray_keys = tuple(per_ray_keys)

    def fn(params, rays_mat, ts_mat, cos_irra_on, key):
        def one(carry, xs):
            rays, ts = xs
            res = render_rays(params, mcfg, rcfg,
                              RenderInputs(rays=rays, ts=ts,
                                           cos_irra_on=cos_irra_on),
                              key, train=False)
            out = {k: res[k] for k in per_ray_keys if k in res}
            out.update(reduce_panels(res, panel_items))
            return carry, out
        _, outs = jax.lax.scan(one, None, (rays_mat, ts_mat))
        return outs

    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    mat = NamedSharding(mesh, P(None, "data"))
    # param_shardings: keep tensor-parallel params in their sharded layout
    # (replicating them here would all-gather the trunk every render call)
    par = repl if param_shardings is None else param_shardings
    return jax.jit(fn, in_shardings=(par, mat, mat, repl, repl))
