"""Tensor parallelism (2-D data x model mesh) on the 8-virtual-CPU mesh.

The TP layout (parallel/tensor.py) is a pure re-layout of the same math:
a TP train step's trajectory must match the replicated 1-device step to
floating-point reduction tolerance, trunk weights must actually live
sharded over the 'model' axis (that is the capability — HBM headroom for
scaled trunks), and the layout must compose with the 'data' axis
contracts (sharded store, scan-chunked loop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from brdfnerf_tpu.config import ModelConfig, RenderConfig, TrainConfig
from brdfnerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from brdfnerf_tpu.parallel.tensor import (tp_mesh, trunk_spec, state_shardings,
                                          shard_state, model_axis_size,
                                          data_axis_size)
from brdfnerf_tpu.parallel.train_step import (create_train_state,
                                              make_train_step,
                                              make_fused_train_step,
                                              make_scan_train_step,
                                              make_render_step,
                                              GateSchedule, TrainGates)
from brdfnerf_tpu.render.render import RenderInputs

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _cfg():
    mcfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                       layers=4, feat=64, skips=(2,))
    rcfg = RenderConfig(n_samples=8, guided_samples=8)
    tcfg = TrainConfig(lr=1e-3, batch_size=128, ds_lambda=10.0)
    return mcfg, rcfg, tcfg


def _batch(n, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = np.tile(np.asarray([[0.05, 0.02, -1.0]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sun = np.tile(np.asarray([[0.3, 0.2, 0.93]], np.float32), (n, 1))
    sun /= np.linalg.norm(sun, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.zeros((n, 1), np.float32),
                           np.full((n, 1), 2.0, np.float32), sun], 1)
    return {
        "rays": rays,
        "rgbs": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "ts": np.zeros(n, np.int32),
        "depths": np.stack([rng.uniform(0.5, 1.5, n), np.ones(n)],
                           1).astype(np.float32),
        "valid_depth": (rng.uniform(0, 1, n) > 0.5).astype(np.int32),
        "depth_std": np.zeros(n, np.float32),
    }


def _gates():
    f, t = jnp.asarray(False), jnp.asarray(True)
    return TrainGates(f, t, t, f, t)


# ----------------------------------------------------------- the spec rule

def test_trunk_spec_alternates_and_mirrors_into_adam_state():
    mcfg, rcfg, tcfg = _cfg()
    state, _ = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg, 100)
    mesh = tp_mesh(2, 4)
    shs = state_shardings(mesh, state, skips=mcfg.skips)

    def spec_of(tree, path_fn):
        return path_fn(tree).spec

    # params: alternating col/row; skip layer (2, even) stays col
    fc = shs.params["coarse"]["fc_net"]
    assert fc[0]["w"].spec == P(None, "model")
    assert fc[0]["b"].spec == P("model")
    assert fc[1]["w"].spec == P("model", None)
    assert fc[1]["b"].spec == P()
    assert fc[2]["w"].spec == P(None, "model")
    assert fc[3]["w"].spec == P("model", None)
    # heads + step replicated
    assert shs.params["coarse"]["sigma_from_xyz"][0]["w"].spec == P()
    assert shs.step.spec == P()
    # Adam mu/nu mirror the parameter layout (same path tail)
    flat, _ = jax.tree_util.tree_flatten_with_path(shs.opt_state)
    mirrored = [s.spec for path, s in flat
                if any(getattr(k, "key", None) == "fc_net" for k in path)]
    assert P(None, "model") in mirrored and P("model", None) in mirrored

    # an ODD skip index forces column-parallel (the input-dim slice of a
    # skip layer's W must stay shard-local)
    assert trunk_spec(
        _path_for("fc_net", 3, "w"), skips=(3,)) == P(None, "model")

    assert model_axis_size(mesh) == 4 and data_axis_size(mesh) == 2
    assert model_axis_size(make_mesh(8)) == 1
    assert data_axis_size(make_mesh(8)) == 8


def _path_for(name, idx, leaf):
    from jax.tree_util import DictKey, SequenceKey
    return (DictKey("coarse"), DictKey(name), SequenceKey(idx),
            DictKey(leaf))


# ------------------------------------------------- trajectory vs 1 device

def test_tp_train_step_matches_single_device():
    mcfg, rcfg, tcfg = _cfg()
    state1, opt = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg, 100)
    mesh = tp_mesh(2, 4)
    shs = state_shardings(mesh, state1, skips=mcfg.skips)
    state_tp = shard_state(mesh, state1, skips=mcfg.skips)

    step1 = make_train_step(mcfg, rcfg, tcfg, opt, donate=False)
    step_tp = make_train_step(mcfg, rcfg, tcfg, opt, mesh=mesh,
                              donate=False, state_shardings=shs)

    key = jax.random.PRNGKey(3)
    losses1, losses_tp = [], []
    for i in range(3):
        b = _batch(128, seed=i)
        state1, m1 = step1(state1, jax.tree_util.tree_map(jnp.asarray, b),
                           key, _gates())
        state_tp, mt = step_tp(state_tp, shard_batch(mesh, b),
                               replicate(mesh, key),
                               replicate(mesh, _gates()))
        losses1.append(float(m1["loss"]))
        losses_tp.append(float(mt["loss"]))
    np.testing.assert_allclose(losses_tp, losses1, rtol=2e-4)

    # trunk weights remain sharded after the update: each device holds
    # feat / n_model columns of a column-parallel layer
    w = state_tp.params["coarse"]["fc_net"][0]["w"]
    assert w.sharding.spec == P(None, "model")
    local = w.addressable_shards[0].data
    assert local.shape == (w.shape[0], w.shape[1] // 4)
    # and the updated values match the replicated run
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(state1.params["coarse"]["fc_net"][0]["w"]),
        rtol=2e-4, atol=2e-6)


# ------------------------------------- fused + scan loop, sharded store

def test_tp_fused_and_scan_loop_with_sharded_store():
    from brdfnerf_tpu.data.batcher import ShardedRayBatcher

    mcfg, rcfg, tcfg = _cfg()
    mesh = tp_mesh(2, 4)
    sched = GateSchedule(t_cos_irra=-1.0, t_ds_drop=1e9, t_nrrg=-1.0,
                         steps_per_epoch=10, first_beta_epoch=0)
    store_arrays = _batch(512)
    state0, opt = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg, 10)
    shs = state_shardings(mesh, state0, skips=mcfg.skips)

    # reference trajectory: fused step, replicated 1-D mesh semantics are
    # already pinned elsewhere — here the baseline is the 8-dev DP fused
    # step (replicated store), and TP must reproduce it from the SAME
    # sharded-store draws via global_indices
    batcher = ShardedRayBatcher(store_arrays, tcfg.batch_size, mesh,
                                seed=11)
    idx_rows = [batcher.next_indices() for _ in range(6)]

    dp_mesh = make_mesh(8)
    base_key = jax.random.PRNGKey(5)

    # the DP twin starts from an independent HOST copy: on the CPU
    # platform device_put can alias the source buffer, so two mesh
    # placements of the same state share storage — and the TP loop's
    # donated state would delete the DP twin's buffers with it
    from jax.sharding import NamedSharding
    st = shard_state(mesh, state0, skips=mcfg.skips)
    st_dp = replicate(dp_mesh, jax.tree_util.tree_map(
        lambda x: np.array(x), state0))

    # TP fused steps over the 'data'-sharded store
    fused_tp = make_fused_train_step(mcfg, rcfg, tcfg, opt, sched,
                                     mesh=mesh, store_sharded=True,
                                     state_shardings=shs)
    idx_sh = NamedSharding(mesh, P("data"))
    tp_losses = []
    for row in idx_rows[:3]:
        st, m = fused_tp(st, batcher.store, jax.device_put(row, idx_sh),
                         replicate(mesh, base_key))
        tp_losses.append(float(m["loss"]))

    # the same draws replayed on the DP mesh (replicated store, global
    # indices) — the 2x4 TP run must track the 8-dev DP run; note the
    # stores differ in shard count (2 vs 8), so replay through the PADDED
    # host twin of the 2-shard store
    padded = batcher.padded_arrays(store_arrays)
    fused_dp = make_fused_train_step(mcfg, rcfg, tcfg, opt, sched,
                                     mesh=dp_mesh)
    store_dp = {k: jax.device_put(v, NamedSharding(dp_mesh, P()))
                for k, v in padded.items()}
    dp_losses = []
    for row in idx_rows[:3]:
        g = batcher.global_indices(row).astype(np.int32)
        st_dp, m = fused_dp(st_dp, store_dp,
                            jax.device_put(g, NamedSharding(dp_mesh,
                                                            P("data"))),
                            replicate(dp_mesh, base_key))
        dp_losses.append(float(m["loss"]))
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-4)

    # scan-chunked loop under TP continues the SAME trajectory
    scan_tp = make_scan_train_step(mcfg, rcfg, tcfg, opt, sched,
                                   mesh=mesh, store_sharded=True,
                                   state_shardings=shs)
    mat = np.stack(idx_rows[3:6])
    mat_sh = jax.device_put(mat, NamedSharding(mesh, P(None, "data")))
    st, last = scan_tp(st, batcher.store, mat_sh, replicate(mesh, base_key))
    for row in idx_rows[3:6]:
        g = batcher.global_indices(row).astype(np.int32)
        st_dp, m = fused_dp(st_dp, store_dp,
                            jax.device_put(g, NamedSharding(dp_mesh,
                                                            P("data"))),
                            replicate(dp_mesh, base_key))
    np.testing.assert_allclose(float(last["loss"]), float(m["loss"]),
                               rtol=2e-4)
    assert int(st.step) == 6


# ------------------------------------------------------------- rendering

def test_tp_render_matches_single_device():
    mcfg, rcfg, tcfg = _cfg()
    state, _ = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg, 100)
    mesh = tp_mesh(2, 4)
    state_tp = shard_state(mesh, state, skips=mcfg.skips)

    b = _batch(256)
    key = jax.random.PRNGKey(9)
    fn = make_render_step(mcfg, rcfg)
    inp = RenderInputs(rays=jnp.asarray(b["rays"]),
                       ts=jnp.asarray(b["ts"]))
    res1 = fn(state.params, inp, key)

    fn_tp = make_render_step(mcfg, rcfg, mesh=mesh)
    inp_tp = RenderInputs(rays=shard_batch(mesh, b["rays"]),
                          ts=shard_batch(mesh, b["ts"]))
    res_tp = fn_tp(state_tp.params, inp_tp, replicate(mesh, key))
    np.testing.assert_allclose(np.asarray(res_tp["rgb_coarse"]),
                               np.asarray(res1["rgb_coarse"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_tp["depth_coarse"]),
                               np.asarray(res1["depth_coarse"]),
                               rtol=1e-4, atol=1e-5)


def test_tp_scaled_trunk_converges_on_mesh():
    """TP at the scale it exists FOR (parallel/tensor.py module note): a
    12-layer 2048-wide trunk — ~50 M trunk params, 24x the reference
    trunk, past single-chip comfort once Adam state and activations are
    added — trains on the 2x4 (data, model) mesh: the loss drops, every
    trunk layer's weights live 'model'-sharded before AND after updates
    (each device holds a 1/4 column or row slice), and a training step
    keeps the layout (no silent re-replication by the jit).

    The memory economics this enables are quantified in
    examples/tp_memory_analysis.py (BASELINE.md 'Tensor parallelism'
    row); this test pins the capability itself at depth."""
    mcfg = ModelConfig(variant="spsbrdf-nerf", siren=True, mapping=True,
                       layers=12, feat=2048, skips=(4,), normal="none")
    rcfg = RenderConfig(n_samples=4, guided_samples=0, apply_brdf=False,
                        fused_trunk=False, use_pallas=False)
    tcfg = TrainConfig(lr=3e-4, batch_size=16)
    mesh = tp_mesh(2, 4)

    state, opt = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg, 100)
    shs = state_shardings(mesh, state, skips=mcfg.skips)
    state = shard_state(mesh, state, skips=mcfg.skips)

    # layout: column-parallel on even + skip layers, row-parallel on odd
    fc = state.params["coarse"]["fc_net"]
    for i, layer in enumerate(fc):
        col = (i % 2 == 0) or (i in mcfg.skips)
        want = P(None, "model") if col else P("model", None)
        assert layer["w"].sharding.spec == want, (i, layer["w"].sharding)
        local = layer["w"].addressable_shards[0].data
        full = layer["w"].shape
        assert local.shape == ((full[0], full[1] // 4) if col
                               else (full[0] // 4, full[1])), (i, local.shape)

    step = make_train_step(mcfg, rcfg, tcfg, opt, mesh=mesh,
                           state_shardings=shs)
    key = jax.random.PRNGKey(7)
    # fixed-batch overfit: measured trajectory at this scale/lr drops
    # 0.086 -> 0.004 by step 30 (bounces at chance with per-step random
    # batches — there is nothing to generalize on noise targets)
    b = shard_batch(mesh, {k: jnp.asarray(v)
                           for k, v in _batch(16, seed=0).items()})
    losses = []
    for _ in range(30):
        state, m = step(state, b, replicate(mesh, key),
                        replicate(mesh, _gates()))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < 0.15 * losses[0], losses
    # updates preserved the sharded layout
    w = state.params["coarse"]["fc_net"][1]["w"]
    assert w.sharding.spec == P("model", None)
    assert w.addressable_shards[0].data.shape == (2048 // 4, 2048)


# ----------------------------------------------- Trainer / CLI reachability

def test_trainer_tp_matches_dp(tmp_path):
    """The user-facing TP path (Trainer(mesh=tp_mesh(...)), what the train
    CLI's --tp flag builds): the 2x4 (data, model) Trainer must track the
    8-dev DP Trainer step for step (same seed -> identical batcher draws),
    with the TP run driving the SCAN-chunked loop so the Trainer's
    state_shardings plumbing is exercised on both step-fn kinds; trunk
    weights stay 'model'-sharded through fit, the final checkpoint save
    (epoch=N.npz from TP-sharded arrays) round-trips, and the scan
    full-image render path accepts the TP param shardings."""
    import dataclasses as dc
    from brdfnerf_tpu.config import RunConfig
    from brdfnerf_tpu.train import Trainer, TrainerPaths
    from brdfnerf_tpu.utils import checkpoint as ckpt

    mcfg, rcfg, tcfg = _cfg()
    tcfg = dc.replace(tcfg, max_train_steps=8)
    cfg = RunConfig(model=mcfg, render=rcfg, train=tcfg)
    store = _batch(512)

    trainers = {}
    for name, mesh, chunk in (("dp", make_mesh(8), 1),
                              ("tp", tp_mesh(2, 4), 2)):
        tr = Trainer(cfg, store,
                     TrainerPaths(logs_dir=str(tmp_path / f"l_{name}"),
                                  ckpts_dir=str(tmp_path / f"c_{name}")),
                     mesh=mesh, seed=0)
        m = tr.fit(max_steps=8, log_every=4, eval_every_n_epochs=0,
                   save_ckpt_every_n_epochs=0, progress=False,
                   scan_chunk=chunk)
        trainers[name] = (m, tr)
    (m_dp, tr_dp), (m_tp, tr_tp) = trainers["dp"], trainers["tp"]
    np.testing.assert_allclose(m_tp["loss"], m_dp["loss"], rtol=5e-4)
    np.testing.assert_allclose(m_tp["psnr"], m_dp["psnr"], rtol=5e-4)

    # trunk stayed TP-sharded through the whole fit
    w = tr_tp.state.params["coarse"]["fc_net"][0]["w"]
    assert w.sharding.spec == P(None, "model")
    # and landed within reduction tolerance of the DP weights
    np.testing.assert_allclose(
        np.asarray(w),
        np.asarray(tr_dp.state.params["coarse"]["fc_net"][0]["w"]),
        rtol=5e-4, atol=5e-6)

    # the final-save checkpoint materialized host-side from sharded arrays
    ck = str(tmp_path / "c_tp" / "epoch=1.npz")
    assert ckpt.checkpoint_step(ck) == 8
    restored = ckpt.restore_params(tr_dp.state.params, ck)
    np.testing.assert_allclose(
        np.asarray(restored["coarse"]["fc_net"][0]["w"]),
        np.asarray(w), rtol=1e-6)

    # scan full-image render under TP param shardings vs the DP render
    # (params differ by the trained-weight tolerance above, and the siren
    # trunk amplifies isolated rays — bound the mean, not the max)
    sample = {"rays": _batch(512, seed=5)["rays"]}
    out_dp = tr_dp.render_image(sample, chunk=128)
    out_tp = tr_tp.render_image(sample, chunk=128)
    d = np.abs(out_tp["rgb_coarse"] - out_dp["rgb_coarse"])
    assert np.isfinite(out_tp["rgb_coarse"]).all()
    assert float(d.mean()) < 2e-3, float(d.mean())
