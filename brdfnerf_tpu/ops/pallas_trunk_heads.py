"""Flagship-config extension of the fused trunk VJP: the HEAD block
(feats_from_xyz + rgb + merged RPV(111)) joins the kernel pair.

STATUS — MEASURED NEGATIVE RESULT (round 5), kept with full parity
tests behind ``BRDFNERF_FUSED_HEADS=1``: on v5e at flagship shapes this
path ran **37.6 ms/step vs 33.2** for the default (trunk kernels + XLA
heads).  The hypothesis was sound — the XLA head block costs ~5.5 ms of
which ~1.5 ms is pure cotangent/activation HBM streams — but the
backward kernel's grid is SEQUENTIAL (weight-grad accumulation), and
the added per-tile head recompute + 10 extra VMEM accumulators cost
more pipeline overlap than the saved streams bought.  Together with
round 2's negative result 1 (a SEPARATE head kernel pair, also slower),
this pins the conclusion that XLA owns this head block on v5e; the
module remains as the documented experiment and a starting point for
hardware where the balance differs.

Original motivation (round-5 profile of the 33.2 ms flagship step): the
XLA head block costs ~5.5 ms, of which ~1.5 ms is elementwise/bias
cotangent streams (each (131k, 768/512/256) activation and cotangent
round-trips HBM once per consumer) and the rest thin dots at ~80-90% of
roofline.  Inside the kernel the same math runs on VMEM-resident
activations: the only new HBM traffic is one packed (N, 8) head-output
column block and its cotangent — the feats (131k x 512) output and its
backward stream disappear entirely (heads were its only consumer in
this config).

Head math (models/network.py:426-514 for the flagship head set):

    xf  = h @ Wf + bf                      # feats_from_xyz, NO activation
    hr  = act(xf @ W1r + b1r)              # rgb hidden (siren w0=1)
    rgb = sigmoid(hr @ W2r + b2r)          # sigmoid applied OUTSIDE
    hp  = act(xf @ W1p + b1p)              # merged k|theta|rhoc hidden
    z2p = hp @ W2p_blockdiag               # 3 cols (dim_rpv == 1)

The kernel emits LOGITS packed as (N, 8) f32 columns
[sigma, rgb0, rgb1, rgb2, k, theta, rhoc, 0]; sigmoid and the RPV
rescalings ([0,2] / [-1,1] / [0,1], spsbrdfnerf.py:717-745) stay in XLA
on the small per-column slices, so their backward feeds the kernel
logit cotangents through the same packed layout.

Backward: the head chains are FIRST-order only (no coupling to the
density-gradient tangent t): the per-tile recompute of xf/hr/hp from the
saved trunk pre-activations costs ~1 ms of MACs and replaces a ~0.9 ms
HBM save/load, and the head cotangent chain ends as an extra seed on
a_h — the trunk reverse sweep is byte-identical to pallas_trunk_vjp's.

Gradient parity vs the XLA twin (apply_network_with_normals with
fused_trunk=False) is tested in tests/test_pallas.py (CPU interpret).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .pallas_mlp import pack_trunk_weights, _round_up, LANE
from .pallas_trunk_vjp import (TILE_N, _act_all, _softplus, _mm, _mm_t,
                               _outer, _forward_chain, _grad_chain,
                               _static, _interpret_default, _unpack_grads,
                               _w0_of)

HEAD_COLS = 8          # packed head-output width: sigma, rgb(3), k, th, rc, pad
RPV_NAMES = ("k_from_xyz", "theta_rpv_from_xyz", "rhoc_from_xyz")


def heads_kernel_supports(cfg: ModelConfig, params: Dict,
                          dirs=None, t_emb=None,
                          apply_brdf: bool = False,
                          apply_theta: bool = False,
                          nr_lr: bool = False) -> bool:
    """True when the head set is EXACTLY the flagship's: RPV(111) at
    dim_rpv==1, rgb on xyz_features alone (no view dirs), analytic-only
    normals, no sun_v/sky/beta/roughness heads in play."""
    from .pallas_mlp import kernel_supports
    if not (kernel_supports(cfg) and apply_brdf and not apply_theta
            and cfg.rpv and cfg.func_m and cfg.func_f and cfg.func_h == 1
            and cfg.dim_rpv == 1 and not nr_lr
            and dirs is None and t_emb is None
            and "sun_v_net" not in params and "sky_color" not in params):
        return False
    feat = cfg.feat
    hid = feat // 2
    try:
        ok = (len(params["feats_from_xyz"]) == 1
              and params["feats_from_xyz"][0]["w"].shape == (feat, feat)
              and len(params["rgb_from_xyzdir"]) == 2
              and params["rgb_from_xyzdir"][0]["w"].shape == (feat, hid)
              and params["rgb_from_xyzdir"][1]["w"].shape == (hid, 3)
              and all(len(params[n]) == 2
                      and params[n][0]["w"].shape == (feat, hid)
                      and params[n][1]["w"].shape == (hid, 1)
                      for n in RPV_NAMES))
    except (KeyError, IndexError, AttributeError):
        return False
    return ok


def pack_head_weights(params: Dict, cfg: ModelConfig, dtype) -> Dict:
    """Flatten the flagship head set into kernel-ready padded matrices.

    w2r / w2p output columns are padded to LANE so the in-kernel dots hit
    aligned tiles; w2p is the block-diagonal merge of the three (hid, 1)
    RPV second layers (cols 0=k, 1=theta, 2=rhoc)."""
    feat = cfg.feat
    hid = feat // 2
    f32 = jnp.float32

    def cast(a):
        return a.astype(dtype)

    wf = params["feats_from_xyz"][0]
    r1, r2 = params["rgb_from_xyzdir"]
    p1s = [params[n][0] for n in RPV_NAMES]
    p2s = [params[n][1] for n in RPV_NAMES]

    w2r = jnp.zeros((hid, LANE), dtype).at[:, :3].set(cast(r2["w"]))
    b2r = jnp.zeros((LANE,), f32).at[:3].set(r2["b"].astype(f32))
    w2p = jnp.zeros((3 * hid, LANE), dtype)
    for i, p in enumerate(p2s):
        w2p = w2p.at[i * hid:(i + 1) * hid, i:i + 1].set(cast(p["w"]))
    b2p = jnp.zeros((LANE,), f32).at[:3].set(
        jnp.concatenate([p["b"] for p in p2s]).astype(f32))
    return {
        "wf": cast(wf["w"]), "bf": wf["b"].astype(f32),
        "w1r": cast(r1["w"]), "b1r": r1["b"].astype(f32),
        "w2r": w2r, "b2r": b2r,
        "w1p": jnp.concatenate([cast(p["w"]) for p in p1s], axis=1),
        "b1p": jnp.concatenate([p["b"] for p in p1s]).astype(f32),
        "w2p": w2p, "b2p": b2p,
    }


def _head_forward(h, hw, od, siren, fast):
    """xf, (z1r, hr), (z1p, hp), z2r, z2p from the trunk output h."""
    xf = _mm(h, hw["wf"], od) + hw["bf"]
    z1r = _mm(xf, hw["w1r"], od) + hw["b1r"]
    hr, d1r, _ = _act_all(z1r, 1.0, siren, fast, False)
    z2r = _mm(hr, hw["w2r"], od) + hw["b2r"]
    z1p = _mm(xf, hw["w1p"], od) + hw["b1p"]
    hp, d1p, _ = _act_all(z1p, 1.0, siren, fast, False)
    z2p = _mm(hp, hw["w2p"], od) + hw["b2p"]
    return xf, hr, d1r, z2r, hp, d1p, z2p


# ------------------------------------------------------------ fwd kernel

def _fwd_kernel_h(x_ref, w0_r, b0_r, wm_r, bm_r, wst_r, wsb_r, bs_r,
                  wsig_r, bsig_r,
                  wf_r, bf_r, w1r_r, b1r_r, w2r_r, b2r_r,
                  w1p_r, b1p_r, w2p_r, b2p_r,
                  out_ref, gx_ref, *zs_refs,
                  layers: int, skip: int, siren: bool, fast: bool, od):
    packed = {"w0": w0_r[:], "b0": b0_r[:], "w_mid": wm_r[:],
              "b_mid": bm_r[:], "w_skip_top": wst_r[:],
              "w_skip_bot": wsb_r[:], "b_skip": bs_r[:],
              "w_sigma": wsig_r[:], "b_sigma": bsig_r[:]}
    hw = {"wf": wf_r[:], "bf": bf_r[:], "w1r": w1r_r[:], "b1r": b1r_r[:],
          "w2r": w2r_r[:], "b2r": b2r_r[:], "w1p": w1p_r[:],
          "b1p": b1p_r[:], "w2p": w2p_r[:], "b2p": b2p_r[:]}
    x = x_ref[:]
    hs, d1s, _, zsig, zs = _forward_chain(x, packed, layers, skip, siren,
                                          fast, od)
    _, _, _, z2r, _, _, z2p = _head_forward(hs[-1], hw, od, siren, fast)
    out_ref[:] = jnp.concatenate(
        [_softplus(zsig[:, 0:1]), z2r[:, 0:3], z2p[:, 0:3],
         jnp.zeros_like(zsig[:, 0:1])], axis=1)
    lane_mask = (jax.lax.broadcasted_iota(jnp.int32, zsig.shape, 1)
                 == 0).astype(jnp.float32)
    gx_ref[:] = _grad_chain(x, packed, d1s, zsig, layers, skip, siren, fast,
                            od, lane_mask)
    if zs_refs:
        zs_refs[0][:] = jnp.concatenate(zs, axis=-1).astype(
            zs_refs[0].dtype)


# ------------------------------------------------------------ bwd kernel

def _bwd_kernel_h(x_ref, cot_ref, cg_ref, zs_ref,
                  w0_r, b0_r, wm_r, bm_r, wst_r, wsb_r, bs_r, wsig_r,
                  bsig_r,
                  wf_r, bf_r, w1r_r, b1r_r, w2r_r, b2r_r,
                  w1p_r, b1p_r, w2p_r, b2p_r,
                  dw0_ref, db0_ref, dwm_ref, dbm_ref, dwst_ref, dwsb_ref,
                  dbs_ref, dwsig_ref, dbsig_ref,
                  dwf_ref, dbf_ref, dw1r_ref, db1r_ref, dw2r_ref, db2r_ref,
                  dw1p_ref, db1p_ref, dw2p_ref, db2p_ref, *,
                  layers: int, skip: int, siren: bool, fast: bool, od):
    packed = {"w0": w0_r[:], "b0": b0_r[:], "w_mid": wm_r[:],
              "b_mid": bm_r[:], "w_skip_top": wst_r[:],
              "w_skip_bot": wsb_r[:], "b_skip": bs_r[:],
              "w_sigma": wsig_r[:], "b_sigma": bsig_r[:]}
    hw = {"wf": wf_r[:], "bf": bf_r[:], "w1r": w1r_r[:], "b1r": b1r_r[:],
          "w2r": w2r_r[:], "b2r": b2r_r[:], "w1p": w1p_r[:],
          "b1p": b1p_r[:], "w2p": w2p_r[:], "b2p": b2p_r[:]}
    x = x_ref[:]
    t = cg_ref[:]
    cot = cot_ref[:]                                  # (T, HEAD_COLS)
    cs = cot[:, 0:1]

    feat = wsig_r.shape[0]
    zs_all = zs_ref[:]
    hs, d1s, d2s = [], [], []
    for i in range(layers):
        z = zs_all[:, i * feat:(i + 1) * feat].astype(jnp.float32)
        h, d1, d2 = _act_all(z, _w0_of(i), siren, fast, True)
        hs.append(h)
        d1s.append(d1)
        d2s.append(d2)
    zsig = _mm(hs[-1], packed["w_sigma"], od) + packed["b_sigma"]

    # tangent forward (trunk only — heads carry no tangent)
    tzs, ths = [], []
    th = None
    mid = 0
    for i in range(layers):
        if i == 0:
            tz = _mm(t, packed["w0"], od)
        elif i == skip:
            tz = (_mm(t, packed["w_skip_top"], od)
                  + _mm(th, packed["w_skip_bot"], od))
        else:
            tz = _mm(th, packed["w_mid"][mid], od)
            mid += 1
        th = d1s[i] * tz
        tzs.append(tz)
        ths.append(th)
    tzsig = _mm(th, packed["w_sigma"], od)

    lane_mask = (jax.lax.broadcasted_iota(jnp.int32, zsig.shape, 1)
                 == 0).astype(jnp.float32)
    sp1 = jax.nn.sigmoid(zsig)
    sp2 = sp1 * (1.0 - sp1)
    a_z = (cs * sp1 + sp2 * tzsig) * lane_mask
    b_tz = sp1 * lane_mask

    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val

    # ---- head recompute + first-order backward chain -> a_h seed
    xf, hr, d1r, _, hp, d1p, _ = _head_forward(hs[-1], hw, od, siren, fast)
    zero_pad = jnp.zeros((cot.shape[0], LANE - 3), jnp.float32)
    c_z2r = jnp.concatenate([cot[:, 1:4], zero_pad], axis=1)   # (T, LANE)
    c_z2p = jnp.concatenate([cot[:, 4:7], zero_pad], axis=1)
    acc(dw2r_ref, _outer(hr, c_z2r, od))
    acc(db2r_ref, jnp.sum(c_z2r, axis=0))
    acc(dw2p_ref, _outer(hp, c_z2p, od))
    acc(db2p_ref, jnp.sum(c_z2p, axis=0))
    c_z1r = d1r * _mm_t(c_z2r, hw["w2r"], od)
    c_z1p = d1p * _mm_t(c_z2p, hw["w2p"], od)
    acc(dw1r_ref, _outer(xf, c_z1r, od))
    acc(db1r_ref, jnp.sum(c_z1r, axis=0))
    acc(dw1p_ref, _outer(xf, c_z1p, od))
    acc(db1p_ref, jnp.sum(c_z1p, axis=0))
    a_xf = _mm_t(c_z1r, hw["w1r"], od) + _mm_t(c_z1p, hw["w1p"], od)
    acc(dwf_ref, _outer(hs[-1], a_xf, od))
    acc(dbf_ref, jnp.sum(a_xf, axis=0))
    a_h_heads = _mm_t(a_xf, hw["wf"], od)

    acc(dwsig_ref, _outer(hs[-1], a_z, od) + _outer(ths[-1], b_tz, od))
    acc(dbsig_ref, jnp.sum(a_z, axis=0))
    a_h = _mm_t(a_z, packed["w_sigma"], od) + a_h_heads
    b_th = _mm_t(b_tz, packed["w_sigma"], od)

    # ---- trunk reverse sweep (identical to pallas_trunk_vjp._bwd_kernel)
    dwm_parts = [None] * max(layers - 2, 0)
    dbm_parts = [None] * max(layers - 2, 0)
    mid = layers - 3
    for i in range(layers - 1, -1, -1):
        a_zl = d1s[i] * a_h + d2s[i] * tzs[i] * b_th
        b_tzl = d1s[i] * b_th
        if i == 0:
            acc(dw0_ref, _outer(x, a_zl, od) + _outer(t, b_tzl, od))
            acc(db0_ref, jnp.sum(a_zl, axis=0))
        elif i == skip:
            acc(dwst_ref, _outer(x, a_zl, od) + _outer(t, b_tzl, od))
            acc(dwsb_ref, _outer(hs[i - 1], a_zl, od)
                + _outer(ths[i - 1], b_tzl, od))
            acc(dbs_ref, jnp.sum(a_zl, axis=0))
            a_h = _mm_t(a_zl, packed["w_skip_bot"], od)
            b_th = _mm_t(b_tzl, packed["w_skip_bot"], od)
        else:
            dwm_parts[mid] = (_outer(hs[i - 1], a_zl, od)
                              + _outer(ths[i - 1], b_tzl, od))
            dbm_parts[mid] = jnp.sum(a_zl, axis=0)
            a_h = _mm_t(a_zl, packed["w_mid"][mid], od)
            b_th = _mm_t(b_tzl, packed["w_mid"][mid], od)
            mid -= 1
    if layers > 2:
        acc(dwm_ref, jnp.stack(dwm_parts))
        acc(dbm_ref, jnp.stack(dbm_parts))


# --------------------------------------------------------------- plumbing

_HEAD_W_KEYS = ("wf", "bf", "w1r", "b1r", "w2r", "b2r",
                "w1p", "b1p", "w2p", "b2p")


def _head_specs(cfg: ModelConfig, for_grads: bool = False):
    """(BlockSpec, ShapeDtypeStruct) lists for the packed head weights
    (or their f32 grad accumulators)."""
    feat = cfg.feat
    hid = feat // 2
    shapes = {"wf": (feat, feat), "bf": (feat,),
              "w1r": (feat, hid), "b1r": (hid,),
              "w2r": (hid, LANE), "b2r": (LANE,),
              "w1p": (feat, 3 * hid), "b1p": (3 * hid,),
              "w2p": (3 * hid, LANE), "b2p": (LANE,)}
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    specs = [full(shapes[k]) for k in _HEAD_W_KEYS]
    structs = [jax.ShapeDtypeStruct(shapes[k], jnp.float32)
               for k in _HEAD_W_KEYS]
    return specs, structs


def _run_fwd_h(cfg: ModelConfig, packed: Dict, hw: Dict, x_enc,
               interpret=None, want_zs: bool = False):
    if interpret is None:
        interpret = _interpret_default()
    layers, skip, siren, fast, od = _static(cfg)
    n, ein = x_enc.shape
    ein_p = packed["w0"].shape[0]
    feat = cfg.feat
    n_p = _round_up(max(n, TILE_N), TILE_N)
    if n == n_p and ein == ein_p:
        x = x_enc.astype(jnp.float32)
    else:
        x = jnp.zeros((n_p, ein_p), jnp.float32).at[:n, :ein].set(
            x_enc.astype(jnp.float32))
    grid = (n_p // TILE_N,)
    kern = functools.partial(_fwd_kernel_h, layers=layers, skip=skip,
                             siren=siren, fast=fast, od=od)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    row = lambda c: pl.BlockSpec((TILE_N, c), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    n_mid = max(layers - 2, 0)
    params_tpu = (None if interpret else
                  pltpu.CompilerParams(
                      vmem_limit_bytes=100 * 1024 * 1024,
                      dimension_semantics=("parallel",)))
    head_specs, _ = _head_specs(cfg)
    out_specs = [row(HEAD_COLS), row(ein_p)]
    out_shape = [jax.ShapeDtypeStruct((n_p, HEAD_COLS), jnp.float32),
                 jax.ShapeDtypeStruct((n_p, ein_p), jnp.float32)]
    if want_zs:
        zs_dt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16_all"
                 else jnp.float32)
        out_specs.append(row(layers * feat))
        out_shape.append(jax.ShapeDtypeStruct((n_p, layers * feat), zs_dt))
    outs = pl.pallas_call(
        kern, grid=grid, compiler_params=params_tpu,
        in_specs=[row(ein_p),
                  full((ein_p, feat)), full((feat,)),
                  full((n_mid, feat, feat)), full((n_mid, feat)),
                  full((ein_p, feat)), full((feat, feat)), full((feat,)),
                  full((feat, LANE)), full((LANE,))] + head_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(x, packed["w0"], packed["b0"], packed["w_mid"], packed["b_mid"],
      packed["w_skip_top"], packed["w_skip_bot"], packed["b_skip"],
      packed["w_sigma"], packed["b_sigma"],
      *[hw[k] for k in _HEAD_W_KEYS])
    res = (outs[0][:n], outs[1][:n])
    if want_zs:
        return res + (outs[2],)
    return res


def _run_bwd_h(cfg: ModelConfig, packed: Dict, hw: Dict, x_enc, c_out,
               c_g, zs, interpret=None):
    if interpret is None:
        interpret = _interpret_default()
    layers, skip, siren, fast, od = _static(cfg)
    n, ein = x_enc.shape
    ein_p = packed["w0"].shape[0]
    feat = cfg.feat
    n_p = _round_up(max(n, TILE_N), TILE_N)

    def padrow(v, cols):
        if v.shape == (n_p, cols):
            return v.astype(jnp.float32)
        out = jnp.zeros((n_p, cols), jnp.float32)
        return out.at[:n, :v.shape[1]].set(v.astype(jnp.float32))

    x = padrow(x_enc, ein_p)
    cot = padrow(c_out, HEAD_COLS)
    cg = padrow(c_g, ein_p)
    assert zs.shape == (n_p, layers * feat), (zs.shape, n_p, layers, feat)

    grid = (n_p // TILE_N,)
    kern = functools.partial(_bwd_kernel_h, layers=layers, skip=skip,
                             siren=siren, fast=fast, od=od)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    row = lambda c: pl.BlockSpec((TILE_N, c), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    n_mid = max(layers - 2, 0)
    params_tpu = (None if interpret else
                  pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
    head_specs, head_grad_structs = _head_specs(cfg)
    outs = pl.pallas_call(
        kern, grid=grid, compiler_params=params_tpu,
        in_specs=[row(ein_p), row(HEAD_COLS), row(ein_p),
                  row(layers * feat),
                  full((ein_p, feat)), full((feat,)),
                  full((n_mid, feat, feat)), full((n_mid, feat)),
                  full((ein_p, feat)), full((feat, feat)), full((feat,)),
                  full((feat, LANE)), full((LANE,))] + head_specs,
        out_specs=(full((ein_p, feat)), full((feat,)),
                   full((n_mid, feat, feat)), full((n_mid, feat)),
                   full((ein_p, feat)), full((feat, feat)), full((feat,)),
                   full((feat, LANE)), full((LANE,)))
                  + tuple(full(s.shape) for s in head_grad_structs),
        out_shape=(jax.ShapeDtypeStruct((ein_p, feat), jnp.float32),
                   jax.ShapeDtypeStruct((feat,), jnp.float32),
                   jax.ShapeDtypeStruct((n_mid, feat, feat), jnp.float32),
                   jax.ShapeDtypeStruct((n_mid, feat), jnp.float32),
                   jax.ShapeDtypeStruct((ein_p, feat), jnp.float32),
                   jax.ShapeDtypeStruct((feat, feat), jnp.float32),
                   jax.ShapeDtypeStruct((feat,), jnp.float32),
                   jax.ShapeDtypeStruct((feat, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((LANE,), jnp.float32))
                  + tuple(head_grad_structs),
        interpret=interpret,
    )(x, cot, cg, zs,
      packed["w0"], packed["b0"], packed["w_mid"], packed["b_mid"],
      packed["w_skip_top"], packed["w_skip_bot"], packed["b_skip"],
      packed["w_sigma"], packed["b_sigma"],
      *[hw[k] for k in _HEAD_W_KEYS])
    return outs


def _unpack_head_grads(cfg: ModelConfig, outs) -> Dict:
    """Packed head-weight grads -> the per-head param pytree (the padded
    columns/blocks of w2r/w2p address no real parameter and are sliced
    away)."""
    (dwf, dbf, dw1r, db1r, dw2r, db2r, dw1p, db1p, dw2p, db2p) = outs
    hid = cfg.feat // 2
    d = {"feats_from_xyz": [{"w": dwf, "b": dbf}],
         "rgb_from_xyzdir": [{"w": dw1r, "b": db1r},
                             {"w": dw2r[:, :3], "b": db2r[:3]}]}
    for i, name in enumerate(RPV_NAMES):
        d[name] = [{"w": dw1p[:, i * hid:(i + 1) * hid],
                    "b": db1p[i * hid:(i + 1) * hid]},
                   {"w": dw2p[i * hid:(i + 1) * hid, i:i + 1],
                    "b": db2p[i:i + 1]}]
    return d


_SUB_KEYS = ("fc_net", "sigma_from_xyz", "feats_from_xyz",
             "rgb_from_xyzdir") + RPV_NAMES


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def trunk_heads_core(cfg: ModelConfig, params_sub: Dict, x_enc):
    """(packed head logits (n, 8), d sigma/d x_enc (n, ein_p)) of the
    trunk + flagship head block at encoded points.  Columns of the packed
    output: [softplus sigma, rgb logits x3, k, theta, rhoc logits, 0].
    x_enc carries NO gradient (ray points are constants in training)."""
    dtype = _static(cfg)[4]
    packed = pack_trunk_weights(params_sub, cfg, dtype)
    hw = pack_head_weights(params_sub, cfg, dtype)
    return _run_fwd_h(cfg, packed, hw, x_enc)


def _trunk_heads_fwd(cfg, params_sub, x_enc):
    dtype = _static(cfg)[4]
    packed = pack_trunk_weights(params_sub, cfg, dtype)
    hw = pack_head_weights(params_sub, cfg, dtype)
    out, gx, zs = _run_fwd_h(cfg, packed, hw, x_enc, want_zs=True)
    return (out, gx), (params_sub, x_enc, zs)


def _trunk_heads_bwd(cfg, res, cots):
    params_sub, x_enc, zs = res
    c_out, c_g = cots
    dtype = _static(cfg)[4]
    packed = pack_trunk_weights(params_sub, cfg, dtype)
    hw = pack_head_weights(params_sub, cfg, dtype)
    outs = _run_bwd_h(cfg, packed, hw, x_enc, c_out, c_g, zs)
    d_params = _unpack_grads(cfg, params_sub["fc_net"][0]["w"].shape[0],
                             outs[:9])
    d_params.update(_unpack_head_grads(cfg, outs[9:]))
    return d_params, jnp.zeros_like(x_enc)


trunk_heads_core.defvjp(_trunk_heads_fwd, _trunk_heads_bwd)


def fused_trunk_heads_with_grad(params: Dict, cfg: ModelConfig,
                                xyz) -> Dict:
    """Drop-in for the (trunk + flagship heads) portion of
    apply_network_with_normals: returns the named head-output dict
    {sigma, rgb, rpv_k, rpv_theta, rpv_rhoc, normal_an} with the
    positional-encoding jacobian chained in XLA (see
    pallas_trunk_vjp.fused_trunk_with_grad for the padded-width scheme)."""
    from .encoding import _proj_and_phase
    from .compositing import l2_normalize
    sub = {k: params[k] for k in _SUB_KEYS}
    if cfg.mapping:
        ein_p = _round_up(2 * cfg.mapping_sizes[0] * xyz.shape[-1], LANE)
        p, phase = _proj_and_phase(cfg.mapping_sizes[0], xyz.shape[-1],
                                   pad_to=ein_p)
        pm = jnp.asarray(p)
        m = jax.lax.dot_general(
            xyz, pm, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST) + jnp.asarray(phase)
        enc, cos_m, _ = _act_all(m, 1.0, siren=True, fast=cfg.fast_sin,
                                 want_d2=False)
        out_p, gx_enc = trunk_heads_core(cfg, sub,
                                         jax.lax.stop_gradient(enc))
        gx = (gx_enc * cos_m) @ pm.T
    else:
        out_p, gx_enc = trunk_heads_core(cfg, sub,
                                         jax.lax.stop_gradient(xyz))
        gx = gx_enc[:, :xyz.shape[-1]]

    def tile3(v):
        return jnp.tile(v, (1,) * (v.ndim - 1) + (3,))

    # sigmoid + RPV rescalings in XLA on the packed columns — tiny ops
    # whose backward feeds the kernel its logit cotangents
    # (spsbrdfnerf.py:717-745 ranges; models/network.py:486-490)
    return {
        "sigma": out_p[:, 0],
        "rgb": jax.nn.sigmoid(out_p[:, 1:4]),
        "rpv_k": tile3((jax.nn.sigmoid(out_p[:, 4:5]) - 0.5) * 2.0 + 1.0),
        "rpv_theta": tile3((jax.nn.sigmoid(out_p[:, 5:6]) - 0.5) * 2.0),
        "rpv_rhoc": tile3(jax.nn.sigmoid(out_p[:, 6:7])),
        "normal_an": -l2_normalize(gx.astype(jnp.float32)),
    }
