"""Fused differentiated trunk: sigma + feats + density-gradient as ONE
Pallas kernel pair with a hand-derived custom VJP.

The train step's dominant cost (SURVEY.md 3.1; round-1 bench: ~29 ms of a
57 ms step) is the spsbrdf main inference trunk: an 8x512 siren skip-MLP
evaluated at N_rays x N_samples points, needing

    sigma(x), feats(x) = h_{L-1}(x),  g(x) = d sigma / d x_enc

(the analytic normal, spsbrdfnerf.py:648-660), all DIFFERENTIATED through
by the loss — i.e. second-order autodiff.  Under XLA every matmul of the
forward, the g-chain, and their joint backward round-trips activations
through HBM (~17 GB/step at bf16 for the flagship shapes), which makes the
step bytes-bound.  Here the whole computation runs as two Pallas kernels —
forward (fwd chain + g chain) and backward (primal+tangent recompute +
second-order reverse sweep, weight grads accumulated across the grid) —
with every activation VMEM-resident; HBM traffic collapses to inputs,
outputs, and one weight read per point tile.

Math of the backward (the hand-derived second-order VJP).  With output
cotangents c_sigma, c_feats, c_g, the scalar being differentiated is

    S = <c_sigma, sigma> + <c_feats, h_{L-1}> + <c_g, g>.

The g term is rewritten as a directional derivative: for each point,
<c_g, d sigma/d x> = d/d eps sigma(x + eps * c_g)|_0 — so S_g equals the
tangent output of a JVP with input tangent t_x = c_g.  Running the forward
WITH this tangent (z_l, h_l, tz_l, th_l) turns the second-order VJP into a
plain first-order reverse sweep over the doubled (primal, tangent) state:

    a_z = act'(z) * a_h + act''(z) * tz * b_th        (cotangent on z)
    b_tz = act'(z) * b_th                             (cotangent on tz)
    dW  += h_prev^T a_z + th_prev^T b_tz
    db  += sum_rows a_z
    a_h_prev = a_z W^T ;  b_th_prev = b_tz W^T

(the b_th chain is seeded with sigmoid(zsig)*mask and follows the same
recurrence as the forward kernel's d sigma/d x chain, so the fwd kernel
saves its states and the backward loads them instead of recomputing —
one fewer 512-wide matmul per layer in this kernel)

seeded at the sigma head with a = c_sigma*softplus'(zs) + softplus''(zs)*tzs
and b = softplus'(zs), plus c_feats added to a_h_{L-1}.

x_enc never needs a gradient in training (ray points are constants: rays
are batch data, stratified z from near/far, guided z stop-gradiented), so
the wrapper stop-gradients x_enc and the VJP returns zeros for it.

Gradient parity vs. XLA autodiff of the identical math is tested in
tests/test_pallas.py (CPU interpret mode, float32).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .fast_math import _C1, _C3, _C5, _C7, _C9, _TWO_PI, _INV_2PI
from .pallas_mlp import pack_trunk_weights, _round_up, LANE

# point-tile height for the VJP kernel pair.  Swept on v5e at the flagship
# shapes (8x512 trunk, 131k points): 128 -> 47.9 ms/step, 512 -> 47.1,
# 1024 -> 45.5, 256 -> 45.1 (best; deep-enough grid to pipeline the
# per-tile weight reads against compute while keeping the doubled
# primal+tangent state small in VMEM).  Re-swept in round 5 after the
# saved-zs/bf16-stream changes shifted the balance: 256 still best
# (512 -> +1.6 ms, 128 -> +2.7 ms on the 33.2 ms flagship step).  The
# env knob exists for sweeps on new hardware; the default is the
# measured winner.
TILE_N = int(__import__("os").environ.get("BRDFNERF_TRUNK_TILE", "256"))


# ------------------------------------------------------------- activations

def _act_all(z, w0: float, siren: bool, fast: bool, want_d2: bool):
    """(h, act', act'') sharing ONE range reduction + power chain — the
    kernels are partially VPU-bound, so evaluating the three polynomials
    together (instead of re-reducing per use) is a real win."""
    if not siren:
        h = jnp.maximum(z, 0.0)
        d1 = (z > 0.0).astype(z.dtype)
        return h, d1, (jnp.zeros_like(z) if want_d2 else None)
    x = w0 * z
    if not fast:
        sx = jnp.sin(x)
        return sx, w0 * jnp.cos(x), (-(w0 * w0) * sx if want_d2 else None)
    v = x - _TWO_PI * jnp.round(x * _INV_2PI)
    v2 = v * v
    h = v * (_C1 + v2 * (_C3 + v2 * (_C5 + v2 * (_C7 + v2 * _C9))))
    p1 = _C1 + v2 * (3 * _C3 + v2 * (5 * _C5 + v2 * (7 * _C7 + v2 * 9 * _C9)))
    d2 = None
    if want_d2:
        d2 = (w0 * w0) * v * (6 * _C3 + v2 * (20 * _C5
                                              + v2 * (42 * _C7
                                                      + v2 * 72 * _C9)))
    return h, w0 * p1, d2


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


# ---------------------------------------------------------------- helpers

def _mm(a, b, od):
    """a @ b with operands cast to the compute dtype, f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(od), b.astype(od),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mm_t(a, b, od):
    """a @ b.T (contract b's axis 1)."""
    return jax.lax.dot_general(
        a.astype(od), b.astype(od),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _outer(a, b, od):
    """a.T @ b: (T, M),(T, N) -> (M, N) (contract rows)."""
    return jax.lax.dot_general(
        a.astype(od), b.astype(od),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _w0_of(i: int) -> float:
    return 30.0 if i == 0 else 1.0        # nerf.py:23-33,191


def _forward_chain(x, packed, layers: int, skip: int, siren: bool,
                   fast: bool, od, want_d2: bool = False):
    """Primal chain; returns (h, act', act'' per layer, zsig, zs) — the
    derivative polynomials are evaluated inside the same pass as the
    activation so range reduction happens once per layer.  zs (the
    pre-activations) let the backward kernel skip the primal matmul
    recompute when the forward saved them."""
    hs, d1s, d2s, zs = [], [], [], []
    h = None
    mid = 0
    for i in range(layers):
        if i == 0:
            z = _mm(x, packed["w0"], od) + packed["b0"]
        elif i == skip:
            z = (_mm(x, packed["w_skip_top"], od)
                 + _mm(h, packed["w_skip_bot"], od) + packed["b_skip"])
        else:
            z = _mm(h, packed["w_mid"][mid], od) + packed["b_mid"][mid]
            mid += 1
        h, d1, d2 = _act_all(z, _w0_of(i), siren, fast, want_d2)
        hs.append(h)
        d1s.append(d1)
        d2s.append(d2)
        zs.append(z)
    zsig = _mm(h, packed["w_sigma"], od) + packed["b_sigma"]
    return hs, d1s, d2s, zsig, zs


def _grad_chain(x, packed, d1s, zsig, layers: int, skip: int, siren: bool,
                fast: bool, od, lane_mask, collect: bool = False):
    """g = d sigma / d x via reverse sweep (first-order, x cotangent only).

    collect=True additionally returns the per-layer chain states u_i (the
    value of u seen AT layer i, i.e. before the d1s[i] multiply).  These
    are exactly the b_th states of the backward kernel's second-order
    sweep (its b chain is seeded with sigmoid(zsig)*mask and follows the
    identical recurrence), so saving them here lets the backward kernel
    drop one matmul per layer of pure recompute."""
    u = jax.nn.sigmoid(zsig) * lane_mask            # (T, LANE), col 0 real
    u = _mm_t(u, packed["w_sigma"], od)             # (T, F)
    us = [None] * layers
    us[layers - 1] = u
    gx = None
    mid = layers - 3                                 # last mid index
    for i in range(layers - 1, -1, -1):
        g = d1s[i] * u
        if i == 0:
            c = _mm_t(g, packed["w0"], od)
            gx = c if gx is None else gx + c
        elif i == skip:
            c = _mm_t(g, packed["w_skip_top"], od)
            gx = c if gx is None else gx + c
            u = _mm_t(g, packed["w_skip_bot"], od)
            us[i - 1] = u
        else:
            u = _mm_t(g, packed["w_mid"][mid], od)
            us[i - 1] = u
            mid -= 1
    if collect:
        return gx, us
    return gx


# ------------------------------------------------------------ fwd kernel

def _fwd_kernel(x_ref, w0_r, b0_r, wm_r, bm_r, wst_r, wsb_r, bs_r,
                wsig_r, bsig_r, sigma_ref, feats_ref, gx_ref, *zs_refs,
                layers: int, skip: int, siren: bool, fast: bool, od):
    """zs_refs is (zs_ref, us_ref) when the wrapper wants the per-layer
    pre-activations AND grad-chain states saved for the backward kernel
    (training), () on no-grad paths (eval/serving pays no extra HBM
    write)."""
    packed = {"w0": w0_r[:], "b0": b0_r[:], "w_mid": wm_r[:],
              "b_mid": bm_r[:], "w_skip_top": wst_r[:],
              "w_skip_bot": wsb_r[:], "b_skip": bs_r[:],
              "w_sigma": wsig_r[:], "b_sigma": bsig_r[:]}
    x = x_ref[:]
    hs, d1s, _, zsig, zs = _forward_chain(x, packed, layers, skip, siren,
                                          fast, od)
    lane_mask = (jax.lax.broadcasted_iota(jnp.int32, zsig.shape, 1)
                 == 0).astype(jnp.float32)
    # sigma leaves as ONE column: the LANE-wide layout wrote (and its
    # consumer re-read) 67 MB of zeros per 131k-point pass
    sigma_ref[:] = _softplus(zsig[:, 0:1])
    feats_ref[:] = hs[-1].astype(feats_ref.dtype)
    if zs_refs:
        gx, us = _grad_chain(x, packed, d1s, zsig, layers, skip, siren,
                             fast, od, lane_mask, collect=True)
        gx_ref[:] = gx
        zs_refs[0][:] = jnp.concatenate(zs, axis=-1).astype(
            zs_refs[0].dtype)
        zs_refs[1][:] = jnp.concatenate(us, axis=-1).astype(
            zs_refs[1].dtype)
    else:
        gx_ref[:] = _grad_chain(x, packed, d1s, zsig, layers, skip, siren,
                                fast, od, lane_mask)


# ------------------------------------------------------------ bwd kernel

def _bwd_kernel(x_ref, cs_ref, cf_ref, cg_ref, zs_ref, us_ref,
                w0_r, b0_r, wm_r, bm_r, wst_r, wsb_r, bs_r, wsig_r, bsig_r,
                dw0_ref, db0_ref, dwm_ref, dbm_ref, dwst_ref, dwsb_ref,
                dbs_ref, dwsig_ref, dbsig_ref, *,
                layers: int, skip: int, siren: bool, fast: bool, od):
    packed = {"w0": w0_r[:], "b0": b0_r[:], "w_mid": wm_r[:],
              "b_mid": bm_r[:], "w_skip_top": wst_r[:],
              "w_skip_bot": wsb_r[:], "b_skip": bs_r[:],
              "w_sigma": wsig_r[:], "b_sigma": bsig_r[:]}
    x = x_ref[:]
    t = cg_ref[:]                                    # tangent = c_g
    cs = cs_ref[:]                                   # (T, 1), broadcasts

    # 1) primal state from the pre-activations the fwd kernel saved —
    # skips the 8-matmul primal recompute (~17% of this kernel's FLOPs);
    # h/act'/act'' come from the cheap activation polynomials instead
    feat = wsig_r.shape[0]
    zs_all = zs_ref[:]
    # ... and the grad-chain states u_i the fwd kernel's _grad_chain
    # already produced: they are EXACTLY this kernel's b_th states (same
    # sigmoid(zsig)*mask seed, same recurrence), so loading them drops
    # one 512-wide matmul per layer of pure recompute from the sweep
    us_all = us_ref[:]
    hs, d1s, d2s, bths = [], [], [], []
    for i in range(layers):
        z = zs_all[:, i * feat:(i + 1) * feat].astype(jnp.float32)
        h, d1, d2 = _act_all(z, _w0_of(i), siren, fast, True)
        hs.append(h)
        d1s.append(d1)
        d2s.append(d2)
        bths.append(us_all[:, i * feat:(i + 1) * feat].astype(jnp.float32))
    zsig = _mm(hs[-1], packed["w_sigma"], od) + packed["b_sigma"]

    # tangent forward (depends on the cotangent c_g, so it cannot be
    # precomputed by the fwd kernel)
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

    # 2) head cotangents: S = <cs, softplus(zsig)> + <cf, h_{L-1}>
    #                       + sum softplus'(zsig)*tzsig   (col 0 only)
    lane_mask = (jax.lax.broadcasted_iota(jnp.int32, zsig.shape, 1)
                 == 0).astype(jnp.float32)
    sp1 = jax.nn.sigmoid(zsig)                       # softplus'
    sp2 = sp1 * (1.0 - sp1)                          # softplus''
    a_z = (cs * sp1 + sp2 * tzsig) * lane_mask       # cot on zsig
    b_tz = sp1 * lane_mask                           # cot on tzsig

    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros_like(ref)
        ref[:] += val

    acc(dwsig_ref, _outer(hs[-1], a_z, od) + _outer(ths[-1], b_tz, od))
    acc(dbsig_ref, jnp.sum(a_z, axis=0))
    a_h = _mm_t(a_z, packed["w_sigma"], od) + cf_ref[:].astype(jnp.float32)

    # 3) reverse sweep over (primal, tangent) pairs; the b_th states come
    # from the fwd kernel (bths), only the a chain is propagated here
    dwm_parts = [None] * max(layers - 2, 0)
    dbm_parts = [None] * max(layers - 2, 0)
    mid = layers - 3
    for i in range(layers - 1, -1, -1):
        a_zl = d1s[i] * a_h + d2s[i] * tzs[i] * bths[i]
        b_tzl = d1s[i] * bths[i]
        if i == 0:
            acc(dw0_ref, _outer(x, a_zl, od) + _outer(t, b_tzl, od))
            acc(db0_ref, jnp.sum(a_zl, axis=0))
        elif i == skip:
            acc(dwst_ref, _outer(x, a_zl, od) + _outer(t, b_tzl, od))
            acc(dwsb_ref, _outer(hs[i - 1], a_zl, od)
                + _outer(ths[i - 1], b_tzl, od))
            acc(dbs_ref, jnp.sum(a_zl, axis=0))
            a_h = _mm_t(a_zl, packed["w_skip_bot"], od)
        else:
            dwm_parts[mid] = (_outer(hs[i - 1], a_zl, od)
                              + _outer(ths[i - 1], b_tzl, od))
            dbm_parts[mid] = jnp.sum(a_zl, axis=0)
            a_h = _mm_t(a_zl, packed["w_mid"][mid], od)
            mid -= 1
    if layers > 2:
        acc(dwm_ref, jnp.stack(dwm_parts))
        acc(dbm_ref, jnp.stack(dbm_parts))


# --------------------------------------------------------------- plumbing

def _static(cfg: ModelConfig) -> Tuple:
    return (cfg.layers, cfg.skips[0], cfg.siren, bool(cfg.fast_sin),
            jnp.bfloat16 if cfg.compute_dtype in ("bfloat16", "bfloat16_all")
            else jnp.float32)


def _interpret_default():
    return jax.default_backend() == "cpu"


def _run_fwd(cfg: ModelConfig, packed: Dict, x_enc, interpret=None,
             want_zs: bool = False):
    """want_zs: additionally return the stacked per-layer pre-activations
    (n_p, layers*feat) for the backward kernel (training path only —
    costs one extra HBM stream; eval/serving skips it)."""
    if interpret is None:
        interpret = _interpret_default()
    layers, skip, siren, fast, od = _static(cfg)
    n, ein = x_enc.shape
    ein_p = packed["w0"].shape[0]
    feat = cfg.feat
    n_p = _round_up(max(n, TILE_N), TILE_N)
    if n == n_p and ein == ein_p:
        # already lane/tile-aligned (the padded-encoding path): no pad op
        x = x_enc.astype(jnp.float32)
    else:
        x = jnp.zeros((n_p, ein_p), jnp.float32).at[:n, :ein].set(
            x_enc.astype(jnp.float32))
    grid = (n_p // TILE_N,)
    kern = functools.partial(_fwd_kernel, layers=layers, skip=skip,
                             siren=siren, fast=fast, od=od)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    row = lambda c: pl.BlockSpec((TILE_N, c), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    n_mid = max(layers - 2, 0)
    # fwd tiles are independent -> 'parallel' grid; the bwd kernel must
    # stay sequential (weight-grad accumulation across iterations)
    params_tpu = (None if interpret else
                  pltpu.CompilerParams(
                      vmem_limit_bytes=100 * 1024 * 1024,
                      dimension_semantics=("parallel",)))
    out_specs = [row(1), row(feat), row(ein_p)]
    # feats leave the kernel in the activation-storage dtype: under
    # bfloat16_all the XLA trunk also hands bf16 feats to the heads,
    # and f32 here would force a 268 MB convert before every head
    # matmul at flagship shapes
    out_shape = [jax.ShapeDtypeStruct((n_p, 1), jnp.float32),
                 jax.ShapeDtypeStruct(
                     (n_p, feat),
                     jnp.bfloat16 if cfg.compute_dtype == "bfloat16_all"
                     else jnp.float32),
                 jax.ShapeDtypeStruct((n_p, ein_p), jnp.float32)]
    if want_zs:
        # zs + us stored in the ACTIVATION-STORAGE dtype (same rule as
        # feats above): bf16 only under bfloat16_all, where bf16 rounding
        # of the saved state matches the precision regime of the rest of
        # the pipeline.  Plain 'bfloat16' (mixed) keeps its documented
        # f32-activation contract — and f32 saves are bit-exact parity
        # with the recompute path.
        zs_dt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16_all"
                 else jnp.float32)
        for _ in range(2):        # zs, then us (grad-chain states)
            out_specs.append(row(layers * feat))
            out_shape.append(jax.ShapeDtypeStruct((n_p, layers * feat),
                                                  zs_dt))
    outs = pl.pallas_call(
        kern, grid=grid, compiler_params=params_tpu,
        in_specs=[row(ein_p),
                  full((ein_p, feat)), full((feat,)),
                  full((n_mid, feat, feat)), full((n_mid, feat)),
                  full((ein_p, feat)), full((feat, feat)), full((feat,)),
                  full((feat, LANE)), full((LANE,))],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(x, packed["w0"], packed["b0"], packed["w_mid"], packed["b_mid"],
      packed["w_skip_top"], packed["w_skip_bot"], packed["b_skip"],
      packed["w_sigma"], packed["b_sigma"])
    sigma, feats, gx = outs[0], outs[1], outs[2]
    # gx keeps the kernel's ein_p lane width (padded lanes are exactly 0:
    # w0/w_skip_top pad rows are zero, so the grad chain writes zeros
    # there).  Slicing to ein here would make the VJP's cotangent a pad op
    # (~0.2 ms of pure copy per call at flagship shapes); callers chain
    # the encoding jacobian at the padded width instead.
    res = (sigma[:n, 0], feats[:n], gx[:n])
    if want_zs:
        return res + (outs[3], outs[4])   # zs/us stay padded (kernel-layout)
    return res


def _run_bwd(cfg: ModelConfig, packed: Dict, x_enc, c_sigma, c_feats, c_g,
             zs, us, interpret=None):
    if interpret is None:
        interpret = _interpret_default()
    layers, skip, siren, fast, od = _static(cfg)
    n, ein = x_enc.shape
    ein_p = packed["w0"].shape[0]
    feat = cfg.feat
    n_p = _round_up(max(n, TILE_N), TILE_N)

    def padrow(v, cols):
        if v.shape == (n_p, cols):        # already aligned: no pad op
            return v.astype(jnp.float32)
        out = jnp.zeros((n_p, cols), jnp.float32)
        return out.at[:n, :v.shape[1]].set(v.astype(jnp.float32))

    x = padrow(x_enc, ein_p)
    # c_sigma stays a single column: a (n, 1) HBM stream (0.5 MB) where a
    # LANE-padded layout cost a 67 MB scatter/pad + kernel read at
    # flagship shapes; the kernel broadcasts it against the lane-masked
    # zsig block in VMEM
    cs = padrow(c_sigma[:, None], 1)
    # c_feats stays in its arriving dtype (bf16 when feats left the fwd
    # kernel as bf16): converting the 131k x 512 cotangent to f32 in XLA
    # costs ~0.6 ms at flagship shapes, and the kernel upcasts on use
    cf = jnp.zeros((n_p, feat), c_feats.dtype).at[:n].set(c_feats)
    cg = padrow(c_g, ein_p)
    assert zs.shape == (n_p, layers * feat), (zs.shape, n_p, layers, feat)
    assert us.shape == zs.shape, (us.shape, zs.shape)

    grid = (n_p // TILE_N,)
    kern = functools.partial(_bwd_kernel, layers=layers, skip=skip,
                             siren=siren, fast=fast, od=od)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    row = lambda c: pl.BlockSpec((TILE_N, c), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    n_mid = max(layers - 2, 0)
    # the per-tile state (z/h/tz/th for every layer + weight-grad
    # accumulators) exceeds the 16 MB default scoped-vmem budget at the
    # flagship 8x512 shapes — raise it (v5e has 128 MB VMEM)
    params_tpu = (None if interpret else
                  pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
    outs = pl.pallas_call(
        kern, grid=grid, compiler_params=params_tpu,
        in_specs=[row(ein_p), row(1), row(feat), row(ein_p),
                  row(layers * feat), row(layers * feat),
                  full((ein_p, feat)), full((feat,)),
                  full((n_mid, feat, feat)), full((n_mid, feat)),
                  full((ein_p, feat)), full((feat, feat)), full((feat,)),
                  full((feat, LANE)), full((LANE,))],
        # weight-grad outputs accumulate across the sequential TPU grid:
        # constant index_map keeps each block VMEM-resident for the whole
        # kernel, initialized at grid step 0
        out_specs=(full((ein_p, feat)), full((feat,)),
                   full((n_mid, feat, feat)), full((n_mid, feat)),
                   full((ein_p, feat)), full((feat, feat)), full((feat,)),
                   full((feat, LANE)), full((LANE,))),
        out_shape=(jax.ShapeDtypeStruct((ein_p, feat), jnp.float32),
                   jax.ShapeDtypeStruct((feat,), jnp.float32),
                   jax.ShapeDtypeStruct((n_mid, feat, feat), jnp.float32),
                   jax.ShapeDtypeStruct((n_mid, feat), jnp.float32),
                   jax.ShapeDtypeStruct((ein_p, feat), jnp.float32),
                   jax.ShapeDtypeStruct((feat, feat), jnp.float32),
                   jax.ShapeDtypeStruct((feat,), jnp.float32),
                   jax.ShapeDtypeStruct((feat, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((LANE,), jnp.float32)),
        interpret=interpret,
    )(x, cs, cf, cg, zs, us,
      packed["w0"], packed["b0"], packed["w_mid"], packed["b_mid"],
      packed["w_skip_top"], packed["w_skip_bot"], packed["b_skip"],
      packed["w_sigma"], packed["b_sigma"])
    return outs


def _unpack_grads(cfg: ModelConfig, ein: int, outs) -> Dict:
    """Packed weight grads -> the {fc_net, sigma_from_xyz} pytree."""
    (dw0, db0, dwm, dbm, dwst, dwsb, dbs, dwsig, dbsig) = outs
    layers, skip = cfg.layers, cfg.skips[0]
    fc = []
    mid = 0
    for i in range(layers):
        if i == 0:
            fc.append({"w": dw0[:ein], "b": db0})
        elif i == skip:
            fc.append({"w": jnp.concatenate([dwst[:ein], dwsb], axis=0),
                       "b": dbs})
        else:
            fc.append({"w": dwm[mid], "b": dbm[mid]})
            mid += 1
    sig = [{"w": dwsig[:, :1], "b": dbsig[:1]}]
    return {"fc_net": fc, "sigma_from_xyz": sig}


# ------------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def trunk_core(cfg: ModelConfig, params_sub: Dict, x_enc):
    """(sigma, feats, d sigma/d x_enc) of the trunk at encoded points.

    params_sub: {'fc_net': [...], 'sigma_from_xyz': [...]}.
    x_enc carries NO gradient (ray points are constants in training); the
    VJP returns zeros for it.
    """
    packed = pack_trunk_weights(params_sub, cfg, _static(cfg)[4])
    return _run_fwd(cfg, packed, x_enc)


def _trunk_core_fwd(cfg, params_sub, x_enc):
    # the differentiated path asks the fwd kernel to save the per-layer
    # pre-activations AND grad-chain states so the bwd kernel skips both
    # the primal recompute and the b-chain recompute; the primal
    # trunk_core (no-grad eval/serving) never pays those writes
    packed = pack_trunk_weights(params_sub, cfg, _static(cfg)[4])
    sigma, feats, gx, zs, us = _run_fwd(cfg, packed, x_enc, want_zs=True)
    return (sigma, feats, gx), (params_sub, x_enc, zs, us)


def _trunk_core_bwd(cfg, res, cots):
    params_sub, x_enc, zs, us = res
    c_sigma, c_feats, c_g = cots
    packed = pack_trunk_weights(params_sub, cfg, _static(cfg)[4])
    outs = _run_bwd(cfg, packed, x_enc, c_sigma, c_feats, c_g, zs, us)
    # the real encoding width comes from the PARAMS (x_enc may arrive
    # lane-padded on the padded-encoding path; its pad lanes are zero so
    # dw0/dwst pad rows are zero and slice away exactly)
    d_params = _unpack_grads(cfg, params_sub["fc_net"][0]["w"].shape[0],
                             outs)
    return d_params, jnp.zeros_like(x_enc)


trunk_core.defvjp(_trunk_core_fwd, _trunk_core_bwd)


def fused_trunk_with_grad(params: Dict, cfg: ModelConfig, xyz):
    """Drop-in for the trunk portion of apply_network_with_normals:
    returns (sigma, feats, d sigma/d xyz) with the positional-encoding
    jacobian chained in XLA (enc = sin(x P + phase) =>
    d enc/d x = cos(x P + phase) * P)."""
    from .encoding import _proj_and_phase
    sub = {"fc_net": params["fc_net"],
           "sigma_from_xyz": params["sigma_from_xyz"]}
    if cfg.mapping:
        # constants at the kernel's lane-padded width: padded lanes of the
        # encoding are exactly sin(0) = 0 (zero P columns + zero phase), so
        # neither a pad before the kernel nor a slice of its gx output
        # materializes — the gx jacobian chain runs at width ein_p with the
        # pad lanes killed by pm's zero rows (profiled: the pad/slice pair
        # cost ~0.5 ms/step at flagship shapes)
        ein_p = _round_up(2 * cfg.mapping_sizes[0] * xyz.shape[-1], LANE)
        p, phase = _proj_and_phase(cfg.mapping_sizes[0], xyz.shape[-1],
                                   pad_to=ein_p)
        pm = jnp.asarray(p)
        # precision='highest': see ops/encoding.py — the default TPU
        # matmul precision would round xyz to bf16 and staircase the
        # high-frequency bands (and the cos(m) gradient jacobian with them)
        m = jax.lax.dot_general(
            xyz, pm, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST) + jnp.asarray(phase)
        # sin/cos via the trunk's polynomial when fast_sin (the encoding
        # is sine-bound — the K=3 matmul is tiny); _act_all at w0=1 gives
        # (sin m, cos m).  NOTE: moving this INTO the kernels was tried
        # and measured 2.5 ms/step SLOWER despite removing these XLA ops
        # (the extra per-tile encode matmul + transcendentals break the
        # kernels' pipelining) — see BASELINE.md round-2 negative results.
        enc, cos_m, _ = _act_all(m, 1.0, siren=True, fast=cfg.fast_sin,
                                 want_d2=False)
        sigma, feats, gx_enc = trunk_core(
            cfg, sub, jax.lax.stop_gradient(enc))
        gx = (gx_enc * cos_m) @ pm.T
    else:
        sigma, feats, gx_enc = trunk_core(
            cfg, sub, jax.lax.stop_gradient(xyz))
        gx = gx_enc[:, :xyz.shape[-1]]   # kernel returns lane-padded width
    return sigma, feats, gx
