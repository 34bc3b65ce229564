"""Functional NeRF-family network: shared trunk + config-gated heads.

One generic parameterized network covers all four reference model classes —
NeRF (models/nerf.py:149-283), ShadowNeRF (models/snerf.py:78-198), SatNeRF
(models/satnerf.py:102-262) and SpSBRDFNeRF (models/spsbrdfnerf.py:418-757)
— because they share the identical trunk (8x512 skip-[4] MLP), sigma /
feats / rgb heads, and differ only in which extra heads exist.  Head
presence is static (ModelConfig), so XLA compiles a fixed-shape program per
blessed config.

Params are a flat dict of named heads whose keys mirror the reference's
state_dict module names (fc_net, sigma_from_xyz, feats_from_xyz,
rgb_from_xyzdir, sun_v_net, sky_color, beta_from_xyz, grad_from_xyz,
roughness_from_xyz, k_from_xyz, theta_rpv_from_xyz, rhoc_from_xyz,
b_from_xyz, c_from_xyz, theta_from_xyz) so the two-stage checkpoint handoff
(main.py:97-104: restore trunk+sigma+feats, +rgb unless Hapke) is a literal
dict subset here.

Unlike the reference, the network returns a dict of named head outputs
instead of packing a flag-dependent channel layout (spsbrdfnerf.py:138-190);
the render step consumes names, eliminating that entire class of
index-bookkeeping bugs.

Initialization matches torch semantics: Linear default U(+/-1/sqrt(fan_in))
for weights and biases; siren trunks override weights with
sine_init / first_layer_sine_init (nerf.py:9-21).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.encoding import positional_encoding
from ..ops.compositing import l2_normalize


# ---------------------------------------------------------------- init utils

def _torch_linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(k2, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _sine_reinit_w(key, p, first: bool):
    """sine_init / first_layer_sine_init (weights only, nerf.py:9-21)."""
    fan_in = p["w"].shape[0]
    bound = (1.0 / fan_in) if first else math.sqrt(6.0 / fan_in)
    w = jax.random.uniform(key, p["w"].shape, p["w"].dtype, -bound, bound)
    return {"w": w, "b": p["b"]}


def _init_mlp(key, sizes, siren_weights: bool = False):
    """List of linear layers sized by consecutive pairs in `sizes`."""
    keys = jax.random.split(key, 2 * (len(sizes) - 1))
    layers = []
    for i in range(len(sizes) - 1):
        p = _torch_linear_init(keys[2 * i], sizes[i], sizes[i + 1])
        if siren_weights:
            p = _sine_reinit_w(keys[2 * i + 1], p, first=(i == 0))
        layers.append(p)
    return layers


def _linear(p, x, compute_dtype: str = "float32"):
    """Dense layer.  'bfloat16': operands feed the MXU as bf16 with f32
    accumulation and f32 output (mixed-precision, f32 activation storage).
    'bfloat16_all': output is rounded to bf16 too — halves the inter-layer
    activation traffic through HBM, the train step's actual bottleneck
    (bytes-bound, not FLOP-bound: see bench ablations).
    'int8' (serving-only) applies to the TRUNK via _linear_int8; heads
    run at bfloat16_all (they are thin, unbounded-input matmuls where
    static quantization neither applies nor pays)."""
    if compute_dtype == "int8":
        compute_dtype = "bfloat16_all"
    if compute_dtype in ("bfloat16", "bfloat16_all"):
        out_dt = (jnp.bfloat16 if compute_dtype == "bfloat16_all"
                  else jnp.float32)
        y = jax.lax.dot_general(
            x.astype(jnp.bfloat16), p["w"].astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=out_dt)
        return y + p["b"].astype(out_dt)
    return x @ p["w"] + p["b"]


def _linear_int8(p, x):
    """Serving-only int8 MXU dense layer for STATICALLY BOUNDED inputs.

    Every trunk input is exactly bounded in [-1, 1] — the positional
    encoding is a sine table and every siren hidden activation is
    sin(.) — so the activation quantizer needs no calibration: scale is
    the constant 1/127.  Weights quantize per-output-channel
    (sw = max|W[:, j]|/127), the dot accumulates in int32 on the MXU
    (2x the bf16 peak on v5e), and the result dequantizes to f32 before
    the bias.  round() makes this non-differentiable: training guards
    reject compute_dtype='int8', and gradient consumers (analytic
    normals) run through the bfloat16 twin instead."""
    xq = jnp.round(jnp.clip(x.astype(jnp.float32), -1.0, 1.0)
                   * 127.0).astype(jnp.int8)
    w = p["w"].astype(jnp.float32)
    sw = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    wq = jnp.round(w / jnp.maximum(sw, 1e-20)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # x ~ xq/127 and W ~ wq*sw, so y = (xq @ wq) * sw / 127.  Output is
    # bf16: the trunk is bytes-bound (see _linear's bfloat16_all note)
    # and the consumer either sin-activates and requantizes to int8 or
    # is a bf16 head — f32 inter-layer storage would pay back the MXU
    # gain in doubled HBM activation traffic
    y = acc.astype(jnp.float32) * (sw / 127.0) + p["b"]
    return y.astype(jnp.bfloat16)


# -------------------------------------------------------------- activations

def _act(cfg: ModelConfig, x, first: bool = False):
    if cfg.siren:
        w0 = 30.0 if first else 1.0          # nerf.py:23-33,191
        if cfg.fast_sin:
            from ..ops.fast_math import fast_sin
            return fast_sin(w0 * x)
        return jnp.sin(w0 * x)
    return jax.nn.relu(x)


# ------------------------------------------------------------------- factory

def model_config_for_variant(variant: str, **overrides) -> ModelConfig:
    """Mirror models/__init__.py:load_model defaults per variant."""
    base: Dict = dict(variant=variant)
    if variant == "nerf":
        base.update(mapping=True, siren=False)           # NeRF class defaults
    elif variant == "s-nerf":
        base.update(siren=True, sun_v="learned", indirect_light=True)
    elif variant in ("sat-nerf", "sps-nerf"):
        base.update(siren=True, sun_v="learned", indirect_light=True,
                    beta=True)
    elif variant == "spsbrdf-nerf":
        base.update(siren=True)
    else:
        raise ValueError(f"model {variant} is not valid")
    base.update(overrides)
    return ModelConfig(**base)


def init_network(key, cfg: ModelConfig) -> Dict:
    feat = cfg.feat
    xyz_in = cfg.xyz_in_dim
    dir_in = cfg.dir_in_dim
    keys = iter(jax.random.split(key, 16))

    # trunk: Linear(xyz_in, feat) then layers-1 more, skip layers widen input
    params: Dict = {}
    trunk = []
    tk = jax.random.split(next(keys), 2 * cfg.layers)
    for i in range(cfg.layers):
        in_sz = xyz_in if i == 0 else (feat + xyz_in if i in cfg.skips else feat)
        p = _torch_linear_init(tk[2 * i], in_sz, feat)
        if cfg.siren:
            p = _sine_reinit_w(tk[2 * i + 1], p, first=(i == 0))
        trunk.append(p)
    params["fc_net"] = trunk

    params["sigma_from_xyz"] = _init_mlp(next(keys), [feat, 1])
    params["feats_from_xyz"] = _init_mlp(next(keys), [feat, feat])
    params["rgb_from_xyzdir"] = _init_mlp(next(keys), [feat + dir_in, feat // 2, 3])

    uses_sun_v_net = (cfg.sun_v == "learned"
                      or cfg.variant in ("s-nerf", "sat-nerf", "sps-nerf"))
    if uses_sun_v_net:
        params["sun_v_net"] = _init_mlp(
            next(keys), [feat + 3, feat // 2, feat // 2, feat // 2, 1],
            siren_weights=cfg.siren)
    if cfg.indirect_light or cfg.variant in ("s-nerf", "sat-nerf", "sps-nerf"):
        params["sky_color"] = _init_mlp(next(keys), [3, feat // 2, 3])
    if cfg.beta:
        t_dim = cfg.t_embedding_tau
        params["beta_from_xyz"] = _init_mlp(next(keys), [feat + t_dim, feat // 2, 1])
    if cfg.normal in ("analystic_learned", "learned"):
        params["grad_from_xyz"] = _init_mlp(next(keys), [feat, 3])
    if cfg.roughness:
        params["roughness_from_xyz"] = _init_mlp(next(keys), [feat, feat // 2, 1])
    if cfg.func_m:
        params["k_from_xyz"] = _init_mlp(next(keys), [feat, feat // 2, cfg.dim_rpv])
    if cfg.func_f:
        params["theta_rpv_from_xyz"] = _init_mlp(next(keys), [feat, feat // 2, cfg.dim_rpv])
    if cfg.func_h == 1:
        # funcH == 2 means rhoc := albedo — the reference creates NO rhoc
        # head for it (spsbrdfnerf.py:596 gates on funcH == True)
        params["rhoc_from_xyz"] = _init_mlp(next(keys), [feat, feat // 2, cfg.dim_rpv])
    if cfg.hapke_b:
        params["b_from_xyz"] = _init_mlp(next(keys), [feat, feat // 2, 1])
    if cfg.hapke_c:
        params["c_from_xyz"] = _init_mlp(next(keys), [feat, feat // 2, 1])
    if cfg.hapke_theta:
        params["theta_from_xyz"] = _init_mlp(next(keys), [feat, feat // 2, 1])
    return params


def init_t_embedding(key, vocab: int, dim: int):
    """Transient per-image embedding, torch.nn.Embedding default N(0,1)
    (main.py:115)."""
    return jax.random.normal(key, (vocab, dim))


# ------------------------------------------------------------------ forward

def _trunk_features(params, cfg: ModelConfig, xyz):
    """Encoded xyz -> shared features (calc_features, spsbrdfnerf.py:636-646).

    The skip layer's concat([enc, h]) @ W is evaluated as the algebraically
    identical enc @ W[:E] + h @ W[E:]: no (N, feat+E) buffer materializes
    and both matmuls keep MXU-aligned contraction dims."""
    enc = (positional_encoding(xyz, cfg.mapping_sizes[0], fast=cfg.fast_sin)
           if cfg.mapping else xyz)
    e_dim = enc.shape[-1]
    # int8 (serving): every trunk matmul input — the sine encoding and
    # every siren hidden activation — is statically bounded in [-1, 1],
    # so the whole trunk runs through the int8 MXU path.  Raw-xyz trunks
    # (mapping off, or mapping with 0 frequencies where the encoding
    # passes xyz through verbatim) are unbounded: they stay on the bf16
    # path rather than silently clipping out-of-range coordinates.
    int8 = (cfg.compute_dtype == "int8" and cfg.siren
            and cfg.mapping and cfg.mapping_sizes[0] > 0)
    lin = _linear_int8 if int8 else (
        lambda p, x: _linear(p, x, cfg.compute_dtype))
    h = enc
    for i, layer in enumerate(params["fc_net"]):
        if i in cfg.skips:
            top = {"w": layer["w"][:e_dim], "b": layer["b"]}
            bot = {"w": layer["w"][e_dim:],
                   "b": jnp.zeros_like(layer["b"])}
            z = lin(top, enc) + lin(bot, h)
            h = _act(cfg, z, first=False)
        else:
            h = _act(cfg, lin(layer, h), first=(i == 0))
    return h


def _head(params, cfg: ModelConfig, name, x, final=None, act_relu=False):
    """Apply an MLP head: hidden layers use the model activation
    (or ReLU for sky_color, snerf.py:135-140), final optional nonlinearity."""
    layers = params[name]
    h = x
    for i, layer in enumerate(layers):
        h = _linear(layer, h, cfg.compute_dtype)
        if i < len(layers) - 1:
            h = jax.nn.relu(h) if act_relu else _act(cfg, h, first=False)
    if final == "sigmoid":
        h = jax.nn.sigmoid(h)
    elif final == "softplus":
        h = jax.nn.softplus(h)
    # head outputs re-enter f32 compositing/BRDF math regardless of the
    # trunk's activation storage dtype
    return h.astype(jnp.float32)


def _sun_v_head(params, cfg: ModelConfig, feats, sun_d):
    """sun_v_net on concat([feats, sun_d]); hidden activations are the
    model activation at w0=1 when siren (snerf.py:126-131) — exactly
    _head's layer loop with a sigmoid final."""
    x = jnp.concatenate([feats, sun_d], axis=-1)
    return _head(params, cfg, "sun_v_net", x, final="sigmoid")


def sigma_fn(params, cfg: ModelConfig, xyz):
    """Density only (sigma_only=True fast path, spsbrdfnerf.py:682-685)."""
    feats = _trunk_features(params, cfg, xyz)
    return _head(params, cfg, "sigma_from_xyz", feats, final="softplus")[..., 0]


def sigma_and_sun_v(params, cfg: ModelConfig, xyz, sun_d):
    """Density + learned sun visibility in one trunk forward — the minimal
    program for the solar-correction pass along sun rays (the reference's
    intended-but-undefined inference_sun, rendering.py:281)."""
    feats = _trunk_features(params, cfg, xyz)
    sigma = _head(params, cfg, "sigma_from_xyz", feats,
                  final="softplus")[..., 0]
    xyz_features = _linear(params["feats_from_xyz"][0], feats,
                           cfg.compute_dtype)
    sun_v = _sun_v_head(params, cfg, xyz_features, sun_d)
    return sigma, sun_v


def _grad_safe_cfg(cfg: ModelConfig) -> ModelConfig:
    """Config for paths that DIFFERENTIATE the trunk: the int8
    quantizer's round() has zero gradient, so gradient consumers run on
    the bfloat16_all twin instead (no-op for every other dtype)."""
    if cfg.compute_dtype == "int8":
        import dataclasses as _dc
        return _dc.replace(cfg, compute_dtype="bfloat16_all")
    return cfg


def analytic_normals(params, cfg: ModelConfig, xyz):
    """-normalize(grad_xyz sigma): exact analog of calc_normals
    (spsbrdfnerf.py:648-660) expressed as jax.grad of the summed density —
    valid because sigma at a point depends only on that point's xyz, and
    differentiable end-to-end (grad-of-grad handled by JAX)."""
    cfg = _grad_safe_cfg(cfg)
    grad = jax.grad(lambda x: jnp.sum(sigma_fn(params, cfg, x)))(xyz)
    return -l2_normalize(grad.astype(jnp.float32))


def apply_network(params, cfg: ModelConfig, xyz,
                  dirs: Optional[jnp.ndarray] = None,
                  sun_d: Optional[jnp.ndarray] = None,
                  t_emb: Optional[jnp.ndarray] = None,
                  apply_brdf: bool = False,
                  apply_theta: bool = False,
                  nr_lr: bool = False) -> Dict[str, jnp.ndarray]:
    """Full forward over flat points xyz (..., 3). Returns named heads.

    Head semantics match SpSBRDFNeRF.forward (spsbrdfnerf.py:662-757):
    rgb/albedo sigmoid; sun_v sigmoid; sky sigmoid; beta softplus;
    RPV k in [0,2], theta_rpv in [-1,1], rhoc in [0,1] (tiled 1->3 when
    dim_rpv==1); hapke b,c in [0,1]; hapke theta in [0, 30deg].
    """
    out: Dict[str, jnp.ndarray] = {}
    feats = _trunk_features(params, cfg, xyz)
    out["sigma"] = _head(params, cfg, "sigma_from_xyz", feats, final="softplus")[..., 0]
    return _heads_from_feats(out, params, cfg, feats, dirs, sun_d, t_emb,
                             apply_brdf, apply_theta, nr_lr)


def apply_network_with_normals(params, cfg: ModelConfig, xyz,
                               dirs=None, sun_d=None, t_emb=None,
                               apply_brdf: bool = False,
                               apply_theta: bool = False,
                               nr_lr: bool = False,
                               fused_trunk: bool = False) -> Dict[str, jnp.ndarray]:
    """apply_network + analytic density-gradient normals sharing ONE trunk
    forward: value_and_grad(has_aux) gives sigma, feats, and grad_xyz sigma
    in a single fwd+bwd instead of apply_network's forward plus a second
    forward inside analytic_normals.  Differentiable end-to-end (the outer
    loss grad sees one fwd+bwd pair to differentiate, not two forwards).

    fused_trunk: run the differentiated trunk as the fused Pallas kernel
    pair with a hand-derived custom VJP (ops/pallas_trunk_vjp.py) —
    numerically equivalent, all activations VMEM-resident."""
    # this path differentiates the trunk per sample, so under int8 it
    # runs wholly on the bf16 twin — including the fused custom-VJP
    # kernels below, which is why grad_cfg is computed BEFORE the
    # kernel_supports gate.  int8 still accelerates the sigma-only and
    # sun-march passes; for the full pass pair it with
    # RenderConfig.normal_at_surface, which keeps the per-sample forward
    # int8 and takes ONE bf16 gradient per ray at the surface instead.
    grad_cfg = _grad_safe_cfg(cfg)

    # the fused kernels assume the reference architecture (exactly one
    # IN-RANGE skip layer, nerf.py:165); fall back to XLA autodiff
    # otherwise (e.g. fc_layers=4 with the default skip index 4, which
    # the reference treats as a skipless trunk)
    if fused_trunk:
        from ..ops.pallas_mlp import kernel_supports
        if not kernel_supports(grad_cfg):
            fused_trunk = False
    if fused_trunk:
        # MEASURED NEGATIVE (round 5, kept behind BRDFNERF_FUSED_HEADS=1
        # with full parity tests): folding the flagship head block INTO
        # the trunk custom-VJP kernel pair (ops/pallas_trunk_heads.py —
        # head activations/cotangents VMEM-resident, feats round-trip
        # deleted, packed (N, 8) logit I/O) ran 37.6 ms/step vs 33.2 for
        # XLA-side heads: the head recompute + extra accumulators in the
        # SEQUENTIAL backward kernel cost more pipeline overlap than the
        # ~1.5 ms of saved HBM streams bought.  Round 2's separate-pair
        # attempt lost for a different reason (thin-dot launch overhead);
        # together they pin the conclusion that XLA owns this head block
        # on v5e.
        import os as _os
        if _os.environ.get("BRDFNERF_FUSED_HEADS"):
            from ..ops.pallas_trunk_heads import (heads_kernel_supports,
                                                  fused_trunk_heads_with_grad)
            if heads_kernel_supports(grad_cfg, params, dirs=dirs,
                                     t_emb=t_emb, apply_brdf=apply_brdf,
                                     apply_theta=apply_theta, nr_lr=nr_lr):
                return fused_trunk_heads_with_grad(params, grad_cfg, xyz)
        from ..ops.pallas_trunk_vjp import fused_trunk_with_grad
        sigma, feats, grad_x = fused_trunk_with_grad(params, grad_cfg, xyz)
        out: Dict[str, jnp.ndarray] = {"sigma": sigma}
        out["normal_an"] = -l2_normalize(grad_x.astype(jnp.float32))
        # the head block deliberately stays on XLA over the kernel's
        # feats output (both fused-head forms measured slower: round-2
        # negative result 1 and the round-5 note above)
        return _heads_from_feats(out, params, cfg, feats, dirs, sun_d,
                                 t_emb, apply_brdf, apply_theta, nr_lr)

    def trunk_sigma(x):
        f = _trunk_features(params, grad_cfg, x)
        s = _head(params, grad_cfg, "sigma_from_xyz", f,
                  final="softplus")[..., 0]
        return jnp.sum(s), (f, s)

    (_, (feats, sigma)), grad_x = jax.value_and_grad(
        trunk_sigma, has_aux=True)(xyz)
    out: Dict[str, jnp.ndarray] = {"sigma": sigma}
    out["normal_an"] = -l2_normalize(grad_x.astype(jnp.float32))
    return _heads_from_feats(out, params, cfg, feats, dirs, sun_d, t_emb,
                             apply_brdf, apply_theta, nr_lr)


def _merged_sigmoid_heads(params, cfg: ModelConfig, x, names):
    """Evaluate several 2-layer sigmoid-final heads that share the same
    input as ONE concatenated first layer + ONE block-diagonal second
    layer — the math of each slice is identical to _head's, but a single
    pair of matmuls replaces 2*len(names) small ops (each of which costs
    ~2x its roofline in launch/fusion overhead on TPU).  Gradients flow
    through the concat/at.set assembly back to the per-head parameters.
    Returns one (N, out_dim_i) array per name.

    Kept as ONE function on purpose: a round-5 refactor that sliced the
    merged hidden per head and re-concatenated for the second layer left
    an uncanceled split/concat pair in the compiled step (~0.3 ms at
    flagship shapes) — the hidden must flow whole from layer 1 to 2."""
    l1 = [params[n][0] for n in names]
    l2 = [params[n][1] for n in names]
    hids = [p["w"].shape[1] for p in l1]
    dims = [p["w"].shape[1] for p in l2]
    w1 = jnp.concatenate([p["w"] for p in l1], axis=1)     # (F, sum(hids))
    b1 = jnp.concatenate([p["b"] for p in l1])
    h = _act(cfg, _linear({"w": w1, "b": b1}, x, cfg.compute_dtype),
             first=False)
    w2 = jnp.zeros((sum(hids), sum(dims)), l2[0]["w"].dtype)
    ho = do = 0
    for p, hid, dim in zip(l2, hids, dims):
        w2 = w2.at[ho:ho + hid, do:do + dim].set(p["w"])
        ho += hid
        do += dim
    b2 = jnp.concatenate([p["b"] for p in l2])
    y = jax.nn.sigmoid(_linear({"w": w2, "b": b2}, h, cfg.compute_dtype))
    y = y.astype(jnp.float32)
    outs = []
    do = 0
    for dim in dims:
        outs.append(y[..., do:do + dim])
        do += dim
    return outs


def _heads_from_feats(out: Dict, params, cfg: ModelConfig, feats,
                      dirs=None, sun_d=None, t_emb=None,
                      apply_brdf: bool = False, apply_theta: bool = False,
                      nr_lr: bool = False) -> Dict[str, jnp.ndarray]:
    xyz_features = _linear(params["feats_from_xyz"][0], feats, cfg.compute_dtype)
    rgb_uses_dirs = cfg.input_sizes[1] > 0 and dirs is not None
    if rgb_uses_dirs:
        enc_dir = (positional_encoding(dirs, cfg.mapping_sizes[1],
                                       fast=cfg.fast_sin)
                   if cfg.mapping else dirs)
        rgb_in = jnp.concatenate([xyz_features, enc_dir], axis=-1)
    else:
        rgb_in = xyz_features

    # merged-head fast path for RPV(111): the three RPV heads are
    # identical 2-layer sigmoid-final MLPs over xyz_features, so they
    # evaluate as ONE matmul pair (_merged_sigmoid_heads); per-slice math
    # unchanged.  The rgb head stays SEPARATE: folding it into the
    # block-diagonal second layer was measured neutral in round 2
    # (negative result 6), and merging only its FIRST layer into the
    # concat (separate second layers over slices of the merged hidden)
    # was re-tried in round 5 and measured +1.0 ms/step at flagship
    # shapes (33.5 -> 34.5 ms) — the hidden-slice consumers cost more
    # than the deduped dy/bias-grad streams save.
    rpv_names = ("k_from_xyz", "theta_rpv_from_xyz", "rhoc_from_xyz")
    merged_rpv = (apply_brdf and cfg.rpv and cfg.func_m and cfg.func_f
                  and cfg.func_h == 1
                  and all(len(params.get(n, ())) == 2 for n in rpv_names))
    out["rgb"] = _head(params, cfg, "rgb_from_xyzdir", rgb_in,
                       final="sigmoid")

    if "sun_v_net" in params and sun_d is not None:
        out["sun_v"] = _sun_v_head(params, cfg, xyz_features, sun_d)
    if "sky_color" in params and sun_d is not None:
        out["sky"] = _head(params, cfg, "sky_color", sun_d, final="sigmoid",
                           act_relu=True)
    if cfg.beta and t_emb is not None:
        beta_in = jnp.concatenate([xyz_features, t_emb], axis=-1)
        out["beta"] = _head(params, cfg, "beta_from_xyz", beta_in, final="softplus")
    if nr_lr and "grad_from_xyz" in params:
        grad_lr = _linear(params["grad_from_xyz"][0], feats, cfg.compute_dtype)
        out["normal_lr"] = -l2_normalize(grad_lr.astype(jnp.float32))

    if apply_brdf:
        def tile3(v):
            return jnp.tile(v, (1,) * (v.ndim - 1) + (3,)) if v.shape[-1] == 1 else v
        if cfg.roughness:
            out["roughness"] = _head(params, cfg, "roughness_from_xyz",
                                     xyz_features, final="sigmoid")
        elif cfg.rpv:
            k = th = rc = None
            if merged_rpv:
                k, th, rc = _merged_sigmoid_heads(params, cfg,
                                                  xyz_features, rpv_names)
            else:
                if cfg.func_m:
                    k = _head(params, cfg, "k_from_xyz", xyz_features,
                              final="sigmoid")
                if cfg.func_f:
                    th = _head(params, cfg, "theta_rpv_from_xyz",
                               xyz_features, final="sigmoid")
                if cfg.func_h == 1:
                    rc = _head(params, cfg, "rhoc_from_xyz", xyz_features,
                               final="sigmoid")
            if k is not None:
                out["rpv_k"] = tile3((k - 0.5) * 2.0 + 1.0)        # [0, 2]
            if th is not None:
                out["rpv_theta"] = tile3((th - 0.5) * 2.0)          # [-1, 1]
            if rc is not None:
                out["rpv_rhoc"] = tile3(rc)                          # [0, 1]
        else:
            hp_names = []
            if cfg.hapke_b:
                hp_names.append("b_from_xyz")
            if cfg.hapke_c:
                hp_names.append("c_from_xyz")
            if apply_theta and cfg.hapke_theta:
                hp_names.append("theta_from_xyz")
            if len(hp_names) >= 2 and all(
                    len(params.get(n, ())) == 2 for n in hp_names):
                # same merged evaluation as the RPV heads
                vals = dict(zip(hp_names, _merged_sigmoid_heads(
                    params, cfg, xyz_features, tuple(hp_names))))
            else:
                vals = {n: _head(params, cfg, n, xyz_features,
                                 final="sigmoid") for n in hp_names}
            if "b_from_xyz" in vals:
                out["hpk_b"] = tile3(vals["b_from_xyz"])
            if "c_from_xyz" in vals:
                out["hpk_c"] = tile3(vals["c_from_xyz"])
            if "theta_from_xyz" in vals:
                out["hpk_theta"] = (vals["theta_from_xyz"]
                                    * (math.pi * 30.0 / 180.0))  # [0, 30deg]
    return out
