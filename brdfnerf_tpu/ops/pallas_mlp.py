"""Pallas fused MLP: the whole NeRF trunk + sigma head as ONE TPU kernel.

The hot op of every render pass is the 8x512 skip-MLP evaluated over
N_rays x N_samples points (SURVEY.md 3.1 hot loop).  Under plain XLA each
layer's activations round-trip through HBM between matmuls; this kernel
keeps ALL layer weights resident in VMEM for the kernel's lifetime and
streams point blocks through the full layer stack, so HBM traffic is one
read of the inputs + one write of the outputs + one read of the weights
per grid pass.

Design notes (pallas_guide.md):
  * feature dims padded to 128 lanes; point blocks of TILE_N=512 rows
  * the skip connection (trunk layer `skips[0]` re-reads the encoded
    input, nerf.py:179-181) is algebraically split:
        concat([enc, h]) @ W == enc @ W_top + h @ W_bot
    so the kernel never concatenates — it runs two MXU calls on the
    pre-split halves of that layer's weight matrix
  * weights can be fed as bfloat16 (compute_dtype) with float32
    accumulation via preferred_element_type
  * forward-only: used on the no-grad render paths (sigma-only pass, the
    analytic sun-visibility march, eval rendering).  Training backward
    stays on XLA autodiff.

Numerical parity with models.network._trunk_features + sigma head is
tested to ~1e-5 (f32) in tests/test_pallas.py, on CPU via interpret mode.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig

TILE_N = 512
LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def kernel_supports(cfg: ModelConfig) -> bool:
    """The fused trunk kernels assume the reference architecture: exactly
    one skip layer whose index lies INSIDE the trunk, plus at least one
    non-skip mid layer (pack_trunk_weights stacks the mids — empty at
    layers=2).  The reference silently drops an out-of-range skip
    (nerf.py builds no skip when skips=[4] with fc_layers=4), which the
    XLA trunk reproduces — callers must fall back to XLA when this
    returns False."""
    return (len(cfg.skips) == 1 and 0 < cfg.skips[0] < cfg.layers
            and cfg.layers >= 3
            # the fused kernels compute in bf16/f32; the int8 serving
            # path runs through XLA's native int8 dot instead
            and cfg.compute_dtype != "int8")


def pack_trunk_weights(params: Dict, cfg: ModelConfig,
                       dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Flatten trunk + sigma head into padded dense matrices.

    Returns dict with:
      w0 (Ein_p, F), b0 (F,)
      w_mid (L-2, F, F), b_mid (L-2, F)   -- non-skip layers 1..L-1
      w_skip_top (Ein_p, F), w_skip_bot (F, F), b_skip (F,)
      w_sigma (F, LANE), b_sigma (LANE,)  -- sigma head padded to lane width
    Assumes exactly one skip layer (cfg.skips == (k,)), the reference
    architecture (nerf.py:165).
    """
    assert len(cfg.skips) == 1, "fused kernel supports one skip layer"
    skip = cfg.skips[0]
    trunk = params["fc_net"]
    feat = cfg.feat
    ein = cfg.xyz_in_dim
    ein_p = _round_up(ein, LANE)

    def pad_w(w, rows, cols):
        out = jnp.zeros((rows, cols), dtype)
        return out.at[:w.shape[0], :w.shape[1]].set(w.astype(dtype))

    packed: Dict[str, jnp.ndarray] = {}
    packed["w0"] = pad_w(trunk[0]["w"], ein_p, feat)
    packed["b0"] = trunk[0]["b"].astype(jnp.float32)

    mids_w, mids_b = [], []
    for i in range(1, cfg.layers):
        layer = trunk[i]
        if i == skip:
            # rows [0:ein] act on enc, rows [ein:] on h (concat([enc, h]))
            packed["w_skip_top"] = pad_w(layer["w"][:ein], ein_p, feat)
            packed["w_skip_bot"] = layer["w"][ein:].astype(dtype)
            packed["b_skip"] = layer["b"].astype(jnp.float32)
        else:
            mids_w.append(layer["w"].astype(dtype))
            mids_b.append(layer["b"].astype(jnp.float32))
    packed["w_mid"] = jnp.stack(mids_w)            # (L-2, F, F)
    packed["b_mid"] = jnp.stack(mids_b)
    sw = params["sigma_from_xyz"][0]
    packed["w_sigma"] = pad_w(sw["w"], feat, LANE)
    b_sig = jnp.zeros((LANE,), jnp.float32).at[0].set(
        sw["b"][0].astype(jnp.float32))
    packed["b_sigma"] = b_sig
    return packed


def _trunk_kernel(x_ref, w0_ref, b0_ref, wmid_ref, bmid_ref,
                  wst_ref, wsb_ref, bs_ref, wsig_ref, bsig_ref,
                  sigma_ref, *feats_refs, layers: int, skip: int,
                  siren: bool, use_fast_sin: bool):
    """One TILE_N block through the whole trunk + sigma head.

    feats_refs is () on the sigma-only paths (the guided sigma probe and
    the sun-visibility march discard feats; writing them costs a 268 MB
    HBM stream per 131k-point pass at flagship shapes)."""
    x = x_ref[:]                                     # (TILE_N, Ein_p) f32

    def act(z, first):
        if siren:
            w0 = 30.0 if first else 1.0
            if use_fast_sin:
                from .fast_math import fast_sin
                return fast_sin(w0 * z)
            return jnp.sin(w0 * z)
        return jnp.maximum(z, 0.0)

    h = act(jnp.dot(x, w0_ref[:],
                    preferred_element_type=jnp.float32) + b0_ref[:],
            first=True)
    mid_idx = 0
    for i in range(1, layers):
        if i == skip:
            z = (jnp.dot(x, wst_ref[:], preferred_element_type=jnp.float32)
                 + jnp.dot(h, wsb_ref[:], preferred_element_type=jnp.float32)
                 + bs_ref[:])
        else:
            z = jnp.dot(h, wmid_ref[mid_idx],
                        preferred_element_type=jnp.float32) + bmid_ref[mid_idx]
            mid_idx += 1
        h = act(z, first=False)
    if feats_refs:
        feats_refs[0][:] = h
    sig = jnp.dot(h, wsig_ref[:],
                  preferred_element_type=jnp.float32) + bsig_ref[:]
    # one-column sigma output: the LANE-wide layout wrote (and its
    # consumer re-read) 127 dead lanes per point
    sigma_ref[:] = jax.nn.softplus(sig[:, 0:1])


def fused_trunk_sigma(params: Dict, cfg: ModelConfig, x_enc: jnp.ndarray,
                      interpret=None,
                      want_feats: bool = True) -> Tuple[jnp.ndarray, ...]:
    """Evaluate trunk + sigma for encoded points.

    x_enc: (N, Ein) float32 encoded xyz.  Returns (sigma (N,), feats (N, F)),
    or (sigma, None) with want_feats=False (skips the feats HBM write —
    the sigma-only render passes never read them).
    N is padded up to TILE_N internally.  interpret=None auto-selects
    interpreter mode on CPU backends (tests / debugging).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = (jnp.bfloat16
             if cfg.compute_dtype in ("bfloat16", "bfloat16_all")
             else jnp.float32)
    packed = pack_trunk_weights(params, cfg, dtype)
    n, ein = x_enc.shape
    ein_p = _round_up(ein, LANE)
    n_p = _round_up(max(n, TILE_N), TILE_N)
    if n == n_p and ein == ein_p:
        # already lane/tile-aligned (padded-encoding callers): no pad op
        x = x_enc.astype(jnp.float32)
    else:
        x = jnp.zeros((n_p, ein_p), jnp.float32).at[:n, :ein].set(x_enc)
    feat = cfg.feat

    grid = (n_p // TILE_N,)
    kernel = functools.partial(_trunk_kernel, layers=cfg.layers,
                               skip=cfg.skips[0], siren=cfg.siren,
                               use_fast_sin=cfg.fast_sin)
    block = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    # point tiles are independent -> parallel grid (same annotation as the
    # custom-VJP fwd kernel; lets Mosaic pipeline tiles without ordering)
    params_tpu = (None if interpret else
                  pltpu.CompilerParams(dimension_semantics=("parallel",)))
    out_specs = [pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n_p, 1), jnp.float32)]
    if want_feats:
        out_specs.append(pl.BlockSpec((TILE_N, feat), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n_p, feat), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=params_tpu,
        in_specs=[
            pl.BlockSpec((TILE_N, ein_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            block((ein_p, feat)), block((feat,)),
            block((cfg.layers - 2, feat, feat)),
            block((cfg.layers - 2, feat)),
            block((ein_p, feat)), block((feat, feat)), block((feat,)),
            block((feat, LANE)), block((LANE,)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(x, packed["w0"], packed["b0"], packed["w_mid"], packed["b_mid"],
      packed["w_skip_top"], packed["w_skip_bot"], packed["b_skip"],
      packed["w_sigma"], packed["b_sigma"])
    sigma = outs[0]
    feats = outs[1][:n] if want_feats else None
    return sigma[:n, 0], feats


def fused_sigma_fn(params: Dict, cfg: ModelConfig, xyz: jnp.ndarray,
                   interpret=None) -> jnp.ndarray:
    """Drop-in for models.network.sigma_fn on no-grad paths."""
    from .encoding import positional_encoding
    if cfg.mapping and cfg.mapping_sizes[0] > 0:
        # emit the encoding at the kernel's lane width directly (padded
        # lanes are sin(0) = 0) — the pad rides the encoding fusion
        # instead of a separate ~35 MB copy per sigma pass
        ein_p = _round_up(2 * cfg.mapping_sizes[0] * xyz.shape[-1], LANE)
        enc = positional_encoding(xyz, cfg.mapping_sizes[0],
                                  fast=cfg.fast_sin, pad_to=ein_p)
    else:
        enc = xyz
    sigma, _ = fused_trunk_sigma(params, cfg, enc, interpret=interpret,
                                 want_feats=False)
    return sigma
