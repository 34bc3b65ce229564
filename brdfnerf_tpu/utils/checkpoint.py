"""Checkpointing: full save/restore, partial per-head restore, freezing.

The reference saves Lightning state_dicts with module-path keys
(nerf_coarse.fc_net.0.weight, ...) and supports three load modes
(main.py:88-118, eval.py:26-54): (a) full resume, (b) two-stage handoff —
restore only trunk + sigma + feats (+ rgb head unless Hapke) from the
stage-1 Lambertian checkpoint, (c) eval load + freeze-all.

Here params are nested dicts/lists of jnp arrays; checkpoints are flat
.npz files keyed by the pytree path (coarse/fc_net/0/w, t, ...), so the
handoff filter is a literal key-prefix subset.  Optimizer state and step
are saved alongside for full resume.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Iterable, Optional, Sequence

import jax
import numpy as np

SEP = "/"

# stage-2 BRDF finetune restores exactly these heads from the stage-1
# checkpoint (main.py:97-104); rgb head included unless the Hapke single-
# scattering albedo head replaces it
HANDOFF_HEADS = ("fc_net", "sigma_from_xyz", "feats_from_xyz")
HANDOFF_RGB = "rgb_from_xyzdir"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{SEP}"))
    else:
        out[prefix.rstrip(SEP)] = np.asarray(tree)
    return out


def _set_path(tree: Any, parts: Sequence[str], value):
    key = parts[0]
    if isinstance(tree, (list, tuple)):
        key = int(key)
    if len(parts) == 1:
        tree[key] = value
    else:
        _set_path(tree[key], parts[1:], value)


def save_checkpoint(path: str, params: Any, step: int = 0,
                    extra: Optional[Dict[str, Any]] = None):
    flat = _flatten(params)
    flat["__step__"] = np.asarray(step)
    if extra:
        for k, v in _flatten(extra).items():
            flat[f"__extra__{SEP}{k}"] = v
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)
    return path


def load_flat(path: str) -> Dict[str, np.ndarray]:
    if path.endswith((".ckpt", ".pth", ".pt")):
        # a reference (torch/Lightning) checkpoint: convert on the fly so
        # --in_ckpts/--resume accept checkpoints trained by the reference
        from .torch_import import import_torch_checkpoint
        return import_torch_checkpoint(path)
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def restore_params(template: Any, path: str,
                   include: Optional[Iterable[str]] = None,
                   strict: bool = True) -> Any:
    """Restore arrays into a copy of `template` (same treedef).

    include: optional list of key prefixes (e.g. ['coarse/fc_net']) — only
    matching entries are restored, the rest keep template values (the
    two-stage handoff, eval.extract_model_state_dict semantics).
    """
    flat_t = _flatten(template)
    flat_c = load_flat(path)
    params = jax.tree_util.tree_map(lambda x: x, template)  # shallow copy
    restored_keys = set()
    for key, val in flat_c.items():
        if key.startswith("__"):
            continue
        if include is not None and not any(
                key.startswith(p) for p in include):
            continue
        if key not in flat_t:
            if strict and include is None:
                raise KeyError(f"checkpoint key {key} not in template")
            continue
        if flat_t[key].shape != val.shape:
            raise ValueError(
                f"shape mismatch for {key}: {flat_t[key].shape} vs {val.shape}")
        _set_path(params, key.split(SEP), val.astype(flat_t[key].dtype))
        restored_keys.add(key)
    if not restored_keys:
        raise ValueError(f"nothing restored from {path} (include={include})")
    if strict and include is None:
        # a FULL restore must cover every template parameter — silently
        # keeping random-init values for heads absent from the checkpoint
        # (e.g. loading a stage-1 Lambertian ckpt into a BRDF config
        # without the handoff include list) would score garbage metrics
        missing = [k for k in flat_t if k not in restored_keys]
        if missing:
            raise ValueError(
                f"{path} is missing {len(missing)} parameters of this "
                f"model config (e.g. {missing[:3]}); use the handoff "
                f"include filter for partial restores")
    return params


def resolve_epoch_ckpt(ckpts_dir: str, epoch_number: int) -> str:
    """Path of epoch={n}: native .npz, else the reference's Lightning
    .ckpt (converted on load by load_flat via utils/torch_import)."""
    npz = os.path.join(ckpts_dir, f"epoch={epoch_number}.npz")
    if os.path.exists(npz):
        return npz
    torch_path = os.path.join(ckpts_dir, f"epoch={epoch_number}.ckpt")
    if os.path.exists(torch_path):
        return torch_path
    raise FileNotFoundError(f"neither {npz} nor {torch_path} found")


def checkpoint_step(path: str) -> int:
    flat = load_flat(path)
    return int(flat.get("__step__", np.asarray(0)))


def handoff_include(net_key: str = "coarse",
                    hapke_b: bool = False) -> list:
    """Key prefixes for the stage-1 -> stage-2 handoff (main.py:97-104)."""
    heads = list(HANDOFF_HEADS) + ([] if hapke_b else [HANDOFF_RGB])
    return [f"{net_key}{SEP}{h}" for h in heads]


def freeze_mask(params: Any, frozen_prefixes: Iterable[str]) -> Any:
    """Pytree of bools: True where the parameter is trainable.  Feed to
    optax.masked to freeze heads (spsbrdfnerf.freeze:617-621 analog)."""
    flat = _flatten(params)
    # 'all' freezes everything (reference freeze('all'), spsbrdfnerf.py:617)
    frozen = ["" if p == "all" else p for p in frozen_prefixes]

    def trainable(key: str) -> bool:
        return not any(key.startswith(p) for p in frozen)

    mask = jax.tree_util.tree_map(lambda x: True, params)
    for key in flat:
        _set_path(mask, key.split(SEP), trainable(key))
    return mask


def save_opt_state(path: str, opt_state: Any):
    """Optimizer state (nested optax namedtuples) saved as an indexed leaf
    list — the tree structure itself is rebuilt from a template at restore
    (full-resume parity with Lightning checkpoints, main.py:723)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    arrays = {f"leaf_{i:04d}": np.asarray(v) for i, v in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)
    return path


def restore_opt_state(template: Any, path: str) -> Any:
    flat = load_flat(path)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    n = len([k for k in flat if k.startswith("leaf_")])
    if n != len(leaves_t):
        raise ValueError(
            f"optimizer-state leaf count mismatch: ckpt {n} vs "
            f"template {len(leaves_t)} (different optimizer config?)")
    leaves = []
    for i, t in enumerate(leaves_t):
        v = flat[f"leaf_{i:04d}"]
        if np.shape(t) != v.shape:
            raise ValueError(f"opt-state leaf {i} shape mismatch: "
                             f"{np.shape(t)} vs {v.shape}")
        leaves.append(v.astype(np.asarray(t).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Highest-epoch epoch={n}.npz in a directory (reference file naming
    epoch={n}.ckpt, main.py:709-712)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_n = None, -1
    for f in os.listdir(ckpt_dir):
        m = re.fullmatch(r"epoch=(\d+)\.npz", f)
        if m and int(m.group(1)) > best_n:
            best_n = int(m.group(1))
            best = os.path.join(ckpt_dir, f)
    return best
