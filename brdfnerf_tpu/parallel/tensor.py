"""Optional tensor parallelism over a 2-D (data, model) mesh.

The reference is single-GPU and its 8x512 trunk fits in a sliver of one
chip's HBM, so plain data parallelism is the right default (see mesh.py).
Tensor parallelism exists for the SCALED-UP trunks this framework supports
beyond the reference (--fc_feat 2048+, --fc_layers 12+): past the point
where one chip's HBM holds params + Adam state + activations for the
per-device batch, the trunk's weight matrices shard over a second 'model'
mesh axis and every trunk matmul runs partitioned on the MXUs of the
model group.

The scheme is the classic alternating column/row split (Megatron-style),
expressed purely as GSPMD NamedSharding annotations — no hand-written
collectives:

  layer 2k   W: (in, feat)  -> P(None, 'model')   column-parallel
             b: (feat,)     -> P('model')
  layer 2k+1 W: (feat, out) -> P('model', None)   row-parallel
             b: (out,)      -> P()

A column-parallel layer's output activation is 'model'-sharded; the
following row-parallel layer contracts over that sharded dim, so the XLA
SPMD partitioner inserts exactly one psum per layer PAIR (the Megatron
schedule) — sin() between them is elementwise and runs on the sharded
activation.  Skip layers are forced column-parallel regardless of parity:
_trunk_features slices their W along the INPUT dim (rows) at e_dim, and
that split must stay shard-local.  The reference trunk (8 layers, skip at
4) keeps perfect alternation because 4 is even.

Heads, the t-embedding, and the optimizer scalars stay replicated: heads
are thin [F, F/2, out] MLPs whose redundant evaluation per model-group
member is cheaper than sharding their tiny matmuls, and their input (the
trunk output after a row-parallel layer) is already replicated after the
final psum.

Adam mu/nu mirror the parameter tree, so ONE path-pattern rule shards
params, grads, and optimizer state alike: anything under
fc_net[i].{w,b} follows the table above; everything else replicates.

Composability: the 'data' axis keeps its entire contract — batch arrays
shard over 'data' (replicated over 'model', so every model-group member
sees the full local batch), the sharded ray store and the in-program
gather are untouched, and the gradient all-reduce over 'data' is inserted
by GSPMD exactly as in the 1-D mesh.  RenderConfig.fused_trunk is
incompatible (the Pallas custom-VJP kernel assumes whole weight matrices
in VMEM); Trainer forces it off under TP.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, SequenceKey


def tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D (data, model) mesh over the first n_data*n_model devices.

    Axis order puts 'model' innermost so a model group maps to adjacent
    devices — on real hardware that is the highest-bandwidth ICI
    neighborhood, where the per-layer-pair psum traffic belongs; the
    lower-rate gradient all-reduce rides the outer 'data' axis."""
    devs = list(jax.devices()) if devices is None else list(devices)
    need = n_data * n_model
    if len(devs) < need:
        raise ValueError(f"need {need} devices for a {n_data}x{n_model} "
                         f"(data, model) mesh, have {len(devs)}")
    arr = np.asarray(devs[:need]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def model_axis_size(mesh) -> int:
    """Size of the 'model' axis (1 when absent -> TP inactive)."""
    if mesh is None:
        return 1
    return int(dict(mesh.shape).get("model", 1))


def data_axis_size(mesh) -> int:
    """Size of the 'data' axis — the batch-scaling factor on any mesh
    (equals mesh.size on the 1-D default mesh)."""
    if mesh is None:
        return 1
    return int(dict(mesh.shape).get("data", mesh.size))


def _trunk_layer_of(path) -> Tuple[int, str] | None:
    """(layer index, 'w'|'b') when the path addresses a trunk linear leaf
    — the ... DictKey('fc_net') / SequenceKey(i) / DictKey('w'|'b') tail
    appears identically under params, Adam mu/nu, and restored trees."""
    for j in range(len(path) - 2):
        if (isinstance(path[j], DictKey) and path[j].key == "fc_net"
                and isinstance(path[j + 1], SequenceKey)
                and isinstance(path[j + 2], DictKey)
                and path[j + 2].key in ("w", "b")):
            return path[j + 1].idx, path[j + 2].key
    return None


def trunk_spec(path, skips=(4,)) -> P:
    """PartitionSpec of one state leaf under the alternating scheme."""
    hit = _trunk_layer_of(path)
    if hit is None:
        return P()
    i, kind = hit
    col = (i % 2 == 0) or (i in skips)
    if kind == "w":
        return P(None, "model") if col else P("model", None)
    return P("model") if col else P()


def state_shardings(mesh: Mesh, tree: Any, skips=(4,)) -> Any:
    """NamedSharding pytree for a TrainState (or params / grads / opt
    subtree) under the TP scheme — usable directly as jit in/out
    shardings."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, trunk_spec(path, skips)), tree)


def shard_state(mesh: Mesh, tree: Any, skips=(4,)) -> Any:
    """Place a TrainState on the mesh under the TP scheme (the TP analog
    of mesh.replicate)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, trunk_spec(path, skips))), tree)
