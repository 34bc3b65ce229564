from .mesh import make_mesh, shard_batch, replicate
from .train_step import (TrainState, create_train_state, make_train_step,
                         make_render_step, TrainGates)

__all__ = ["make_mesh", "shard_batch", "replicate", "TrainState",
           "create_train_state", "make_train_step", "make_render_step",
           "TrainGates"]
