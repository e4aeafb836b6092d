"""SPMD parallelism (replaces torch DDP/NCCL + the parscript job fan-out).

- `train_step`: jitted training step; data parallelism comes from sharding
  the ray batch over the mesh's 'data' axis — XLA inserts the gradient
  all-reduce over ICI (no explicit NCCL/DDP, reference `runner.py:55,120-129`).
- `cell_parallel`: the headline Mega-NeRF strategy — K spatial submodules
  training simultaneously in ONE program via `shard_map` over the 'cell'
  axis, each on its own masked ray stream with zero inter-cell collectives
  (replaces `parscripts/run_8.txt`, reference SURVEY §2.3.1).
"""

from mega_nerf_tpu.parallel.train_step import TrainState, make_train_state, make_train_step
from mega_nerf_tpu.parallel.mesh import make_mesh, shard_batch, replicate

__all__ = [
    "TrainState",
    "make_train_state",
    "make_train_step",
    "make_mesh",
    "shard_batch",
    "replicate",
]
