"""Cell-parallel Mega-NeRF training: all submodules in ONE jitted program.

This replaces the reference's process-level fan-out (`parscripts/run_8.txt` —
one `train.py` job per submodule per GPU, SURVEY §2.3.1) with `shard_map`
over the mesh 'cell' axis:

- parameters are STACKED over a leading cell axis and sharded over 'cell' —
  each device group holds exactly its submodule;
- each cell consumes its own masked ray stream: the batch is
  (cells, per_cell_batch, ...), sharded over ('cell', 'data');
- gradients all-reduce only over 'data' (within a cell); NOTHING crosses
  the 'cell' axis — the spatial strategy's defining property (the reference
  has literally zero inter-submodule communication during training);
- per-cell PRNG keys and optimizer states keep the streams independent, so
  the result is equivalent to K separate jobs, at 1/K the orchestration cost
  and with one compiled program.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mega_nerf_tpu.models.factory import ModelBundle
from mega_nerf_tpu.parallel.train_step import TrainState, make_train_step
from mega_nerf_tpu.render.rendering import RenderSettings


def make_cell_train_state(
    fg: ModelBundle,
    bg: Optional[ModelBundle],
    optimizer,
    key: jax.Array,
    num_cells: int,
) -> TrainState:
    """Stacked TrainState: every leaf gains a leading (num_cells,) axis with
    independently initialized parameters and PRNG streams per cell."""
    from mega_nerf_tpu.parallel.train_step import make_train_state

    keys = jax.random.split(key, num_cells)
    return jax.vmap(lambda k: make_train_state(fg, bg, optimizer, k))(keys)


def make_cell_parallel_train_step(
    fg: ModelBundle,
    bg: Optional[ModelBundle],
    settings: RenderSettings,
    optimizer,
    mesh: Mesh,
    sphere_center=None,
    sphere_radius=None,
    use_appearance: bool = True,
):
    """Build the shard_map'd step: (stacked_state, (C,B,...) batch) ->
    (stacked_state, (C,) per-cell metrics)."""

    inner_step = make_train_step(
        fg, bg, settings, optimizer, sphere_center, sphere_radius,
        use_appearance=use_appearance, pmean_axis="data",
    )

    def block_fn(state_blk: TrainState, batch_blk: Dict[str, jnp.ndarray]):
        # Blocks carry a leading cell axis of size num_cells/|cell| (one cell
        # per device group in the standard layout).
        def one_cell(state, batch):
            return inner_step(state, batch)

        new_state, metrics = jax.vmap(one_cell)(state_blk, batch_blk)
        return new_state, metrics

    state_spec = P("cell")
    batch_spec = P("cell", "data")
    metrics_spec = P("cell")

    sharded = shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(state_spec, batch_spec),
        out_specs=(state_spec, metrics_spec),
        check_vma=False,
    )

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        return sharded(state, batch)

    return step


def place_cell_parallel(
    mesh: Mesh, state: TrainState, batch: Dict[str, jnp.ndarray]
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Device placement: state sharded over 'cell', batch over ('cell','data')."""
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("cell"))), state
    )
    batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("cell", "data"))), batch
    )
    return state, batch
