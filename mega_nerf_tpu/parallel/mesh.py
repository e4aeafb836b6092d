"""Device mesh construction and sharding helpers.

The mesh has up to two axes:
- 'cell': spatial submodules (Mega-NeRF cells) — parameters are sharded,
  ray streams are disjoint, no gradient communication crosses this axis;
- 'data': data parallelism within a cell — batches shard, gradients
  all-reduce over ICI.

On a v4-32 training Rubble-8 the natural layout is cell=8 x data=4. The
reference's equivalents are parscript job fan-out (cell) and DDP (data).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    cell_axis: int = 1,
    data_axis: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data_axis is None:
        assert len(devices) % cell_axis == 0, (len(devices), cell_axis)
        data_axis = len(devices) // cell_axis
    n = cell_axis * data_axis
    assert n <= len(devices), (
        f"mesh {cell_axis}x{data_axis} needs {n} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[:n]).reshape(cell_axis, data_axis)
    return Mesh(grid, ("cell", "data"))


def shard_batch(mesh: Mesh, batch, with_cell_axis: bool = False):
    """Place a host batch on the mesh: leading axis over 'data' (and 'cell'
    first when the batch is (cells, per_cell, ...)).

    Multi-process correct: each process passes its PROCESS-LOCAL slice of the
    global batch (the DistributedSampler contract, reference
    `runner.py:228-233` — global batch divided by world size) and
    `jax.make_array_from_process_local_data` assembles the global sharded
    array. Single-process, this is exactly `device_put`.
    """
    if with_cell_axis:
        # CellDataset builds the FULL (cells, global_batch, ...) batch on
        # every process (streams are seed-deterministic, so hosts agree) —
        # full-value placement, jax slices out each device's block.
        return _place(mesh, batch, P("cell", "data"), full_value=True)
    # Data-parallel contract: each process passes its PROCESS-LOCAL batch
    # slice (the DistributedSampler equivalent) and the global batch shape
    # is inferred.
    return _place(mesh, batch, P(("cell", "data")), full_value=False)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh. Multi-process: every process
    must pass the same values (params from the same seed / checkpoint)."""
    return _place(mesh, tree, P(), full_value=True)


def shard_over_cells(mesh: Mesh, tree):
    """Shard a stacked (leading axis = cell) pytree over the 'cell' axis,
    replicated over 'data'. Multi-process: every process passes the full
    stacked tree; each keeps only its addressable cells."""
    return _place(mesh, tree, P("cell"), full_value=True)


def _place(mesh: Mesh, tree, spec: P, full_value: bool):
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    # device_put onto a multi-host sharding would allgather-verify host
    # values (slow) or reject host-local data outright;
    # make_array_from_process_local_data is the supported assembly path.
    #
    # full_value=True: every process passes the ENTIRE array and jax maps
    # each device to its slice — signalled by global_shape == local shape.
    # Without it, jax infers an INFLATED global shape (local * number of
    # process-chunks) for any dimension whose mesh axis spans processes,
    # e.g. a cell=8 stack placed on a 4-process v4-32 would become a
    # 32-cell global array.
    #
    # full_value=False: each process passes its process-local slice and
    # the global shape is inferred (uniform sharding).
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x),
            global_shape=np.asarray(x).shape if full_value else None,
        ),
        tree,
    )
