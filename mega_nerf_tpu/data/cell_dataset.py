"""Per-cell masked ray streams for one-program cell-parallel training.

The reference trains each spatial submodule as an independent job on its own
cluster-masked ray stream (`parscripts/run_8.txt`: one train.py per centroid,
each with `--cluster_mask_path masks/{i}` and its own chunk store). This
module reproduces those K independent streams inside ONE process and stacks
them into `(cells, per_cell_batch, ...)` batches for the shard_map'd
cell-parallel train step (`mega_nerf_tpu.parallel.cell_parallel`):

- each cell gets its own underlying dataset (MemoryDataset, or a
  FilesystemDataset with a per-cell parquet chunk store — mirroring the
  reference's per-job `--chunk_paths`);
- streams cycle independently with per-(cell, epoch) seeded shuffles, so the
  sample order each cell sees is exactly what an independent job with that
  seed would see — cells never synchronize on epoch boundaries (they have
  different stream lengths, and the reference's jobs run for a fixed
  iteration count, not epochs);
- stream positions (epoch, batch_index per cell) are checkpointable and
  deterministically fast-forwardable for exact mid-stream resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from mega_nerf_tpu.data.image_metadata import ImageMetadata
from mega_nerf_tpu.data.memory_dataset import MemoryDataset


class _CellStream:
    """An endless, resumable minibatch stream over one cell's dataset.

    Epoch shuffles are seeded by (seed, epoch, cell) so the stream is a pure
    function of its position — fast-forward just replays the cheap index
    bookkeeping, not the data.
    """

    def __init__(self, dataset, seed: int, cell: int):
        self._dataset = dataset
        self._seed = seed
        self._cell = cell
        self.epoch = 0
        self.batch_index = -1
        self._iter = None

    def _epoch_rng(self) -> np.random.Generator:
        return np.random.default_rng((self._seed, self.epoch, self._cell))

    def next_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        while True:
            if self._iter is None:
                self._iter = self._dataset.batches(batch_size, self._epoch_rng())
            try:
                batch = next(self._iter)
                self.batch_index += 1
                return batch
            except StopIteration:
                self._iter = None
                self.epoch += 1
                self.batch_index = -1

    def state(self) -> Dict[str, int]:
        return {"epoch": self.epoch, "batch_index": self.batch_index}

    def set_state(self, state: Dict[str, int], batch_size: int) -> None:
        """Fast-forward to just past (epoch, batch_index)."""
        self.epoch = int(state["epoch"])
        self.batch_index = -1
        self._iter = None
        if hasattr(self._dataset, "set_position"):
            # FilesystemDataset: one epoch == one chunk in the deterministic
            # cycle; jump the chunk cursor instead of replaying loads.
            self._dataset.set_position(self.epoch)
        target = int(state["batch_index"])
        for _ in range(target + 1):
            self.next_batch(batch_size)


class CellDataset:
    """K per-cell ray streams -> stacked (cells, per_cell, ...) batches."""

    def __init__(
        self,
        cell_items: List[List[ImageMetadata]],
        near: float,
        far: float,
        ray_altitude_range: Optional[Sequence[float]],
        center_pixels: bool,
        seed: int,
        dataset_type: str = "memory",
        chunk_paths: Optional[List[Path]] = None,
        num_chunks: int = 200,
        scale_factor: int = 1,
        disk_flush_size: int = 10_000_000,
        owned_cells: Optional[Sequence[int]] = None,
        min_chunk_rays: int = 0,
    ):
        """owned_cells: multi-process mode — build streams ONLY for these
        cells (the cells whose mesh 'cell' blocks this process's devices
        own). `next_batch` zero-fills the other cells' rows; the full-value
        placement (`parallel.mesh.shard_batch(with_cell_axis=True)`) only
        reads each process's addressable slices, so the zeros never reach a
        device. Filesystem stores become process-PRIVATE per-host per-cell
        chunk stores (each host writes/reads only its own cells' stores —
        chunk_paths is per-host scratch). None (default) = single-process /
        deterministic-all-cells mode: every cell's stream is built here.

        min_chunk_rays: clamp each cell's filesystem chunk count so chunks
        hold at least this many rays. Cluster-masked cell streams are
        wildly uneven (a 5x5 grid's border cells see a few hundred rays
        where central cells see hundreds of thousands); a GLOBAL
        --num_chunks sized for the big cells shatters the small ones into
        sub-batch chunks, which FilesystemDataset.batches rejects loudly.
        Callers pass ~4x the per-cell batch (CellRunner does)."""
        self.num_cells = len(cell_items)
        self.owned_cells: List[int] = (
            list(range(self.num_cells)) if owned_cells is None
            else sorted(owned_cells)
        )
        # An EMPTY owned set is legal in multi-process mode: with the cell
        # axis padded to the mesh (CellRunner.padded_cells), a process may
        # own only dummy padding cells — it builds no streams and
        # next_batch returns the all-zero full-value placeholder (never
        # addressable by its devices).
        private_store = owned_cells is not None
        self._streams: Dict[int, _CellStream] = {}
        for cell in self.owned_cells:
            items = cell_items[cell]
            # Per-cell dataset rng seeded like an independent job would be
            # (Runner._make_dataset uses default_rng(random_seed)); the cell
            # index keeps the val-pixel rebalancing draws distinct per cell.
            ds_rng = np.random.default_rng((seed, cell))
            if dataset_type == "memory":
                ds = MemoryDataset(
                    items, near, far, ray_altitude_range, center_pixels, ds_rng
                )
            elif dataset_type == "filesystem":
                from mega_nerf_tpu.data.filesystem_dataset import FilesystemDataset

                assert chunk_paths, "filesystem cell dataset needs chunk_paths"
                cell_chunks = num_chunks
                if min_chunk_rays > 0:
                    cell_chunks = max(
                        1,
                        min(num_chunks,
                            self._count_rays(items) // min_chunk_rays),
                    )
                ds = FilesystemDataset(
                    items, near, far, ray_altitude_range, center_pixels,
                    [Path(p) / f"cell{cell}" for p in chunk_paths],
                    cell_chunks, scale_factor, disk_flush_size, rng=ds_rng,
                    process_scope="private" if private_store else "global",
                )
            else:
                raise Exception(f"Unrecognized dataset type: {dataset_type}")
            self._streams[cell] = _CellStream(ds, seed, cell)

    @staticmethod
    def _count_rays(items: List[ImageMetadata]) -> int:
        """Upper-ish bound on a cell's training rays: masked pixel count
        (val-image left-half subsetting trims some further — callers use a
        safety factor on top). One extra pass of zipped-mask IO, host-only,
        before the chunk store is sized."""
        total = 0
        for it in items:
            m = it.load_mask()
            total += int(m.sum()) if m is not None else it.W * it.H
        return total

    def next_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        """One (num_cells, batch_size, ...) batch; cells advance independently.

        Non-owned cells' rows are zeros (see __init__ — never addressable
        by this process's devices)."""
        per_cell = {
            c: self._streams[c].next_batch(batch_size)
            for c in self.owned_cells
        }
        if per_cell:
            template = {
                k: (v.shape, v.dtype)
                for k, v in per_cell[self.owned_cells[0]].items()
            }
        else:
            # Owns no real cell (only mesh padding): emit the batch
            # contract's shapes/dtypes so the full-value placement is
            # well-formed on this process too.
            import jax

            local = batch_size // jax.process_count()
            template = {
                "rgbs": ((local, 3), np.float32),
                "rays": ((local, 8), np.float32),
                "img_indices": ((local,), np.int32),
            }
        out = {}
        for k, (shape, dtype) in template.items():
            stacked = np.zeros((self.num_cells,) + shape, dtype)
            for c, b in per_cell.items():
                stacked[c] = b[k]
            out[k] = stacked
        return out

    def state(self) -> List[Optional[Dict[str, int]]]:
        """Per-cell stream positions; None for cells this process doesn't
        own (CellRunner allgathers the owned entries across processes
        before checkpointing)."""
        return [
            self._streams[c].state() if c in self._streams else None
            for c in range(self.num_cells)
        ]

    def set_state(
        self, states: List[Optional[Dict[str, int]]], batch_size: int
    ) -> None:
        assert len(states) == self.num_cells, (len(states), self.num_cells)
        for cell in self.owned_cells:
            st = states[cell]
            assert st is not None, f"no stream state for owned cell {cell}"
            self._streams[cell].set_state(st, batch_size)
