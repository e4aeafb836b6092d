"""One-program cell-parallel Mega-NeRF training.

Replaces the reference's whole multi-submodule training fan-out — parscript
dispatching one `train.py` job per centroid per GPU
(`/root/reference/parscripts/run_8.txt`) — with a single SPMD program over a
(cell, data) device mesh:

- cluster masks (from `scripts/create_cluster_masks.py`) define K per-cell
  ray streams (`data/cell_dataset.py`), exactly the streams K independent
  jobs with `--cluster_mask_path masks/{i}` would consume;
- parameters are stacked over a leading cell axis and sharded over 'cell';
  each cell's gradients all-reduce only over 'data' — nothing crosses the
  cell axis, matching the reference's zero inter-submodule communication;
- per-cell checkpoints land in `{exp_name}{i}/{version}/models/{iter}.ckpt`,
  the exact layout `scripts/merge_submodules.py` consumes
  (reference `merge_submodules.py:24-77`), so the downstream merge -> octree
  -> render pipeline is unchanged;
- resume restacks the K per-cell checkpoints and fast-forwards every cell's
  stream to its exact batch position.

Usage: `python -m mega_nerf_tpu.train_cells --cluster_mask_path <masks_root>
--exp_name <prefix> --cell_axis K ...` where masks_root holds params.pt and
the per-cell mask dirs 0..K-1.
"""

from __future__ import annotations

import sys
from argparse import Namespace
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np

from mega_nerf_tpu.data.cell_dataset import CellDataset
from mega_nerf_tpu.data.image_metadata import ImageMetadata
from mega_nerf_tpu.data.torch_io import load_pt
from mega_nerf_tpu.parallel.cell_parallel import (
    make_cell_parallel_train_step,
    make_cell_train_state,
)
from mega_nerf_tpu.parallel.mesh import shard_batch, shard_over_cells
from mega_nerf_tpu.parallel.train_step import (
    TrainState,
    make_optimizer,
    make_train_state,
)
from mega_nerf_tpu.render.rendering import RenderSettings
from mega_nerf_tpu.runtime import checkpoints as ckpt_io
from mega_nerf_tpu.runtime.logging import MetricsWriter, main_print
from mega_nerf_tpu.runtime.runner import Runner, TrainLoopHooks


class CellRunner(Runner):
    """Trains ALL submodules of a Mega-NeRF in one jitted program.

    `hparams.cluster_mask_path` must be the masks ROOT (the directory
    containing params.pt and per-cell subdirs 0..K-1) — each cell trains on
    the stream an independent job pointed at `masks/{i}` would see.
    `hparams.exp_name` is the per-cell experiment PREFIX: cell i writes to
    `{exp_name}{i}/`, which is what merge_submodules' --ckpt_prefix expects.
    """

    _cell_parallel = True

    def __init__(self, hparams: Namespace):
        mask_root = Path(hparams.cluster_mask_path)
        params = load_pt(mask_root / "params.pt")
        grid_dim = [int(x) for x in params["grid_dim"]]
        self.num_cells = grid_dim[0] * grid_dim[1]
        self.mask_root = mask_root

        cell_axis = getattr(hparams, "cell_axis", 1) or 1
        # The stacked cell axis is padded up to a multiple of the mesh
        # 'cell' axis with DUMMY cells so any K (e.g. the reference's 5x5=25
        # submodule grids, README.md:46) shards onto any power-of-two TPU
        # slice — the reference's parscript queue likewise handles any K on
        # any GPU count. Dummy cells train throwaway parameters on a
        # synthetic finite ray stream; nothing crosses the cell axis, so
        # real cells are bit-identical to the unpadded program (the same
        # exactness argument as cell_cull.bucket_mask's padding), and dummy
        # rows are excluded from metrics, checkpoints, merge, and the
        # reported rays/s.
        self.padded_cells = -(-self.num_cells // cell_axis) * cell_axis

        # Base init does scene setup / model build / mesh with NO mask (the
        # mask root is not a per-cell mask dir); per-cell masks are applied
        # to cloned metadata below. Cluster-vs-scene param validation
        # (reference runner.py:96-105) still runs against the root params.pt
        # because Runner checks `Path(cluster_mask_path).parent/params.pt`
        # and we pass `mask_root/0` for that check.
        hparams.cluster_mask_path = str(mask_root / "0")
        super().__init__(hparams, set_experiment_path=False)
        hparams.cluster_mask_path = str(mask_root)

        # Per-cell metadata: same images, per-cell cluster masks (what
        # `--cluster_mask_path masks/{i}` gives an independent job).
        self.cell_items: List[List[ImageMetadata]] = []
        for cell in range(self.num_cells):
            items = []
            for item in self.train_items:
                mask = (
                    None
                    if (item.is_val and hparams.all_val)
                    else mask_root / str(cell) / f"{item.image_path.stem}.pt"
                )
                items.append(
                    ImageMetadata(
                        item.image_path, item.c2w, item.W, item.H,
                        item.intrinsics, item.image_index, mask, item.is_val,
                    )
                )
            self.cell_items.append(items)

        # Per-cell experiment dirs: {exp_name}{i}/{version} (the reference's
        # per-job layout that merge_submodules walks).
        self.exp_prefix = str(Path(hparams.exp_name).absolute())
        if self.is_master:
            versions = []
            for cell in range(self.num_cells):
                exp_dir = Path(f"{self.exp_prefix}{cell}")
                exp_dir.mkdir(parents=True, exist_ok=True)
                existing = [
                    int(x.name) for x in exp_dir.iterdir() if x.name.isdigit()
                ]
                versions.append(0 if not existing else max(existing) + 1)
            # One aligned version number across cells (a fresh joint run).
            self.version = max(versions)
            self.cell_paths = [
                Path(f"{self.exp_prefix}{cell}") / str(self.version)
                for cell in range(self.num_cells)
            ]
        else:
            self.version = None
            self.cell_paths = []

    # ------------------------------------------------------------------ train

    def train(self) -> None:
        hp = self.hparams
        self._setup_cell_experiment_dirs()

        optimizer = make_optimizer(hp.lr, hp.lr_decay_factor, hp.train_iterations)
        settings = RenderSettings.from_hparams(hp)
        use_appearance = hp.appearance_dim > 0

        state = make_cell_train_state(
            self.fg, self.bg, optimizer, self.init_key, self.padded_cells
        )

        train_iterations = 0
        stream_states: Optional[List[Dict[str, int]]] = None
        if hp.ckpt_path is not None:
            state, train_iterations, stream_states = self._restore_cells(
                hp.ckpt_path, optimizer
            )
            main_print(
                f"Resumed {self.num_cells} cells from {hp.ckpt_path} "
                f"at iteration {train_iterations}"
            )

        step_fn = jax.jit(
            make_cell_parallel_train_step(
                self.fg, self.bg, settings, optimizer, self.mesh,
                self.sphere_center, self.sphere_radius,
                use_appearance=use_appearance,
            ),
            donate_argnums=(0,),
        )

        owned_cells = None
        if jax.process_count() > 1:
            # Each process materializes ONLY its own cells' streams (the
            # cells whose mesh 'cell' blocks its devices own): non-owned
            # rows of the full-value (cells, batch) placement are never
            # addressable here, so building them would be pure waste — and
            # for filesystem stores it would be WRONG (per-host stores are
            # process-private; see CellDataset.__init__). Dummy padding
            # cells (index >= num_cells) have no stream at all — their
            # rows are synthesized in _pad_batch; a process may own only
            # dummies (CellDataset handles the empty-owned case).
            owned_cells = [
                c for c in self._owned_cells() if c < self.num_cells
            ]
            main_print(
                f"process {jax.process_index()} owns cells {owned_cells}"
            )
            if hp.dataset_type == "filesystem":
                self._assert_cells_process_aligned()
        dataset = CellDataset(
            self.cell_items, self.near, self.far, self.ray_altitude_range,
            hp.center_pixels, hp.random_seed,
            dataset_type=hp.dataset_type,
            chunk_paths=(
                [Path(x) for x in sorted(hp.chunk_paths)]
                if hp.chunk_paths else None
            ),
            num_chunks=hp.num_chunks,
            scale_factor=hp.train_scale_factor,
            disk_flush_size=hp.disk_flush_size,
            owned_cells=owned_cells,
            # Border cells of a fine grid see orders of magnitude fewer
            # masked rays than central ones; clamp their chunk counts so
            # every chunk still holds a few batches (see CellDataset).
            min_chunk_rays=4 * hp.batch_size,
        )
        if stream_states is not None and hp.resume_ckpt_state:
            dataset.set_state(stream_states, hp.batch_size)

        state = shard_over_cells(self.mesh, state)

        from tqdm import tqdm as _tqdm

        pbar = (
            _tqdm(total=hp.train_iterations, initial=train_iterations)
            if self.is_master else None
        )
        metrics_host: Dict[str, np.ndarray] = {}
        hooks = TrainLoopHooks(
            hp, self.is_master,
            (self.cell_paths[0] / "profile") if self.cell_paths else None,
            rays_per_step=hp.batch_size * self.num_cells,
            start_iteration=train_iterations,
        )
        while train_iterations < hp.train_iterations:
            batch = self._pad_batch(dataset.next_batch(hp.batch_size))
            batch = shard_batch(self.mesh, batch, with_cell_axis=True)
            state, metrics = step_fn(state, batch)
            if self._serialize_dispatch:
                jax.block_until_ready(metrics)
            train_iterations += 1

            hooks.maybe_profile(train_iterations, metrics)

            if hooks.metrics_due(train_iterations):
                # metrics are (num_cells,) per key — cell-sharded, so with
                # the 'cell' axis spanning hosts they are not addressable
                # until replicated (a tiny allgather; every process is
                # here, metrics_due is deterministic).
                if jax.process_count() > 1:
                    rep = getattr(self, "_replicate_metrics_fn", None)
                    if rep is None:
                        from jax.sharding import (
                            NamedSharding,
                            PartitionSpec as P,
                        )

                        rep = jax.jit(
                            lambda m: m,
                            out_shardings=NamedSharding(self.mesh, P()),
                        )
                        self._replicate_metrics_fn = rep
                    metrics = rep(metrics)
                # Dummy padding cells' metrics are dropped before logging
                # and the finite check (their throwaway streams are not
                # evidence of anything).
                metrics_host = {
                    k: np.asarray(v)[: self.num_cells]
                    for k, v in metrics.items()
                }
                hooks.check_finite(metrics_host)
                rays_per_sec = hooks.throughput(train_iterations)
                if self.writer is not None and rays_per_sec is not None:
                    self.writer.add_scalar(
                        "train/rays_per_sec", rays_per_sec, train_iterations
                    )
                if self.writer is not None:
                    for k, v in metrics_host.items():
                        self.writer.add_scalar(
                            f"train/{k}", float(v.mean()), train_iterations
                        )
                        for cell in range(self.num_cells):
                            self.writer.add_scalar(
                                f"train/{k}/cell{cell}", float(v[cell]),
                                train_iterations,
                            )

            if pbar is not None:
                pbar.update(1)
                if metrics_host:
                    pbar.set_postfix(
                        psnr=f"{np.mean(metrics_host.get('psnr', 0)):.2f}"
                    )

            if train_iterations % hp.ckpt_interval == 0:
                self._save_cell_checkpoints(
                    state, train_iterations,
                    self._global_stream_states(dataset.state()),
                )
                # K collective gathers + file IO ran inside the timed
                # window — same throughput-sample distortion as validation.
                hooks.restart_window(train_iterations)

            if train_iterations % hp.val_interval == 0 and (
                train_iterations < hp.train_iterations
            ):
                self._run_cell_validation(state, train_iterations)
                hooks.restart_window(train_iterations)

        if pbar is not None:
            pbar.close()
        self._save_cell_checkpoints(
            state, train_iterations,
            self._global_stream_states(dataset.state()),
        )
        if self.writer is not None:
            self.writer.flush()
        # The stacked state is host-addressable only single-process; the
        # per-cell checkpoints just written are the multi-process handoff.
        self.final_state = (
            jax.device_get(state) if jax.process_count() == 1 else None
        )

    def _pad_batch(
        self, batch: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        """Append `padded_cells - num_cells` dummy rows to the stacked
        (cells, per_cell, ...) batch.

        Dummy rows are a synthetic, finite, process-independent ray stream
        (origin 0, +z direction, [0.5, 1.0] interval, mid-gray targets):
        the dummy cells' training stays NaN-free on every mesh layout
        without any process owning a real stream for them. Real cells are
        unaffected — nothing crosses the 'cell' axis."""
        pad = self.padded_cells - self.num_cells
        if pad == 0:
            return batch
        out = {}
        for k, v in batch.items():
            fill = np.zeros((pad,) + v.shape[1:], v.dtype)
            if k == "rays":
                fill[..., 5] = 1.0  # unit +z direction
                fill[..., 6] = 0.5  # near
                fill[..., 7] = 1.0  # far (inside the fg ellipsoid)
            elif k == "rgbs":
                fill[...] = 0.5
            out[k] = np.concatenate([v, fill], axis=0)
        return out

    # ---------------------------------------------------------- multi-process

    def _owned_cells(self) -> List[int]:
        """Cells (PADDED indexing — entries >= num_cells are dummies) whose
        parameters/batch rows live on THIS process's devices.

        The stacked state and the (cells, batch) data are sharded over the
        mesh 'cell' axis; mesh cell-row r owns cells
        [r*padded_cells/cell_axis, (r+1)*...). A process owns every cell of
        every row containing one of its devices."""
        cell_axis = self.mesh.devices.shape[0]
        cpb = self.padded_cells // cell_axis
        pid = jax.process_index()
        mine = set()
        for r in range(cell_axis):
            if any(d.process_index == pid for d in self.mesh.devices[r].flat):
                mine.update(range(r * cpb, (r + 1) * cpb))
        return sorted(mine)

    def _assert_cells_process_aligned(self) -> None:
        """Filesystem cell stores are process-private: every mesh cell-row
        must belong to exactly one process, else two hosts would feed the
        same cell from different stores (disjointness unguaranteed)."""
        for r in range(self.mesh.devices.shape[0]):
            owners = {d.process_index for d in self.mesh.devices[r].flat}
            assert len(owners) == 1, (
                f"mesh cell-row {r} spans processes {sorted(owners)}: "
                f"filesystem cell stores need the 'cell' axis aligned to "
                f"process boundaries (use dataset_type=memory, or choose "
                f"cell_axis a multiple of the process count)"
            )

    def _global_stream_states(
        self, states: List[Optional[Dict[str, int]]]
    ) -> List[Dict[str, int]]:
        """All-gather per-cell stream positions across processes.

        With owned-cells streams each process only knows its own cells'
        positions; the master writes EVERY cell's checkpoint, so the owned
        entries are allgathered (3 ints per cell — negligible). Collective:
        every process must call (both _save_cell_checkpoints call sites are
        process-synchronous)."""
        if all(s is not None for s in states):
            return states  # single-process / all-owned
        from jax.experimental import multihost_utils

        arr = np.full((self.num_cells, 3), 0, np.int64)
        for c, s in enumerate(states):
            if s is not None:
                arr[c] = [1, s["epoch"], s["batch_index"]]
        g = np.asarray(multihost_utils.process_allgather(arr))
        g = g.reshape(-1, self.num_cells, 3)  # (P, cells, [owned,e,b])
        out: List[Dict[str, int]] = []
        for c in range(self.num_cells):
            rows = g[g[:, c, 0] == 1, c]
            assert rows.shape[0] > 0, f"no process owns cell {c}'s stream"
            out.append(
                {"epoch": int(rows[0][1]), "batch_index": int(rows[0][2])}
            )
        return out

    # -------------------------------------------------------------- validation

    def _gather_cell_state(self, state: TrainState, cell: int) -> TrainState:
        """One cell's slice of the cell-sharded stacked TrainState, as host
        arrays on EVERY process.

        With the 'cell' mesh axis spanning hosts the stacked state is not
        host-addressable (device_get raises), so a jitted dynamic slice
        with fully-replicated out_shardings all-gathers just that cell's
        leaves (~MBs) to every host — the collective therefore runs on all
        processes, callers must too (same order, same cells)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        take = getattr(self, "_take_cell_fn", None)
        if take is None:
            take = jax.jit(
                lambda s, c: jax.tree.map(lambda x: x[c], s),
                out_shardings=NamedSharding(self.mesh, P()),
            )
            self._take_cell_fn = take
        return jax.device_get(take(state, np.int32(cell)))

    def _gather_cell_params(self, state: TrainState, cell: int):
        """Like `_gather_cell_state` but fg/bg params only — validation
        never reads the Adam moments, and gathering them would ~3x the
        cross-host traffic of every per-cell validation pass."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        take = getattr(self, "_take_cell_params_fn", None)
        if take is None:
            take = jax.jit(
                lambda fg, bg, c: jax.tree.map(lambda x: x[c], (fg, bg)),
                out_shardings=NamedSharding(self.mesh, P()),
            )
            self._take_cell_params_fn = take
        return jax.device_get(
            take(state.fg_params, state.bg_params, np.int32(cell))
        )

    def _run_cell_validation(self, state: TrainState, train_index: int) -> None:
        """Per-submodule validation at --val_interval, matching what each of
        the reference's independent jobs does (`runner.py:285-290`): every
        cell's model renders the val images alone; metrics and panels log
        under val/cell{i}/...

        Multi-process: each cell's params are all-gathered to every host
        (`_gather_cell_params`) and the normal distributed validation
        protocol — images strided over processes, count-aware allgather
        averaging — runs per cell, every process participating."""
        if jax.process_count() > 1:
            for cell in range(self.num_cells):
                fg_p, bg_p = self._gather_cell_params(state, cell)
                cell_state = state.replace(fg_params=fg_p, bg_params=bg_p)
                self._run_validation(
                    cell_state, train_index, key_prefix=f"val/cell{cell}"
                )
            return
        # Only the model weights are needed — not the stacked Adam moments.
        fg_host, bg_host = jax.device_get((state.fg_params, state.bg_params))
        for cell in range(self.num_cells):
            take = lambda t: (
                None if t is None
                else jax.tree.map(lambda x: np.asarray(x)[cell], t)
            )
            cell_state = state.replace(
                fg_params=take(fg_host), bg_params=take(bg_host)
            )
            self._run_validation(
                cell_state, train_index, key_prefix=f"val/cell{cell}"
            )

    # ------------------------------------------------------------- checkpoints

    def _save_cell_checkpoints(
        self,
        state: TrainState,
        train_index: int,
        stream_states: List[Dict[str, int]],
    ) -> None:
        """K per-cell checkpoints in Runner's format at the merge layout.

        Call from ALL processes: multi-process gathers each cell's slice
        through a collective (`_gather_cell_state`); only the master
        writes files."""
        multi = jax.process_count() > 1
        host = None if multi else jax.device_get(state)
        for cell in range(self.num_cells):
            if multi:
                cell_state = self._gather_cell_state(state, cell)
            else:
                cell_state = jax.tree.map(lambda x: np.asarray(x)[cell], host)
            if not self.is_master:
                continue
            aux = {
                "iteration": train_index,
                "dataset_state": stream_states[cell],
                "np_rng_state": self.np_rng.bit_generator.state,
                "cell_index": cell,
                "num_cells": self.num_cells,
                "exp_prefix": self.exp_prefix,
            }
            model_dir = self.cell_paths[cell] / "models"
            model_dir.mkdir(parents=True, exist_ok=True)
            ckpt_io.save_checkpoint(
                model_dir / f"{train_index}.ckpt", cell_state, aux
            )

    def _restore_cells(self, ckpt_path: str, optimizer):
        """Restack K per-cell checkpoints given ANY one of them (siblings are
        derived from the exp_prefix recorded in the aux)."""
        ckpt_path = Path(ckpt_path)
        aux0 = ckpt_io.load_checkpoint_aux(ckpt_path)
        assert aux0.get("num_cells") == self.num_cells, (
            f"checkpoint is for {aux0.get('num_cells')} cells, "
            f"this run has {self.num_cells}"
        )
        prefix = aux0["exp_prefix"]
        version = ckpt_path.parent.parent.name
        iteration = int(aux0["iteration"])

        template = make_train_state(self.fg, self.bg, optimizer, self.init_key)
        per_cell, stream_states = [], []
        for cell in range(self.num_cells):
            path = (
                Path(f"{prefix}{cell}") / version / "models" / ckpt_path.name
            )
            cell_state, aux = ckpt_io.load_checkpoint(path, template)
            assert aux["cell_index"] == cell, (path, aux["cell_index"])
            per_cell.append(cell_state)
            stream_states.append(aux["dataset_state"])
        _, np_rng = ckpt_io.rng_state_from_aux(aux0)
        if np_rng is not None:
            self.np_rng = np_rng
        # Dummy padding cells resume as fresh template inits — they carry
        # no state worth checkpointing (never saved, never merged).
        per_cell.extend(
            [template] * (self.padded_cells - self.num_cells)
        )
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *per_cell)
        return stacked, iteration, stream_states

    # ------------------------------------------------------------------ setup

    def _setup_cell_experiment_dirs(self) -> None:
        if self.is_master:
            for cell, cell_path in enumerate(self.cell_paths):
                cell_path.mkdir(parents=True, exist_ok=True)
                with (cell_path / "hparams.txt").open("w") as f:
                    for key, val in vars(self.hparams).items():
                        f.write(f"{key}: {val}\n")
                with (cell_path / "command.txt").open("w") as f:
                    f.write(" ".join(sys.argv) + "\n")
                with (cell_path / "image_indices.txt").open("w") as f:
                    for item in self.cell_items[cell]:
                        f.write(f"{item.image_index},{item.image_path.name}\n")
        self.writer = (
            MetricsWriter(self.cell_paths[0] / "tb")
            if self.is_master else None
        )
