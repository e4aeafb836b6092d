"""Worker for the 2-process jax.distributed test (tests/test_multiprocess.py).

Each process initializes a 2-process CPU backend (4 virtual devices each ->
8-device global mesh), then drives the REAL multi-host paths:

1. Runner.train on a synthetic scene: global-batch assembly via
   jax.make_array_from_process_local_data, per-process disjoint batch
   slices, SPMD gradient all-reduce, strided distributed validation with
   allgather metric aggregation — the reference's DDP + DistributedSampler +
   rank-sharded eval capabilities (`runner.py:54-57,228-233,395-403`).
2. FilesystemDataset in both multi-process modes: per-host chunk streams
   (stamped row counts) and shared-chunk sliced shuffles, asserting the
   processes' slices are disjoint and step-aligned.

Writes results (param hash, metrics) to {out}/result_{p}.json for the
parent test to cross-check.

Usage: multiprocess_worker.py <process_id> <num_processes> <port> <workdir>
"""

import json
import sys
from pathlib import Path

process_id, num_processes, port, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), Path(sys.argv[4])
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=num_processes,
    process_id=process_id,
)
assert jax.process_count() == num_processes
assert jax.device_count() == 4 * num_processes

import hashlib

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mega_nerf_tpu.runtime.runner import Runner
from tests.synthetic import make_synthetic_dataset, tiny_train_hparams

result = {}

# --- 1. the dataset is deterministic: each process builds its own copy ---
ds = make_synthetic_dataset(
    workdir / f"ds_{process_id}", n_train=5, n_val=1, hw=(20, 20)
)

# --- 2. distributed Runner.train + final distributed validation ---
hp = tiny_train_hparams(
    ds, workdir / f"exp_{process_id}",
    train_iterations=20, ckpt_interval=20, batch_size=128,
)
runner = Runner(hp)
runner.train()
params_bytes = b"".join(
    np.ascontiguousarray(np.asarray(x)).tobytes()
    for x in jax.tree.leaves(jax.device_get(runner.final_state.fg_params))
)
result["param_hash"] = hashlib.sha256(params_bytes).hexdigest()
metrics_txt = workdir / f"exp_{process_id}" / "0" / "metrics.txt"
result["final_metrics_exists"] = metrics_txt.exists() if process_id == 0 else None

# --- 3. FilesystemDataset multi-process modes ---
from jax.experimental import multihost_utils

from mega_nerf_tpu.data.filesystem_dataset import FilesystemDataset


def stream_check(chunk_dir: Path, tag: str) -> None:
    fs = FilesystemDataset(
        runner.train_items, runner.near, runner.far,
        runner.ray_altitude_range, hp.center_pixels,
        [chunk_dir], num_chunks=4, scale_factor=1,
        disk_flush_size=10**7, rng=np.random.default_rng(0),
    )
    counts, overlaps = [], []
    for epoch in range(3):
        rng = np.random.default_rng((0, epoch))
        n_local, ids = 0, []
        for batch in fs.batches(64, rng):
            assert batch["rays"].shape[0] == 64 // num_processes
            n_local += 1
            # Identify rows by ray bits (unique per pixel in this scene).
            ids.append(
                np.ascontiguousarray(batch["rays"]).view(np.uint8).reshape(
                    batch["rays"].shape[0], -1
                )
            )
        ids = np.concatenate(ids) if ids else np.zeros((0, 32), np.uint8)
        id_hashes = np.asarray(
            [int(hashlib.sha256(r.tobytes()).hexdigest()[:15], 16) for r in ids],
            np.uint64,
        )
        # Pad to a fixed width for allgather (counts must match anyway).
        all_counts = np.asarray(
            multihost_utils.process_allgather(np.asarray([n_local]))
        ).reshape(-1)
        assert (all_counts == all_counts[0]).all(), (
            f"{tag}: processes not step-aligned: {all_counts.tolist()}"
        )
        gathered = np.asarray(
            multihost_utils.process_allgather(id_hashes)
        ).reshape(-1)
        unique = len(set(gathered.tolist()))
        counts.append(int(all_counts[0]))
        overlaps.append(len(gathered) - unique)
    result[f"{tag}_batches_per_epoch"] = counts
    result[f"{tag}_overlap_rows"] = overlaps
    assert all(o == 0 for o in overlaps), f"{tag}: processes shared rows"
    assert all(c > 0 for c in counts), f"{tag}: empty epochs"


# Per-host chunk streams (our stamped stores).
stream_check(workdir / "chunks_shard", "chunk_stream")

# Shared-chunk sliced-shuffle fallback (reference-written stores have no
# chunk_rows stamp): simulate by stripping the field.
from mega_nerf_tpu.data.torch_io import load_pt, save_pt

if process_id == 0:
    import shutil

    src = workdir / "chunks_shard"
    dst = workdir / "chunks_legacy"
    shutil.copytree(src, dst)
    stamp = load_pt(dst / "metadata.pt")
    del stamp["chunk_rows"]
    save_pt(stamp, dst / "metadata.pt")
multihost_utils.sync_global_devices("legacy_store_ready")
stream_check(workdir / "chunks_legacy", "shared_chunk")

# --- 4. cell-spanning mesh placement (full-value contract) ---
# mesh cell=2 x data=4 on 2 processes of 4 devices: the 'cell' axis spans
# processes. Every process passes the FULL cell-stacked array;
# global_shape == local shape tells jax to slice (without it, the global
# cell dimension would be inflated to 4 — the v4-32 cell=8 x data=4 bug).
import jax.numpy as jnp

from mega_nerf_tpu.parallel.mesh import make_mesh, shard_batch, shard_over_cells

cell_mesh = make_mesh(cell_axis=2)
stack = np.arange(2 * 6, dtype=np.float32).reshape(2, 6) + 100.0
placed = shard_over_cells(cell_mesh, stack)
assert placed.shape == (2, 6), placed.shape
for shard in placed.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data), stack[shard.index])
assert float(jax.jit(jnp.sum)(placed)) == float(stack.sum())

cbatch = {"rays": np.arange(2 * 8 * 3, dtype=np.float32).reshape(2, 8, 3)}
pb = shard_batch(cell_mesh, cbatch, with_cell_axis=True)
assert pb["rays"].shape == (2, 8, 3), pb["rays"].shape
for shard in pb["rays"].addressable_shards:
    np.testing.assert_array_equal(
        np.asarray(shard.data), cbatch["rays"][shard.index]
    )
assert float(jax.jit(jnp.sum)(pb["rays"])) == float(cbatch["rays"].sum())
result["cell_mesh_ok"] = True

# --- 5. multi-process CellRunner: the 'cell' axis spans processes ---
# mesh cell=2 x data=4 over 2 processes of 4 devices: process 0 owns cell
# 0's parameters, process 1 owns cell 1's. Drives the cell-sharded train
# step, the collective per-cell checkpoint gather, and the multi-process
# per-cell validation protocol.
from argparse import Namespace as _NS

import scripts.create_cluster_masks as _ccm
from mega_nerf_tpu.parallel.train_step import make_optimizer, make_train_state
from mega_nerf_tpu.runtime import checkpoints as ckpt_io
from mega_nerf_tpu.runtime.cell_runner import CellRunner

# create_cluster_masks is itself multi-process (images stride
# process_index::process_count, internal sync on the shared dirs) — both
# processes run it against the SHARED output dir.
masks = workdir / "masks"
_ccm.main(_NS(
    dataset_path=str(ds), segmentation_path=None, output=str(masks),
    grid_dim=[2, 1], ray_samples=64, ray_chunk_size=48 * 1024,
    resume=False, ray_altitude_range=[-10.0, 10.0], near=0.5, far=3.5,
    center_pixels=True, cluster_2d=False, boundary_margin=1.15,
))
multihost_utils.sync_global_devices("masks_ready")

CELL_ITERS = 12
cell_hp = tiny_train_hparams(
    ds, workdir / "cellexp" / "sub",
    cluster_mask_path=str(masks),
    train_iterations=CELL_ITERS, ckpt_interval=CELL_ITERS,
    val_interval=6,  # mid-train: exercises multi-process per-cell validation
    ray_altitude_range=[-10.0, 10.0],
    cell_axis=2, batch_size=64,
)

val_calls = []
_orig_val = CellRunner._run_validation


def _recording_val(self, state, train_index, key_prefix="val"):
    metrics = _orig_val(self, state, train_index, key_prefix=key_prefix)
    val_calls.append(
        {"prefix": key_prefix, "psnr": metrics.get(f"{key_prefix}/psnr")}
    )
    return metrics


CellRunner._run_validation = _recording_val
cell_runner = CellRunner(cell_hp)
cell_runner.train()
CellRunner._run_validation = _orig_val

assert cell_runner.final_state is None  # not host-addressable multi-process
result["cell_val_calls"] = val_calls

# Both processes see the master-written per-cell checkpoints (shared fs).
multihost_utils.sync_global_devices("cell_ckpts_ready")
opt = make_optimizer(
    cell_hp.lr, cell_hp.lr_decay_factor, cell_hp.train_iterations
)
template = make_train_state(
    cell_runner.fg, cell_runner.bg, opt, jax.random.key(0)
)
cell_states = []
for cell in range(2):
    path = (
        workdir / "cellexp" / f"sub{cell}" / "0" / "models"
        / f"{CELL_ITERS}.ckpt"
    )
    assert path.exists(), path
    cell_state, aux = ckpt_io.load_checkpoint(path, template)
    assert aux["cell_index"] == cell and aux["num_cells"] == 2, aux
    cell_states.append(cell_state)


def _params_hash(tree):
    return hashlib.sha256(
        b"".join(
            np.ascontiguousarray(np.asarray(x)).tobytes()
            for x in jax.tree.leaves(tree)
        )
    ).hexdigest()


result["cell_param_hashes"] = [
    _params_hash(s.fg_params) for s in cell_states
]

with open(workdir / f"result_{process_id}.json", "w") as f:
    json.dump(result, f)
print(f"worker {process_id}: OK", flush=True)
