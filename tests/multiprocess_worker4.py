"""Worker for the 4-process cell-spanning test (tests/test_multiprocess4.py).

4 jax.distributed CPU processes x 2 virtual devices = one 8-device global
mesh, cell=4 x data=2 — the 'cell' axis spans all four processes, each
owning exactly one cell. Drives the multi-host flagship deployment shape
end to end:

1. create_cluster_masks (2x2 grid) strided over 4 processes into a shared
   mask dir;
2. CellRunner with dataset_type="filesystem": each process materializes
   ONLY its owned cell's stream from its own process-PRIVATE per-cell
   parquet chunk store (`CellDataset(owned_cells=...)` /
   `FilesystemDataset(process_scope="private")`) — the per-host feeding
   the reference delegates to per-job --chunk_paths
   (`/root/reference/parscripts/run_8.txt`);
3. mid-train per-cell validation (params allgathered per cell, images
   strided over processes) and the checkpoint-time stream-state allgather;
4. exact resume: a second CellRunner restores all 4 cells from the
   per-cell checkpoints and trains 4 more steps;
5. merge_submodules consumes the per-cell checkpoints (the multi-process
   handoff — `cell_runner.py` leaves final_state None) and the master
   smoke-evals the merged container.

Usage: multiprocess_worker4.py <process_id> <num_processes> <port> <workdir>
"""

import json
import sys
from pathlib import Path

process_id, num_processes, port, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), Path(sys.argv[4])
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=num_processes,
    process_id=process_id,
)
assert jax.process_count() == num_processes
assert jax.device_count() == 2 * num_processes

import hashlib
from argparse import Namespace

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from jax.experimental import multihost_utils

import scripts.create_cluster_masks as ccm
from mega_nerf_tpu.runtime import checkpoints as ckpt_io
from mega_nerf_tpu.runtime.cell_runner import CellRunner
from tests.synthetic import make_synthetic_dataset, tiny_train_hparams

result = {}
NUM_CELLS = 4
ITERS = 12
RESUME_ITERS = 16

# Deterministic dataset: each process builds its own copy.
ds = make_synthetic_dataset(
    workdir / f"ds_{process_id}", n_train=5, n_val=1, hw=(20, 20)
)

# --- 1. masks: 2x2 grid, images strided over the 4 processes, shared dir ---
masks = workdir / "masks"
ccm.main(Namespace(
    dataset_path=str(ds), segmentation_path=None, output=str(masks),
    grid_dim=[2, 2], ray_samples=64, ray_chunk_size=48 * 1024,
    resume=False, ray_altitude_range=[-10.0, 10.0], near=0.5, far=3.5,
    center_pixels=True, cluster_2d=False, boundary_margin=1.15,
))
multihost_utils.sync_global_devices("masks_ready")

# --- 2. CellRunner over cell=4 x data=2, per-host per-cell chunk stores ---
# chunk_paths is per-host scratch in production; on this shared test fs a
# per-process dir models the same thing explicitly.
chunks = workdir / f"chunks_p{process_id}"


def cell_hparams(iters, **kw):
    return tiny_train_hparams(
        ds, workdir / "cellexp" / "sub",
        cluster_mask_path=str(masks),
        train_iterations=iters, ckpt_interval=ITERS,
        val_interval=6,  # mid-train multi-process per-cell validation
        ray_altitude_range=[-10.0, 10.0],
        cell_axis=NUM_CELLS, batch_size=64,
        dataset_type="filesystem",
        chunk_paths=[str(chunks)], num_chunks=2,
        **kw,
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
runner = CellRunner(cell_hparams(ITERS))
owned = runner._owned_cells()
result["owned_cells"] = owned
runner.train()
assert runner.final_state is None  # multi-process: checkpoints are the handoff
result["val_calls_first"] = list(val_calls)

# Only the owned cell's chunk store exists on this host.
existing_cells = sorted(
    int(p.name[len("cell"):]) for p in chunks.glob("cell*") if p.is_dir()
)
result["local_store_cells"] = existing_cells

# --- 3. every cell checkpoint carries an allgathered stream state ---
multihost_utils.sync_global_devices("cell_ckpts_ready")
stream_states = []
for cell in range(NUM_CELLS):
    path = (
        workdir / "cellexp" / f"sub{cell}" / "0" / "models" / f"{ITERS}.ckpt"
    )
    assert path.exists(), path
    aux = ckpt_io.load_checkpoint_aux(path)
    assert aux["cell_index"] == cell and aux["num_cells"] == NUM_CELLS, aux
    st = aux["dataset_state"]
    assert st is not None and "epoch" in st and "batch_index" in st, (cell, st)
    stream_states.append({k: int(v) for k, v in st.items()})
result["stream_states"] = stream_states

# --- 4. exact multi-host resume from the per-cell checkpoints ---
val_calls.clear()
hp2 = cell_hparams(RESUME_ITERS)
hp2.ckpt_path = str(
    workdir / "cellexp" / "sub0" / "0" / "models" / f"{ITERS}.ckpt"
)
runner2 = CellRunner(hp2)
runner2.train()
CellRunner._run_validation = _orig_val
result["resume_ok"] = True

multihost_utils.sync_global_devices("resume_done")

# The resumed run wrote {RESUME_ITERS}.ckpt for every cell in a NEW version.
resumed_hashes = []
for cell in range(NUM_CELLS):
    path = (
        workdir / "cellexp" / f"sub{cell}" / "1" / "models"
        / f"{RESUME_ITERS}.ckpt"
    )
    assert path.exists(), path
    aux = ckpt_io.load_checkpoint_aux(path)
    assert aux["iteration"] == RESUME_ITERS, aux
    resumed_hashes.append(
        hashlib.sha256(path.read_bytes()).hexdigest()
    )
result["resumed_ckpt_hashes"] = resumed_hashes

# --- 5. merge the per-cell checkpoints (the multi-process handoff) ---
if process_id == 0:
    import scripts.merge_submodules as ms

    mhp = tiny_train_hparams(
        ds, workdir / "unused",
        train_iterations=ITERS, ray_altitude_range=[-10.0, 10.0],
    )
    mhp.ckpt_prefix = str(workdir / "cellexp" / "sub")
    mhp.centroid_path = str(masks / "params.pt")
    mhp.output = str(workdir / "merged.ckpt")
    mhp.torchscript = False
    ms.main(mhp)
    result["merged_exists"] = (workdir / "merged.ckpt").exists()
multihost_utils.sync_global_devices("merge_done")

with open(workdir / f"result_{process_id}.json", "w") as f:
    json.dump(result, f)
print(f"worker {process_id}: OK", flush=True)
