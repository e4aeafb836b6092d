"""REAL 4-process distributed test: the mesh 'cell' axis spans four
jax.distributed CPU processes (2 virtual devices each -> cell=4 x data=2),
each process feeding its one owned cell from a process-private per-cell
FilesystemDataset chunk store, with mid-train per-cell validation,
checkpoint-time stream-state allgather, exact multi-host resume, and the
merge-from-per-cell-checkpoints handoff (`cell_runner.py` leaves
final_state None multi-process; the checkpoints ARE the handoff).

This is the flagship multi-host deployment shape — the reference's
equivalent is parscript fan-out of independent per-GPU jobs
(`/root/reference/parscripts/run_8.txt`), which it never tests.
See tests/multiprocess_worker4.py for what each process drives.
"""

import json
import os
import subprocess
import sys
from pathlib import Path


def test_four_process_cell_spanning(tmp_path):
    port = 55000 + os.getpid() % 2000
    workdir = tmp_path / "mp4"
    workdir.mkdir()
    worker = Path(__file__).parent / "multiprocess_worker4.py"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "4", str(port), str(workdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(4)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = []
    for i in range(4):
        with open(workdir / f"result_{i}.json") as f:
            results.append(json.load(f))

    # Ownership: each process owns exactly one cell; together all four.
    owned = [r["owned_cells"] for r in results]
    assert all(len(o) == 1 for o in owned), owned
    assert sorted(c for o in owned for c in o) == [0, 1, 2, 3]

    # Process-private chunk stores: each host wrote ONLY its cell's store.
    for r in results:
        assert r["local_store_cells"] == r["owned_cells"], r

    # Mid-train validation ran per cell on every process, same values
    # everywhere (count-aware allgather averaging).
    for r in results:
        prefixes = [c["prefix"] for c in r["val_calls_first"]]
        assert prefixes == [f"val/cell{i}" for i in range(4)], prefixes
        assert all(c["psnr"] is not None for c in r["val_calls_first"])
    assert all(
        r["val_calls_first"] == results[0]["val_calls_first"] for r in results
    )

    # Checkpoint stream states were allgathered: every cell's checkpoint
    # carries a real position, identical from every process's view.
    assert all(r["stream_states"] == results[0]["stream_states"] for r in results)

    # Exact resume produced byte-identical per-cell checkpoints regardless
    # of which process inspects them (shared fs), and the resume ran.
    assert all(r["resume_ok"] for r in results)
    assert all(
        r["resumed_ckpt_hashes"] == results[0]["resumed_ckpt_hashes"]
        for r in results
    )
    # Cells genuinely diverged (different data -> different weights).
    assert len(set(results[0]["resumed_ckpt_hashes"])) == 4

    # Master merged the per-cell checkpoints into a queryable container.
    assert results[0]["merged_exists"]
