"""REAL 2-process distributed flythrough rendering with culling + occupancy.

Reference analogue: `scripts/render_images.py:80-90` — frames strided
`rank::world_size` with per-rank file writes and `--resume` re-validating
the last artifact. Here the culled + occupancy-bounded render path (exact
per-chunk submodule culling, render/cell_cull.py + near-mode tightened
bounds, render/ray_bounds.py) runs across two jax.distributed CPU
processes and must produce the same frames as one process.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _spawn(worker, workdir, port, extra=()):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port),
             str(workdir), *extra],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    return outs


def test_two_process_culled_occupancy_render(tmp_path):
    from PIL import Image

    from tests.multiprocess_render_worker import build_inputs, render_hparams

    workdir = tmp_path / "mpr"
    workdir.mkdir()
    build_inputs(workdir)

    # Single-process reference frames (same culled+bounded path, this
    # process's 8-device mesh).
    import scripts.render_images as ri

    ri.main(render_hparams(workdir, workdir / "frames_sp"))
    sp_frames = sorted((workdir / "frames_sp" / "rgbs").glob("*.jpg"))
    assert len(sp_frames) == 4

    # Two-process strided render into frames_mp.
    worker = Path(__file__).parent / "multiprocess_render_worker.py"
    port = 53800 + os.getpid() % 2000
    _spawn(worker, workdir, port)

    mp_rgb = sorted((workdir / "frames_mp" / "rgbs").glob("*.jpg"))
    assert [p.name for p in mp_rgb] == [p.name for p in sp_frames]
    for p_sp in sp_frames:
        a = np.asarray(Image.open(p_sp), np.int16)
        b = np.asarray(
            Image.open(workdir / "frames_mp" / "rgbs" / p_sp.name), np.int16
        )
        # Rendering is deterministic; only device-count batching noise
        # through the jpg codec is tolerated.
        assert np.abs(a - b).max() <= 2, p_sp.name
    # Every frame completed (the cell overlay is the last artifact).
    assert len(list((workdir / "frames_mp" / "cells").glob("*.jpg"))) == 4

    # --- resume: delete one frame's completion marker + rgb, re-run ---
    (workdir / "frames_mp" / "cells" / "000003.jpg").unlink()
    (workdir / "frames_mp" / "rgbs" / "000003.jpg").unlink()
    done_before = {
        p.name: p.stat().st_mtime
        for p in (workdir / "frames_mp" / "cells").glob("*.jpg")
    }
    outs = _spawn(worker, workdir, port + 7, extra=("--resume",))
    assert any("skipping" in o for o in outs)
    # The deleted frame is back and matches; the untouched ones were
    # skipped (mtime unchanged).
    b = np.asarray(
        Image.open(workdir / "frames_mp" / "rgbs" / "000003.jpg"), np.int16
    )
    a = np.asarray(Image.open(workdir / "frames_sp" / "rgbs" / "000003.jpg"),
                   np.int16)
    assert np.abs(a - b).max() <= 2
    for p in (workdir / "frames_mp" / "cells").glob("*.jpg"):
        if p.name != "000003.jpg":
            assert p.stat().st_mtime == done_before[p.name], p.name
