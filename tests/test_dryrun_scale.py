"""dryrun_multichip at 16 and 32 virtual devices (mesh-shape generality).

The conftest's in-process mesh is fixed at 8 devices, so larger meshes run
in subprocesses with their own ``xla_force_host_platform_device_count``.
This pins that the cell-parallel train step (shard_map over cell x data,
stacked per-cell params, pmean over 'data') compiles and executes at the
mesh shapes a production pod slice would use — the driver only ever checks
one N, so a shape-dependent regression at 16/32 would otherwise ship.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize("n_devices", [16, 32])
def test_dryrun_multichip_scales(n_devices):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; "
         f"g.dryrun_multichip({n_devices})"],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip OK" in proc.stdout
    # 16 -> cell=8 x data=2, 32 -> cell=16 x data=2 (the n%2==0 branch).
    assert f"cell={n_devices // 2} x data=2" in proc.stdout
