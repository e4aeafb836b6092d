"""Smoke tests for the driver contracts: `__graft_entry__.py` and `bench.py`.

The driver compile-checks `entry()` single-chip, executes
`dryrun_multichip(N)` on N virtual CPU devices, and runs `python bench.py`
on the real chip. A contract break in any of them costs a round's worth of
external evidence, so each is exercised here on the CPU backend (the
conftest's 8-device virtual mesh) before the driver ever sees it.
"""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import __graft_entry__  # noqa: E402
import bench  # noqa: E402


def test_entry_compiles_and_runs():
    fn, example_args = __graft_entry__.entry()
    jitted = jax.jit(fn)
    # Compile at the driver's exact shapes (the driver's check is
    # compile-only; CPU execution at 128 rays x 768 samples is also cheap
    # enough to run for value-level sanity).
    compiled = jitted.lower(*example_args).compile()
    out = compiled(*example_args)
    out = np.asarray(out)
    assert out.shape == (example_args[2].shape[0], 3)
    assert np.isfinite(out).all()
    assert (out >= 0.0).all() and (out <= 1.0).all()  # sigmoid rgb


def test_dryrun_multichip_runs_on_virtual_mesh():
    # The conftest already provides 8 virtual CPU devices, matching the
    # driver's xla_force_host_platform_device_count setup.
    __graft_entry__.dryrun_multichip(8)


def test_bench_step_shape_runs_tiny():
    # One bench-shaped train step (same builder the TPU children call) at a
    # tiny batch on the XLA path; proves bench.py's model/optimizer/step
    # wiring stays importable and executable.
    rays_per_sec = bench.run_bench_steps(
        batch_size=4, n_steps=1, use_pallas=False, warmup=1
    )
    assert rays_per_sec > 0.0


def test_bench_parent_emits_json_line(capsys):
    # The driver contract: the LAST stdout line is one JSON object with
    # these exact keys, no matter what happened before it.
    bench._emit(1234.5, "xla")
    line = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    parsed = json.loads(line)
    assert parsed["metric"] == "train_rays_per_sec_per_chip"
    assert parsed["unit"] == "rays/s"
    assert parsed["value"] == 1234.5
    assert parsed["vs_baseline"] == round(1234.5 / 740.0, 3)


def test_bench_parent_health_retries(capsys, monkeypatch):
    # A transient relay stall (observed: a probe that timed out at 120 s
    # passed 2 min later) must not produce "tpu-unavailable": the health
    # stage retries before giving up, and a late success proceeds to the
    # prime-then-measure bench stages.
    monkeypatch.setattr(bench, "HEALTH_RETRY_SLEEP_S", 0)
    calls = []  # (mode, salt-or-None) in invocation order

    def fake_run_child(mode, timeout_s, extra_env=None):
        salt = (extra_env or {}).get("AXON_CASSETTE_SALT")
        calls.append((mode, salt))
        if mode == "health":
            # first attempt stalls, second succeeds
            if sum(1 for m, _ in calls if m == "health") == 1:
                return None, "health: timed out after 60s"
            return {"ok": True}, "health: ok in 2s"
        if mode in ("prime_xla", "prime_pallas"):
            return {"primed": True}, f"{mode}: ok"
        if mode == "xla":
            return {"rays_per_sec": 100.0}, "xla: ok"
        return None, "pallas: timed out after 160s"

    monkeypatch.setattr(bench, "_run_child", fake_run_child)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    parsed = json.loads(out[-1])
    modes = [m for m, _ in calls]
    assert modes.count("health") == 2
    assert parsed["value"] == 100.0 and parsed["path"] == "xla"
    # Prime-then-measure: every prime and its timed stage share ONE salt,
    # so the timed stage hits exactly the cache entry the prime wrote.
    salts = dict()
    for m, s in calls:
        salts.setdefault(m, []).append(s)
    shared = salts["prime_xla"][0]
    assert shared is not None
    assert salts["xla"] == [shared]
    assert salts["prime_pallas"] == [shared]
    # A pallas timeout triggers one PLAIN retry under the same salt
    # (transient relay stalls — round 5: a cache-hit stage dead at 420 s
    # minutes after its prime passed), then one retry under a FRESH salt
    # (the poisoned-compile-cache heal).
    assert modes.count("pallas") == 3
    assert salts["pallas"][0] == shared
    assert salts["pallas"][1] == shared
    assert salts["pallas"][2] is not None and salts["pallas"][2] != shared


def test_bench_prime_timeout_falls_back_unsalted(capsys, monkeypatch):
    # If a PRIME times out, its salted cache entry is now the suspect one:
    # the timed stage must fall back to the unsalted key rather than walk
    # into the entry the killed prime just poisoned.
    monkeypatch.setattr(bench, "HEALTH_RETRY_SLEEP_S", 0)
    calls = []

    def fake_run_child(mode, timeout_s, extra_env=None):
        salt = (extra_env or {}).get("AXON_CASSETTE_SALT")
        calls.append((mode, salt))
        if mode == "health":
            return {"ok": True}, "health: ok in 2s"
        if mode in ("prime_xla", "prime_pallas"):
            return None, f"{mode}: timed out after 220s"
        if mode == "xla":
            return {"rays_per_sec": 100.0}, "xla: ok"
        return {"rays_per_sec": 200.0}, "pallas: ok"

    monkeypatch.setattr(bench, "_run_child", fake_run_child)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["value"] == 200.0 and parsed["path"] == "pallas-fused"
    timed = {m: s for m, s in calls if m in ("xla", "pallas")}
    assert timed == {"xla": None, "pallas": None}

    # All health attempts failing -> honest zero, no bench stages run.
    calls.clear()
    monkeypatch.setattr(
        bench, "_run_child",
        lambda mode, t, extra_env=None:
            (calls.append(mode), (None, f"{mode}: timeout"))[1],
    )
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    parsed = json.loads(out[-1])
    assert parsed["value"] == 0.0 and parsed["path"] == "tpu-unavailable"
    assert calls == ["health"] * bench.HEALTH_RETRIES
