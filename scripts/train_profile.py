"""Profile the paper-config train step and print the device-time breakdown.

Reuses bench.py's exact step (donated state, chained dispatches) so the
profile describes the same program the driver measures. Device timelines
from jax.profiler are trustworthy over the axon relay where wall-clocks
are not (verify skill). The Chrome-trace events are aggregated by op
name with light bucketing (Pallas custom calls vs named XLA fusions) so
the XLA tail — custom-VJP boundary pads, merge-payload copies, the
appearance broadcast (PERF.md round 3) — is attributable.

Usage: python scripts/train_profile.py [--steps 8] [--batch 1024]
       [--keep-trace DIR] [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def aggregate_trace(trace_dir: str, top: int):
    paths = glob.glob(
        str(Path(trace_dir) / "plugins" / "profile" / "*" / "*.trace.json.gz")
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device-track pids: process_name metadata containing "TPU" and a
    # "XLA Ops"/TensorFlow-op-level tid works across libtpu versions; we
    # take any pid whose name mentions TPU and exclude host threads.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "tpu" in name or "Device" in name
    }
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))  # microseconds
        if not name or dur <= 0:
            continue
        per_op[name] += dur
        total += dur
    rows = per_op.most_common(top)
    return rows, total, pid_names


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--xla", action="store_true",
                    help="force the XLA MLP path instead of pallas-auto")
    ap.add_argument("--keep-trace", type=str, default=None,
                    help="directory to keep the raw trace in (default: tmp)")
    args = ap.parse_args()

    import jax

    import bench

    step, state, batch = bench._make_bench_setup(
        args.batch, use_pallas=(False if args.xla else "auto")
    )
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step(state, batch)
    assert float(metrics["loss"]) == float(metrics["loss"])
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="train_prof_")
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        loss = float(metrics["loss"])  # scalar readback drains the queue
        wall = time.perf_counter() - t0
    assert loss == loss
    per_step_ms = wall / args.steps * 1e3
    print(f"wall {per_step_ms:.1f} ms/step "
          f"({args.batch / (wall / args.steps):.0f} rays/s)", flush=True)

    rows, total, _ = aggregate_trace(trace_dir, args.top)
    print(f"device total {total / 1e3 / args.steps:.1f} ms/step "
          f"(trace: {trace_dir})")
    print(f"{'ms/step':>9}  {'share':>6}  op")
    for name, dur in rows:
        print(f"{dur / 1e3 / args.steps:9.3f}  {dur / total:6.1%}  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
