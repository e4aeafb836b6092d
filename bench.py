"""Single-chip training-throughput benchmark (hang-proof).

Measures train rays/sec/chip on the paper-parity Mega-NeRF submodule config
(batch 1024 rays, 256 coarse + 512 fine samples, 8x256 fg MLP + 8x256
NeRF++ bg MLP, 48-dim appearance embeddings, bf16 compute) — the hot loop of
reference `runner.py:238-277`.

Baseline: the reference trains 500k iterations of 1024 rays in ~1 day on
8 GPUs (BASELINE.md) -> ~5.9k rays/s for 8 GPUs ~= 740 rays/s per GPU.
`vs_baseline` is our per-chip rays/s over that per-GPU figure.

Always prints ONE final JSON line: {"metric", "value", "unit",
"vs_baseline", "path"} — even when the TPU worker is wedged or a compile
hangs. Structure (the round-2 bench timed out because the fused-Pallas
train-step compile can hang on some libtpu builds, so every device-touching
stage runs in its own watchdogged subprocess):

  1. health probe: chained matmuls, 100 s budget, retried (the relay has
     transient stalls that clear in minutes). All attempts failing ->
     report path "tpu-unavailable" with value 0 rather than hanging the
     driver.
  2+3. XLA-path bench (use_pallas=False), prime-then-measure: a prime
     child compiles + runs ONE step under this invocation's fresh
     AXON_CASSETTE_SALT, then the timed child runs under the SAME salt —
     targeting the exact compile-cache entry the prime just wrote, so the
     timed stage should never meet a cold or poisoned cache. (The round-3
     design primed under a salt but timed UNSALTED, hoping the salted
     compile healed the unsalted entry — measured NOT reliable: in a
     round-4 validation run the prime passed in 143 s and the unsalted
     pallas stage still timed out.) If the prime itself times out, the
     timed stage falls back to the unsalted key (the salted entry is now
     the poisoned one). Caveat, measured on a degraded relay: a same-salt
     timed stage was observed to run fresh-compile-slow despite its prime
     passing — the remote cache hit is NOT guaranteed cross-process, so
     every timed budget is sized for a full fresh compile and the retry
     below stays load-bearing.
  4+5. Pallas-path bench (use_pallas="auto", the default train path),
     same prime-then-measure under the shared salt. Tried last because
     killing a hung Mosaic compile can wedge the worker — by then the
     XLA number is already in hand. Reported if faster. On a timeout it
     still retries ONCE with a fresh salt (the round-3 heal path).

Child invocations (`--_child ...`) print `BENCH_RESULT {json}` on success;
the parent never imports jax.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REFERENCE_RAYS_PER_SEC_PER_GPU = 740.0


def _env_flag(name: str) -> bool:
    """A/B env flag, parsed defensively ("1"/"true"/"yes" = on).

    Any other value (including garbage) is OFF — the driver's official
    bench must measure the proven default path unless explicitly flagged."""
    return os.environ.get(name, "").strip().lower() in ("1", "true", "yes")


def _grouped_cdf_flag() -> bool:
    return _env_flag("MNTPU_TRAIN_GROUPED_CDF")


def _grouped_merge_flag() -> bool:
    return _env_flag("MNTPU_TRAIN_GROUPED_MERGE")

HEALTH_TIMEOUT_S = 100  # cold relay init + first compile measured 71 s
HEALTH_RETRIES = 3  # transient relay stalls: a probe that timed out at
                    # 120 s passed in 1.8 s two minutes later (observed)
HEALTH_RETRY_SLEEP_S = 25
# Timeouts sized off the round-4 validation run on a DEGRADED relay (the
# worst observed): salted fresh XLA compile >220 s, salted fresh Mosaic
# compile 101-140 s, and a same-salt timed stage that still took >160 s
# even though its prime had just written the cache entry — so each timed
# budget must cover a full fresh compile, not just a cache hit.
XLA_TIMEOUT_S = 420
PALLAS_TIMEOUT_S = 420  # relay-degraded evenings: a cache-HIT
#   stage measured 149 s (xla) while the same child took <60 s
#   hours earlier; 220 s produced false 'xla' fallbacks
PRIME_TIMEOUT_S = 420
RESULT_TAG = "BENCH_RESULT "


# ---------------------------------------------------------------------------
# Child: runs in its own process so the parent can kill a hung compile.
# ---------------------------------------------------------------------------

def _child_health() -> None:
    """Chained matmuls: proves the worker compiles AND executes.

    Chaining (step N consumes step N-1's output) matters on relayed
    backends where unchained dispatch timings measure nothing.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.float32)

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x) / 256.0

    for _ in range(4):
        x = f(x)
    jax.block_until_ready(x)
    assert bool(jnp.isfinite(x).all())
    print(RESULT_TAG + json.dumps({"ok": True, "backend": jax.default_backend()}))


def _make_bench_setup(batch_size: int, use_pallas, layer_dim: int = 256,
                      coarse_samples: int = 256, fine_samples: int = 512,
                      with_bg: bool = True, remat: bool = False):
    """Build (step_fn, state, batch) for the paper-parity train config.

    The non-default parameters exist for scripts/train_width_bench.py's
    model-family sweeps; the driver's bench always runs the defaults."""
    from argparse import Namespace

    import jax
    import jax.numpy as jnp

    from mega_nerf_tpu.models import make_bg_nerf, make_nerf
    from mega_nerf_tpu.parallel.train_step import (
        make_optimizer,
        make_train_state,
        make_train_step,
    )
    from mega_nerf_tpu.render.rendering import RenderSettings

    hp = Namespace(
        pos_xyz_dim=12, pos_dir_dim=4, layers=8, skip_layers=[4],
        layer_dim=layer_dim, bg_layer_dim=layer_dim, appearance_dim=48,
        affine_appearance=False, use_cascade=False, sh_deg=None,
        shifted_softplus=True, compute_dtype="bfloat16",
    )
    settings = RenderSettings(
        coarse_samples=coarse_samples, fine_samples=fine_samples,
        use_pallas=use_pallas, remat=remat,
        # A/B hooks for the train-side grouped patterns (off by default;
        # see RenderSettings.train_grouped_cdf / train_grouped_merge).
        train_grouped_cdf=_grouped_cdf_flag(),
        train_grouped_merge=_grouped_merge_flag(),
    )

    fg = make_nerf(hp, appearance_count=512)
    bg = make_bg_nerf(hp, appearance_count=512) if with_bg else None
    optimizer = make_optimizer(5e-4, 0.1, 500_000)
    state = make_train_state(fg, bg, optimizer, jax.random.PRNGKey(0))

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    o = jax.random.normal(k1, (batch_size, 3)) * 0.1
    d = jax.random.normal(k2, (batch_size, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays": jnp.concatenate(
            [o, d, jnp.full((batch_size, 1), 0.05),
             jnp.full((batch_size, 1), 1e5)], axis=-1,
        ),
        "rgbs": jnp.abs(jnp.sin(o * 7.0)),
        "img_indices": jnp.zeros(batch_size, jnp.int32),
    }

    step = jax.jit(
        make_train_step(
            fg, bg, settings, optimizer,
            sphere_center=jnp.zeros(3), sphere_radius=jnp.ones(3),
            use_appearance=True,
        ),
        donate_argnums=(0,),
    )
    return step, state, batch


def run_bench_steps(batch_size: int = 1024, n_steps: int = 30,
                    use_pallas="auto", warmup: int = 3, **setup_kw) -> float:
    """Compile + run the donated train step; return measured rays/sec.

    Timing is trustworthy over the relay because the donated state chains
    every step on the previous one (see .claude/skills/verify/SKILL.md).
    """
    step, state, batch = _make_bench_setup(batch_size, use_pallas, **setup_kw)
    for _ in range(warmup):
        state, metrics = step(state, batch)
    if warmup:
        # Force a SCALAR READBACK, not block_until_ready: on the relayed
        # backend block_until_ready on the final chained metrics can return
        # without draining the queue for some programs (observed: 12 chained
        # 8x2048 train steps "measured" in 2.9 ms where the scalar readback
        # took 45 s). float() cannot lie — the value must exist.
        assert float(metrics["loss"]) == float(metrics["loss"])  # drain

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])  # drain before stopping the clock
    dt = time.perf_counter() - t0
    assert loss == loss, "non-finite loss in bench step"
    return n_steps * batch_size / dt


def _child_prime(use_pallas) -> None:
    """Compile + execute ONE train step (cache priming).

    Run by the parent under this invocation's AXON_CASSETTE_SALT before
    the matching timed stage, which runs under the SAME salt and so hits
    the exact compile-cache entry written here. A fresh salt guarantees
    the entry cannot have been poisoned by an earlier killed compile."""
    rays_per_sec = run_bench_steps(n_steps=1, warmup=0, use_pallas=use_pallas)
    print(RESULT_TAG + json.dumps({"primed": True,
                                   "rays_per_sec": round(rays_per_sec, 1)}))


def _child_bench(use_pallas) -> None:
    rays_per_sec = run_bench_steps(use_pallas=use_pallas)
    # Surface the A/B flag state so a flagged (non-default) run is
    # identifiable in the banked result, never silently mistaken for the
    # proven default path.
    print(RESULT_TAG + json.dumps({
        "rays_per_sec": round(rays_per_sec, 1),
        "train_grouped_cdf": _grouped_cdf_flag(),
        "train_grouped_merge": _grouped_merge_flag(),
    }))


# ---------------------------------------------------------------------------
# Parent: watchdogged orchestration, no jax import.
# ---------------------------------------------------------------------------

def _run_child(mode: str, timeout_s: int, extra_env: dict | None = None):
    """Run `python bench.py --_child <mode>` under a watchdog.

    Returns (parsed result dict | None, note str). Kills the whole child
    process group on timeout so a hung Mosaic compile can't outlive us.
    """
    import signal

    cmd = [sys.executable, os.path.abspath(__file__), "--_child", mode]
    env = None
    if extra_env:
        env = dict(os.environ)
        env.update(extra_env)
    t0 = time.perf_counter()
    # Popen + killpg, NOT subprocess.run: run()'s timeout path kills only
    # the immediate child and then blocks reading the pipe — a jax/libtpu
    # helper that inherited stdout would hang the parent forever, exactly
    # the driver hang this file exists to prevent.
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True, env=env,
    )
    try:
        out_b, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        try:
            proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            pass
        return None, f"{mode}: timed out after {timeout_s}s"
    out = out_b.decode("utf-8", "replace")
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        tail = " | ".join(out.strip().splitlines()[-3:])
        return None, f"{mode}: rc={proc.returncode} ({tail})"
    for line in reversed(out.splitlines()):
        if line.startswith(RESULT_TAG):
            return json.loads(line[len(RESULT_TAG):]), f"{mode}: ok in {dt:.0f}s"
    return None, f"{mode}: no result line"


def _emit(value: float, path: str) -> None:
    # A flagged run measures an experimental train path — tag it so the
    # banked number is never mistaken for the proven default.
    if _grouped_cdf_flag():
        path = path + "+grouped_cdf"
    if _grouped_merge_flag():
        path = path + "+grouped_merge"
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / REFERENCE_RAYS_PER_SEC_PER_GPU, 3),
        "path": path,
    }))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--_child",
                        choices=["health", "prime_xla", "prime_pallas",
                                 "xla", "pallas"])
    args = parser.parse_args()

    if args._child == "health":
        _child_health()
        return
    if args._child == "prime_xla":
        _child_prime(use_pallas=False)
        return
    if args._child == "prime_pallas":
        _child_prime(use_pallas="auto")
        return
    if args._child == "xla":
        _child_bench(use_pallas=False)
        return
    if args._child == "pallas":
        _child_bench(use_pallas="auto")
        return

    health = None
    for attempt in range(HEALTH_RETRIES):
        health, note = _run_child("health", HEALTH_TIMEOUT_S)
        print(f"[bench] {note}", flush=True)
        if health is not None:
            break
        if attempt + 1 < HEALTH_RETRIES:
            time.sleep(HEALTH_RETRY_SLEEP_S)
    if health is None:
        # Worker wedged or backend broken: report honestly instead of
        # hanging until the driver's timeout.
        _emit(0.0, "tpu-unavailable")
        return

    # Prime-then-measure under ONE shared fresh salt: each timed stage
    # runs under the same cassette salt its prime child compiled under,
    # so it hits the exact (guaranteed-unpoisoned) cache entry the prime
    # wrote. A fresh salt is used per invocation so an earlier killed
    # compile can never have poisoned it. If a PRIME times out, its own
    # salted entry is now the suspect one — the timed stage then falls
    # back to the unsalted key (the pre-round-4 behavior).
    salt = f"bench-{int(time.time())}"
    salt_env = {"AXON_CASSETTE_SALT": salt}

    def primed_stage(name: str, timeout_s: int):
        prime, note = _run_child(f"prime_{name}", PRIME_TIMEOUT_S,
                                 extra_env=salt_env)
        print(f"[bench] {note} (salt={salt})", flush=True)
        env = salt_env if prime is not None else None
        # Relay stalls are transient (observed: a timed stage dead at
        # 420 s minutes after its own prime passed in 149 s, and a
        # health probe passing in 32 s right after a 100 s timeout) —
        # one plain retry recovers them; cache poisoning gets its own
        # salted retry at the call site.
        for attempt in range(2):
            result, note = _run_child(name, timeout_s, extra_env=env)
            print(f"[bench] {note}", flush=True)
            if result is not None or "timed out" not in note:
                break
        return result, note

    best, best_path = 0.0, "failed"
    xla, _ = primed_stage("xla", XLA_TIMEOUT_S)
    if xla is not None:
        best, best_path = xla["rays_per_sec"], "xla"

    pallas, note = primed_stage("pallas", PALLAS_TIMEOUT_S)
    if pallas is None and "timed out" in note:
        # Last-ditch heal (round-3 episode): a fresh salt forces a fresh
        # compile-cache entry — observed to compile in ~90-190 s where the
        # poisoned entry hangs indefinitely.
        heal = f"bench-heal-{int(time.time())}"
        pallas, note = _run_child(
            "pallas", PALLAS_TIMEOUT_S + 60,
            extra_env={"AXON_CASSETTE_SALT": heal},
        )
        print(f"[bench] salted retry ({heal}): {note}", flush=True)
    if pallas is not None and pallas["rays_per_sec"] > best:
        best, best_path = pallas["rays_per_sec"], "pallas-fused"

    _emit(best, best_path)


if __name__ == "__main__":
    main()
