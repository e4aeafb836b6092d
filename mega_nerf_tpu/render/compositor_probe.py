"""Runtime probe: may EVAL use the merge compositor on the serving compiler?

The sort-free coarse+fine merge (`ops.compositing.composite_weights_merge`)
is ~4.5x cheaper than the union fallback, but one deployed libtpu build
(Nov 12 2025, cl/831091709 — the build serving this terminal) crashes the
TPU worker outright when the merge's (N, Sa, Sb) middle-axis masked reduces
are composed with the Pallas eval kernels at image-chunk batch sizes. The
fault is context-dependent: the identical reduces pass standalone at the
same shapes, so only compiling the real COMPOSED eval graph can tell
whether the serving compiler is affected.

Policy implemented here (consulted once per process at first eval trace on
a TPU backend, `rendering._inference`):

1. `MEGA_NERF_TPU_EVAL_COMPOSITOR=merge_grouped|merge|union` overrides
   everything.
2. Non-TPU backends always get the merge (the fault is an XLA:TPU lowering
   bug; CPU/GPU lowerings are clean and the compositors are numerically
   identical — `tests/test_ops_compositing.py`).
3. Candidates are tried in `EVAL_PREFERENCE` order; the first whose
   COMPOSED eval graph the serving compiler can lower wins, union is the
   always-works fallback. Known-bad (compositor, build) pairs
   (`KNOWN_BAD_BUILDS`) are skipped without probing — probing them would
   crash the worker we are about to render on, and a wedged worker can
   take an hour to heal.
4. Anything else is probed ONCE per (compositor, compiler build): a
   guarded subprocess AOT-compiles the composed eval graph (Pallas eval
   kernels + the forced compositor at a 16384-ray eval chunk, paper-scale
   8x256 NeRF) with a wall-clock budget. Exit 0 + sentinel => usable;
   crash/timeout => next candidate. Verdicts are cached on disk keyed by
   the backend's `platform_version`.

The reference never needs this machinery: its CUDA path sorts and gathers
(`/root/reference/mega_nerf/rendering.py:336-350`); the compositor split is
a TPU-native concern introduced by the sort-free redesign.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path
from typing import Callable, Optional

ENV_OVERRIDE = "MEGA_NERF_TPU_EVAL_COMPOSITOR"

# (compositor, build-substring) pairs with a composed-lowering fault on
# the serving compiler, matched against `backend.platform_version`.
# Bisected on hardware (v5e, axon relay): eval image chunks crash the
# worker; train shapes are fine. The grouped merge is NOT listed for the
# known-bad build: its lowering has no (N, Sa, Sb) fused broadcasts (the
# faulting pattern), so it gets a real probe there.
KNOWN_BAD_BUILDS = (("merge", "cl/831091709"),)

# Probe order. The grouped merge leads: ~5x less VPU work than the
# pairwise merge at eval shapes (ops/compositing.py) and the only
# candidate with a chance on the known-bad build.
EVAL_PREFERENCE = ("merge_grouped", "merge")

# The full train step compiles in ~86 s on the same relay; the eval graph
# is smaller but remote compile service queueing varies.
PROBE_TIMEOUT_S = 420.0

_PROBE_SENTINEL = "COMPOSITOR_PROBE_OK"

# process-lifetime memo: {version_key: bool}
_MEMO: dict = {}


def _default_cache_path() -> Path:
    root = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    return root / "mega_nerf_tpu" / "compositor_probe.json"


def _platform_version() -> str:
    import jax.extend as jex

    backend = jex.backend.get_backend()
    return f"{backend.platform} {backend.platform_version}"


def _is_tpu_backend() -> bool:
    import jax

    return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")


def _read_cache(path: Path) -> dict:
    try:
        with open(path) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def _write_cache(path: Path, data: dict) -> None:
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        with open(tmp, "w") as f:
            json.dump(data, f, indent=2)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is an optimization; never fail the render for it


def _run_probe_subprocess(timeout: float, compositor: str = "merge") -> bool:
    """AOT-compile the composed eval graph in a throwaway process.

    Compile-only (`jit(...).lower(...).compile()` on ShapeDtypeStructs):
    no device arrays are created and nothing executes, so the probe does
    not race in-flight work on the chip — a crash is contained to the
    subprocess + the compile service."""
    repo_root = str(Path(__file__).resolve().parents[2])
    env = dict(os.environ)
    # Prepend, never clobber: the environment may need its own sitecustomize
    # path (e.g. the axon relay's /root/.axon_site) to register the backend.
    prev = env.get("PYTHONPATH")
    env["PYTHONPATH"] = repo_root + (os.pathsep + prev if prev else "")
    import signal

    # Popen + killpg (not subprocess.run): a timed-out probe may leave
    # pipe-inheriting helpers behind; run()'s timeout path kills only the
    # immediate child and can then block on the pipe read.
    try:
        proc = subprocess.Popen(
            [sys.executable, "-m", "mega_nerf_tpu.render.compositor_probe",
             compositor],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            start_new_session=True,
        )
    except OSError:
        return False
    try:
        out, _ = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        try:
            proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            pass
        return False
    return proc.returncode == 0 and _PROBE_SENTINEL in out


def eval_compositor_choice(
    *,
    probe: Optional[Callable[[str], bool]] = None,
    cache_path: Optional[Path] = None,
    version: Optional[str] = None,
) -> str:
    """The compositor the eval render path should compile on this backend:
    first `EVAL_PREFERENCE` entry the serving compiler can lower, else
    "union".

    `probe`, `cache_path`, `version` are injection points for tests; the
    defaults probe the real backend with the subprocess runner."""
    forced = os.environ.get(ENV_OVERRIDE, "").strip().lower()
    if forced in ("merge_grouped", "merge", "union"):
        return forced

    if not _is_tpu_backend():
        return "merge"

    key = version if version is not None else _platform_version()
    if key in _MEMO:
        return _MEMO[key]

    path = cache_path if cache_path is not None else _default_cache_path()
    cache = _read_cache(path)
    verdicts = cache.get(key, {})
    if not isinstance(verdicts, dict):
        # round-2 cache format: a single merge bool
        verdicts = {"merge": bool(verdicts)}
    runner = probe if probe is not None else (
        lambda c: _run_probe_subprocess(PROBE_TIMEOUT_S, c)
    )

    choice = "union"
    dirty = False
    for cand in EVAL_PREFERENCE:
        if any(c == cand and bad in key for c, bad in KNOWN_BAD_BUILDS):
            continue
        if cand not in verdicts:
            print(
                f"mega_nerf_tpu: probing whether the serving compiler can "
                f"lower the {cand} compositor composed with the eval "
                f"kernels (once per compiler build; "
                f"<= {PROBE_TIMEOUT_S:.0f}s) ..."
            )
            verdicts[cand] = bool(runner(cand))
            dirty = True
        if verdicts[cand]:
            choice = cand
            break

    print(f"mega_nerf_tpu: eval compositor = {choice}")
    if dirty:
        cache = _read_cache(path)  # re-read: another process may have written
        cache[key] = verdicts
        _write_cache(path, cache)
    _MEMO[key] = choice
    return choice


def merge_eval_ok(**kwargs) -> bool:
    """Back-compat shim: True when the chosen compositor is a merge form."""
    return eval_compositor_choice(**kwargs) != "union"


TRAIN_DIR_PACK_ENV = "MNTPU_TRAIN_DIR_PACK"

# Builds where the packed-dir TRAIN kernels are KNOWN to hang the Mosaic
# compile (round-2 bisect: the identical kernels compile in seconds on the
# Jan 2026 libtpu). Never probed — a timed-out remote compile can wedge
# the compile service/worker for up to hours on this relay.
TRAIN_DIR_PACK_BAD_BUILDS = ("cl/831091709",)
_TRAIN_DIR_PACK_MEMO: dict = {}
TRAIN_DIR_PACK_TIMEOUT_S = 420.0


def train_dir_pack_choice(
    *,
    probe: Optional[Callable[[], bool]] = None,
    cache_path: Optional[Path] = None,
    version: Optional[str] = None,
) -> bool:
    """Whether the fused TRAIN kernels may use the packed-dir tile layout
    on this backend's compiler.

    The packed layout is the measured-faster eval layout (one encode pass
    + one HBM stream feeds both matmul stages — PERF.md round 2), but its
    TRAIN twins hang one deployed libtpu's Mosaic compile. Same policy as
    the eval compositor: env override, known-bad builds skipped without
    probing, anything else probed ONCE per compiler build by AOT-compiling
    the differentiated fused train apply in a guarded subprocess."""
    forced = os.environ.get(TRAIN_DIR_PACK_ENV, "").strip()
    if forced in ("0", "1"):
        return forced == "1"

    if not _is_tpu_backend():
        return False  # non-TPU train defaults keep the proven layout

    key = version if version is not None else _platform_version()
    if key in _TRAIN_DIR_PACK_MEMO:
        return _TRAIN_DIR_PACK_MEMO[key]

    verdict = False
    if not any(bad in key for bad in TRAIN_DIR_PACK_BAD_BUILDS):
        path = cache_path if cache_path is not None else _default_cache_path()
        cache = _read_cache(path)
        verdicts = cache.get(key, {})
        if not isinstance(verdicts, dict):
            verdicts = {"merge": bool(verdicts)}
        if "train_dir_pack" not in verdicts:
            print(
                "mega_nerf_tpu: probing whether this compiler can lower "
                "the packed-dir fused TRAIN kernels (once per compiler "
                f"build; <= {TRAIN_DIR_PACK_TIMEOUT_S:.0f}s) ..."
            )
            runner = probe if probe is not None else (
                lambda: _run_probe_subprocess(
                    TRAIN_DIR_PACK_TIMEOUT_S, "train_dir_pack"
                )
            )
            verdicts["train_dir_pack"] = bool(runner())
            cache = _read_cache(path)
            cache[key] = verdicts
            _write_cache(path, cache)
        verdict = verdicts["train_dir_pack"]

    print(f"mega_nerf_tpu: train dir_pack = {verdict}")
    _TRAIN_DIR_PACK_MEMO[key] = verdict
    return verdict


def _train_dir_pack_probe_main() -> None:
    """Probe subprocess body: AOT-compile the differentiated fused train
    apply with the packed-dir layout at the paper fine-pass shape."""
    from argparse import Namespace

    import jax
    import jax.numpy as jnp

    from mega_nerf_tpu.models.factory import make_nerf
    from mega_nerf_tpu.render.pallas_train import fused_nerf_train_apply

    hp = Namespace(
        pos_xyz_dim=12, pos_dir_dim=4, layers=8, skip_layers=[4],
        layer_dim=256, appearance_dim=48, affine_appearance=False,
        use_cascade=False, sh_deg=None, shifted_softplus=True,
    )
    bundle = make_nerf(hp, appearance_count=8)
    m = 1024 * 512  # the paper config's fine pass

    params_sds = jax.eval_shape(bundle.init, jax.random.key(0))

    def loss_fn(params, xyz, dirs, app, noise):
        out = fused_nerf_train_apply(
            bundle.config, params, xyz, dirs, app, noise, dir_pack=True
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    f32 = jax.numpy.float32
    lowered = jax.jit(jax.grad(loss_fn, argnums=(0, 3))).lower(
        params_sds,
        jax.ShapeDtypeStruct((m, 3), f32),
        jax.ShapeDtypeStruct((m, 3), f32),
        jax.ShapeDtypeStruct((m, 48), f32),
        jax.ShapeDtypeStruct((m,), f32),
    )
    lowered.compile()
    print(_PROBE_SENTINEL)


def _probe_main() -> None:
    """Entry point for the probe subprocess: compile the composed graph."""
    from argparse import Namespace

    import jax

    from mega_nerf_tpu.models.factory import make_nerf
    from mega_nerf_tpu.render.rendering import RenderSettings, render_rays

    hp = Namespace(
        pos_xyz_dim=12,
        pos_dir_dim=4,
        layers=8,
        skip_layers=[4],
        layer_dim=256,
        appearance_dim=48,
        affine_appearance=False,
        use_cascade=False,
        sh_deg=None,
        shifted_softplus=True,
    )
    bundle = make_nerf(hp, appearance_count=8)
    compositor = sys.argv[1] if len(sys.argv) > 1 else "merge"
    settings = RenderSettings(
        coarse_samples=256,
        fine_samples=512,
        eval_compositor=compositor,  # the composition under test
    )
    n_rays = 16384  # the image-chunk batch that triggers the known fault

    params_sds = jax.eval_shape(bundle.init, jax.random.key(0))

    def eval_fn(params, rays, image_indices):
        results, _ = render_rays(
            bundle, None, params, None, rays, image_indices, settings,
            train=False,
        )
        return results

    lowered = jax.jit(eval_fn).lower(
        params_sds,
        jax.ShapeDtypeStruct((n_rays, 8), jax.numpy.float32),
        jax.ShapeDtypeStruct((n_rays,), jax.numpy.int32),
    )
    lowered.compile()
    print(_PROBE_SENTINEL)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "train_dir_pack":
        _train_dir_pack_probe_main()
    else:
        _probe_main()
