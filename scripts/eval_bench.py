"""Eval/render-path throughput microbench (single chip).

Measures the inference `render_rays` path — the hot loop behind `eval.py`,
`render_images.py`, and octree probing (reference `mega_nerf/eval.py` /
`scripts/render_images.py`) — at the paper config (8x256 fg + bg,
coarse 256 / fine 512 hierarchical) on a 16384-ray chunk.

Timing obeys the relay rules (see .claude/skills/verify/SKILL.md): each
iteration's ray origins are perturbed by a term derived from the previous
iteration's output, so dispatches chain and `block_until_ready` measures
real device work.

Usage: python scripts/eval_bench.py [--rays 16384] [--iters 8] [--xla]
       [--profile DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--xla", action="store_true", help="force the XLA path")
    ap.add_argument("--pre_encode", action="store_true",
                    help="A/B: force the XLA pre-encode feeding the kernel")
    ap.add_argument("--encode_in_kernel", action="store_true",
                    help="compute the frequency encode inside the fused "
                         "kernel from compile-time iota constants (round-4 "
                         "rework of the round-3 runtime-meta negative)")
    ap.add_argument("--no_bg", action="store_true")
    ap.add_argument("--layer_dim", type=int, default=256,
                    help="trunk width (2048 = the mega-nerf-dense family)")
    ap.add_argument("--coarse_samples", type=int, default=256)
    ap.add_argument("--fine_samples", type=int, default=512)
    ap.add_argument("--profile", type=str, default=None,
                    help="capture a jax.profiler trace of the timed loop")
    ap.add_argument("--compositor", type=str, default="auto",
                    choices=["auto", "merge_grouped", "merge", "union"],
                    help="force the coarse+fine eval compositor (auto = "
                         "compositor_probe choice)")
    ap.add_argument("--dense_cdf", action="store_true",
                    help="A/B: force the dense inverse-CDF bracketing "
                         "(default: grouped two-level at eval sizes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mega_nerf_tpu.models.factory import make_bg_nerf, make_nerf
    from mega_nerf_tpu.opts import get_opts_base, parse_opts
    from mega_nerf_tpu.render import RenderSettings, render_rays

    hp = parse_opts(get_opts_base(), [
        "--coarse_samples", str(args.coarse_samples),
        "--fine_samples", str(args.fine_samples),
        "--pos_xyz_dim", "12", "--pos_dir_dim", "4",
        "--layers", "8", "--skip_layers", "4",
        "--layer_dim", str(args.layer_dim),
        "--bg_layer_dim", str(args.layer_dim),
        "--appearance_dim", "48",
        "--near", "0.5",
        "--ray_altitude_range", "-2.0", "2.0",
        "--compute_dtype", "bfloat16",
    ])
    app_count = 64
    fg = make_nerf(hp, app_count)
    bg = None if args.no_bg else make_bg_nerf(hp, app_count)
    key = jax.random.key(0)
    fg_params = fg.init(key)
    bg_params = bg.init(key) if bg is not None else None

    n = args.rays
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.normal(size=(n, 3)) * 0.1
    rays = jnp.asarray(
        np.concatenate(
            [o, d, np.full((n, 1), 0.5), np.full((n, 1), 3.0)], -1
        ),
        jnp.float32,
    )
    idx = jnp.asarray(rng.integers(0, app_count, n), jnp.int32)
    sphere_center = jnp.zeros((3,))
    sphere_radius = jnp.ones((3,))

    if args.pre_encode or args.encode_in_kernel:
        assert not (args.pre_encode and args.encode_in_kernel)
        import functools

        from mega_nerf_tpu.render import pallas_mlp

        pallas_mlp.fused_nerf_eval = functools.partial(
            pallas_mlp.fused_nerf_eval,
            encode_in_kernel=bool(args.encode_in_kernel),
        )
        from mega_nerf_tpu.render import rendering as _r

        if getattr(_r, "fused_nerf_eval", None) is not None:
            _r.fused_nerf_eval = pallas_mlp.fused_nerf_eval

    settings = RenderSettings(
        coarse_samples=args.coarse_samples,
        fine_samples=args.fine_samples,
        use_pallas=False if args.xla else "auto",
        eval_compositor=args.compositor,
    )
    if args.dense_cdf:
        import functools

        from mega_nerf_tpu.ops import sampling as _sampling
        from mega_nerf_tpu.render import rendering as _rendering

        forced = functools.partial(_sampling.sample_pdf, grouped=False)
        _rendering.sample_pdf = lambda *a, **k: forced(
            *a, **{kk: vv for kk, vv in k.items() if kk != "grouped"}
        )

    def step(rays_in):
        results, _ = render_rays(
            fg, bg, fg_params, bg_params, rays_in, idx, settings,
            sphere_center=sphere_center, sphere_radius=sphere_radius,
        )
        rgb = results["rgb_fine"]
        # Chain: next iteration's origins depend on this output (0-valued
        # in expectation but data-dependent as far as the runtime knows).
        return rays_in.at[:, 0:3].add(0.0 * rgb), rgb

    step = jax.jit(step)
    t0 = time.perf_counter()
    rays_dev, rgb = step(rays)
    jax.block_until_ready(rgb)
    compile_s = time.perf_counter() - t0

    ctx = (
        jax.profiler.trace(args.profile)
        if args.profile else __import__("contextlib").nullcontext()
    )
    with ctx:
        t0 = time.perf_counter()
        for _ in range(args.iters):
            rays_dev, rgb = step(rays_dev)
        jax.block_until_ready(rgb)
        wall = time.perf_counter() - t0
    per_iter = wall / args.iters
    print(json.dumps({
        "metric": "eval_render_rays_per_sec",
        "value": round(n / per_iter, 1),
        "unit": "rays/s/chip",
        "ms_per_chunk": round(per_iter * 1e3, 2),
        "rays": n,
        "iters": args.iters,
        "path": "xla" if args.xla else "pallas-auto",
        "compositor": args.compositor,
        "cdf": "dense" if args.dense_cdf else "grouped-auto",
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
