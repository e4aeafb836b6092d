"""Large-K merged-mixture render throughput: routed vs dense.

The reference ships 8- AND 25-submodule merged models
(`/root/reference/README.md:39-51`); its query path boolean-indexes points
per submodule (`mega_nerf/models/mega_nerf.py:35-49`, dynamic shapes). Our
dense blend (`mega_apply`) pays K× FLOPs — fine at K=8, ruinous at K=25 —
and `mega_apply_routed` (sorted-gather block routing) is the large-K plan.
This script measures both on a real chip at the paper model scale so the
auto crossover (ModelBundle.routing == "auto": routed above 8) is backed
by numbers.

Round 5 adds the "ray" mode: `mega_apply_ray_routed` — whole rays routed
to their support cells (cell_cull.ray_support_masks) via one-hot capacity
dispatch, all data movement on the MXU, no per-point argsort/gather. Each
cell evaluates only sum(|support|)/K of the dense blend's points.

Usage: python scripts/routing_bench.py [--rays 4096] [--iters 4]
       [--modes dense,routed,ray]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def grid_centroids(gx: int, gy: int, spacing: float = 1.0):
    import numpy as np

    ys, zs = np.meshgrid(np.arange(gx), np.arange(gy), indexing="ij")
    return np.stack(
        [
            np.zeros(gx * gy),
            (ys.reshape(-1) - (gx - 1) / 2) * spacing,
            (zs.reshape(-1) - (gy - 1) / 2) * spacing,
        ],
        axis=1,
    ).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--margin", type=float, default=1.15)
    ap.add_argument("--modes", type=str, default="dense,routed,ray",
                    help="comma list of dense|routed|ray variants to time")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model/samples on CPU: wiring check")
    args = ap.parse_args()
    modes = tuple(m.strip() for m in args.modes.split(",") if m.strip())

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mega_nerf_tpu.models.factory import _make_bundle
    from mega_nerf_tpu.opts import get_opts_base, parse_opts
    from mega_nerf_tpu.render import RenderSettings, render_rays

    from mega_nerf_tpu.models import ray_route_plan
    from mega_nerf_tpu.render.cell_cull import ray_support_masks

    results = {}
    for k, grid in ((8, (4, 2)), (25, (5, 5))):
        for routing in modes:
            if k == 25 and routing == "dense" and args.iters > 2:
                iters = 2  # 25x FLOPs — don't spend minutes proving slowness
            else:
                iters = args.iters
            model_args = [
                "--coarse_samples", "256", "--fine_samples", "512",
                "--pos_xyz_dim", "12", "--pos_dir_dim", "4",
                "--layers", "8", "--skip_layers", "4",
                "--layer_dim", "256", "--bg_layer_dim", "256",
                "--appearance_dim", "48",
            ]
            if args.smoke:
                jax.config.update("jax_platforms", "cpu")
                args.rays = min(args.rays, 64)
                model_args = [
                    "--coarse_samples", "16", "--fine_samples", "16",
                    "--pos_xyz_dim", "6", "--pos_dir_dim", "2",
                    "--layers", "2", "--skip_layers", "1",
                    "--layer_dim", "32", "--bg_layer_dim", "32",
                    "--appearance_dim", "8",
                ]
            # The dense blend materializes K x rays x samples activations:
            # at the paper sampling (768 pts/ray) 4096 rays x K=8 needs
            # ~20 GB of HBM (measured OOM on the 16 GB v5e). Scale the
            # dense chunk down with K — exactly what a dense eval loop
            # would have to do — and report rays/s, which stays comparable
            # across ray budgets.
            n_rays = args.rays
            if routing == "dense" and not args.smoke:
                n_rays = min(n_rays, max(256, 8192 // k))
            hp = parse_opts(get_opts_base(), model_args + [
                "--near", "0.5",
                "--ray_altitude_range", "-2.0", "2.0",
                "--compute_dtype", "bfloat16",
                # "ray" routes through render_rays' fg_ray_support path
                # over an otherwise-dense bundle.
                "--mega_routing", "dense" if routing == "ray" else routing,
            ])
            hp._mega_centroid_metadata = {
                "centroids": grid_centroids(*grid),
                "cluster_2d": True,
            }
            bundle = _make_bundle(hp, 64, 256, 3)
            bundle.boundary_margin = args.margin
            params = bundle.init(jax.random.key(0))

            s_fine = hp.coarse_samples + hp.fine_samples  # merged fine pass

            def make_rays(n):
                rng = np.random.default_rng(0)
                d = rng.normal(size=(n, 3))
                d /= np.linalg.norm(d, axis=-1, keepdims=True)
                o = rng.normal(size=(n, 3)) * 0.5
                rays_np = np.concatenate(
                    [o, d, np.full((n, 1), 0.5), np.full((n, 1), 3.0)], -1
                ).astype(np.float32)
                idx_np = rng.integers(0, 64, n).astype(np.int32)
                return rays_np, idx_np

            support = cells = cap = None
            n = n_rays
            rays_np, idx_np = make_rays(n)
            if routing == "ray":
                # Size the ray budget by the PEAK expert point count
                # (Kv * capacity * merged fine samples), matching the HBM
                # reasoning of the dense scaling above. ray_route_plan
                # load-balances skewed supports into virtual experts, so
                # the padded slot total ~ the true support total.
                budget = 2048 * 16 if args.smoke else 8 << 20
                while True:
                    masks = ray_support_masks(
                        rays_np, np.asarray(bundle.centroids, np.float32),
                        args.margin, bundle.cluster_dim_start,
                    )
                    support, cells, cap = ray_route_plan(masks)
                    if len(cells) * cap * s_fine <= budget or n <= 256:
                        break
                    n = n // 2
                    rays_np, idx_np = make_rays(n)

            rays = jnp.asarray(rays_np)
            idx = jnp.asarray(idx_np)
            settings = RenderSettings(
                coarse_samples=hp.coarse_samples, fine_samples=hp.fine_samples
            )
            routing_kw = {}
            if routing == "ray":
                routing_kw = dict(
                    fg_ray_support=jnp.asarray(support),
                    fg_ray_capacity=int(cap),
                    fg_ray_cells=jnp.asarray(cells),
                )

            def step(rays_in):
                r, _ = render_rays(
                    bundle, None, params, None, rays_in, idx, settings,
                    **routing_kw,
                )
                rgb = r["rgb_fine"]
                return rays_in.at[:, 0:3].add(0.0 * rgb), rgb

            step = jax.jit(step)
            t0 = time.perf_counter()
            rr, rgb = step(rays)
            jax.block_until_ready(rgb)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(iters):
                rr, rgb = step(rr)
            jax.block_until_ready(rgb)
            per = (time.perf_counter() - t0) / iters
            tag = f"k{k}_{routing}"
            results[tag] = {
                "rays_per_sec": round(n / per, 1),
                "rays": n,
                "ms": round(per * 1e3, 1),
                "compile_s": round(compile_s, 1),
            }
            if routing == "ray":
                results[tag]["capacity"] = int(cap)
                results[tag]["virtual_experts"] = int(len(cells))
                results[tag]["padded_slots"] = int(len(cells) * cap)
                results[tag]["mean_support"] = round(
                    float(masks.sum(1).mean()), 2
                )
            print(tag, json.dumps(results[tag]), flush=True)

    summary = {"metric": "mega_routing_bench", "results": results}
    for kk in (8, 25):
        base = results.get(f"k{kk}_dense")
        if not base:
            continue
        for alt in ("routed", "ray"):
            r = results.get(f"k{kk}_{alt}")
            if r:
                # rays/s ratios (comparable across K-scaled ray budgets)
                summary[f"{alt}_speedup_k{kk}"] = round(
                    r["rays_per_sec"] / base["rays_per_sec"], 3
                )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
