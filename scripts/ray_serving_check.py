"""Single-image ray-routed serving A/B on a merged container.

A compact validator for the --mega_routing ray production path: renders
one dataset view twice per mode through the REAL Runner.render_image
(dense blend vs ray-routed), reports warm per-image wall and the max
|rgb| difference (routing is exact). The full flythrough A/B is
scripts/flythrough_bench.py --ab_ray; this exists because a flythrough
costs ~25 min of chip per variant while the question "did the plan
unification fix the compile sprawl" needs only warm-image timings.

Usage: python scripts/ray_serving_check.py --container <merged.pt>
    --dataset_path <ds> --centroids_path <masks/params.pt> [--upscale 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--container", type=str, required=True)
    ap.add_argument("--dataset_path", type=str, required=True)
    ap.add_argument("--centroids_path", type=str, required=True)
    ap.add_argument("--upscale", type=int, default=4)
    ap.add_argument("--warm_images", type=int, default=2)
    ap.add_argument("--model_args", type=str, default=(
        "--coarse_samples 256 --fine_samples 512 "
        "--pos_xyz_dim 12 --pos_dir_dim 4 --layers 8 --skip_layers 4 "
        "--layer_dim 256 --bg_layer_dim 256 --appearance_dim 48"
    ))
    ap.add_argument("--near", type=float, default=0.5)
    ap.add_argument("--ray_altitude_range", type=float, nargs=2,
                    default=[-2.0, 2.0])
    args = ap.parse_args()

    from mega_nerf_tpu.data.image_metadata import ImageMetadata
    from mega_nerf_tpu.opts import get_opts_base, parse_opts
    from mega_nerf_tpu.runtime.runner import Runner

    results = {}
    outs = {}
    for mode in ("dense", "ray"):
        hp = parse_opts(get_opts_base(), args.model_args.split() + [
            "--near", str(args.near),
            "--ray_altitude_range",
            *[str(v) for v in args.ray_altitude_range],
            "--container_path", args.container,
            "--val_scale_factor", "1",
            "--compute_dtype", "bfloat16",
            "--mega_routing", mode,
            "--no_cell_cull",
        ])
        hp.dataset_path = args.dataset_path
        hp.centroids_path = args.centroids_path
        runner = Runner(hp, set_experiment_path=False)
        m0 = runner.val_items[0]
        meta = ImageMetadata(
            Path(""), m0.c2w, m0.W * args.upscale, m0.H * args.upscale,
            np.asarray(m0.intrinsics, np.float32) * args.upscale,
            0, None, False,
        )
        state = runner.make_eval_state()
        t0 = time.time()
        out = runner.render_image(meta, state)
        first = time.time() - t0
        warm = []
        for _ in range(args.warm_images):
            t0 = time.time()
            out = runner.render_image(meta, state)
            warm.append(time.time() - t0)
        outs[mode] = np.asarray(out["rgb_fine"], np.float32)
        n_rays = meta.W * meta.H
        results[mode] = {
            "first_image_s": round(first, 1),
            "warm_image_s": round(float(np.mean(warm)), 2),
            "warm_rays_per_s": round(n_rays / float(np.mean(warm)), 1),
        }
        print(mode, json.dumps(results[mode]), flush=True)

    diff = float(np.abs(outs["ray"] - outs["dense"]).max())
    results["max_abs_rgb_diff"] = diff
    assert diff < 3e-2, f"ray-routed diverged from dense: {diff}"
    results["speedup_warm"] = round(
        results["dense"]["warm_image_s"] / results["ray"]["warm_image_s"], 3
    )
    print(json.dumps({"metric": "ray_serving_check", "results": results}))


if __name__ == "__main__":
    main()
