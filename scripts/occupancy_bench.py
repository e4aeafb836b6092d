"""Occupancy-guided sampling A/B on a merged container (render/ray_bounds).

Renders the dataset's val views through `Runner.render_image` under several
(occupancy, sample-count) settings and reports PSNR vs the ground-truth
images plus wall s/image — quantifying the lossy opt-in serving mode's
quality/speed trade (`--occupancy_path`): tightened fg intervals let a
reduced sample budget cover the geometry at unchanged sampling density.

Variants: baseline (paper samples, no occupancy), occ@1x (tightening alone
— PSNR should match or beat baseline), occ@1/2 and occ@1/4 sample counts.

Usage: python scripts/occupancy_bench.py --container <merged.pt>
    --dataset_path <ds> --octree <octree.npz>
    [--centroids_path <masks/params.pt>] [--images 2]
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
    ap.add_argument("--octree", type=str, required=True)
    ap.add_argument("--centroids_path", type=str, default=None)
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--near", type=float, default=0.5)
    ap.add_argument("--ray_altitude_range", type=float, nargs=2,
                    default=[-2.0, 2.0])
    ap.add_argument("--coarse_samples", type=int, default=256)
    ap.add_argument("--fine_samples", type=int, default=512)
    ap.add_argument("--occupancy_dilate", type=int, default=1)
    ap.add_argument("--model_args", type=str, default=(
        "--pos_xyz_dim 12 --pos_dir_dim 4 --layers 8 --skip_layers 4 "
        "--layer_dim 256 --bg_layer_dim 256 --appearance_dim 48"
    ))
    args = ap.parse_args()

    import jax

    from mega_nerf_tpu.opts import get_opts_base, parse_opts
    from mega_nerf_tpu.runtime.runner import Runner

    variants = [
        ("baseline", 1, None),
        ("occ_1x", 1, "near"),
        ("occ_half", 2, "near"),
        ("occ_quarter", 4, "near"),
        ("occ_both_1x", 1, "both"),
        ("occ_both_half", 2, "both"),
    ]
    results = {}
    for name, div, occ_mode in variants:
        flags = [
            "--near", str(args.near),
            "--ray_altitude_range", *map(str, args.ray_altitude_range),
        ] + args.model_args.split() + [
            "--container_path", args.container,
            "--coarse_samples", str(args.coarse_samples // div),
            "--fine_samples", str(args.fine_samples // div),
            "--compute_dtype", "bfloat16",
        ]
        if occ_mode:
            flags += ["--occupancy_path", args.octree,
                      "--occupancy_dilate", str(args.occupancy_dilate),
                      "--occupancy_mode", occ_mode]
        hp = parse_opts(get_opts_base(), flags)
        hp.dataset_path = args.dataset_path
        if args.centroids_path:
            hp.centroids_path = args.centroids_path
        runner = Runner(hp, set_experiment_path=False)
        state = runner.make_eval_state()

        psnrs, walls = [], []
        for meta in runner.val_items[: args.images]:
            gt = meta.load_image().astype(np.float32) / 255.0
            t0 = time.time()
            out = runner.render_image(meta, state)
            rgb = np.asarray(
                out["rgb_fine" if "rgb_fine" in out else "rgb_coarse"],
                np.float32,
            ).reshape(gt.shape)
            walls.append(time.time() - t0)
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        results[name] = {
            "samples": f"{args.coarse_samples // div}+"
                       f"{args.fine_samples // div}",
            "psnr": round(float(np.mean(psnrs)), 2),
            # First image pays the compile; steady = the rest (or the
            # first when images == 1).
            "s_per_image": round(float(np.mean(walls[1:] or walls)), 2),
        }
        print(f"{name}:", json.dumps(results[name]), flush=True)
        del runner, state

    print(json.dumps({
        "metric": "occupancy_sampling_ab",
        "n_devices": jax.local_device_count(),
        "results": results,
    }))


if __name__ == "__main__":
    main()
