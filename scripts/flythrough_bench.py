"""Flythrough (render_images.py) frames/s benchmark on a merged container.

Builds a poses/intrinsics/embeddings input dir from a dataset pose
(optionally upscaled to a production-like frame size), runs the REAL
`scripts/render_images.py` path end to end, and reports steady-state
frames/s (first frame excluded — it pays the eval-fn compile) for the
pipelined loop (`--render_dispatch_depth` chunks in flight + background
frame compositing) vs the reference-style serial loop (depth 1).

Reference analogue: `/root/reference/mega_nerf/runner.py:540-587` +
`/root/reference/scripts/render_images.py:80-129` (strictly serial).

Usage: python scripts/flythrough_bench.py --container <merged.ckpt>
    --dataset_path <ds> --centroids_path <masks/params.pt>
    [--frames 10] [--upscale 4] [--depths 2 1]
"""

from __future__ import annotations

import argparse
import json
import shutil
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
    ap.add_argument("--workdir", type=str, default=".exp/flythrough_bench")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--upscale", type=int, default=4,
                    help="scale the dataset pose's W/H/intrinsics by this "
                         "factor — production flythroughs render full-res "
                         "frames, not training crops")
    ap.add_argument("--depths", type=int, nargs="+", default=[2, 1],
                    help="render_dispatch_depth values to A/B")
    ap.add_argument("--ab_cull", action="store_true",
                    help="A/B exact submodule culling (render/cell_cull.py) "
                         "instead of dispatch depths: renders the flythrough "
                         "with culling on vs off at depths[0] and reports "
                         "both, plus the max |rgb| frame difference (must be "
                         "float32-rounding-level: culling is exact)")
    ap.add_argument("--occupancy_path", type=str, default=None,
                    help="with --ab_cull: the ON variant also engages "
                         "occupancy-tightened fg bounds (render/ray_bounds) "
                         "from this baked grid/octree npz — the production "
                         "serving stack (cull+occupancy) vs the plain "
                         "renderer. The frame-difference check becomes "
                         "informational (occupancy is lossy; quality deltas "
                         "are occupancy_bench.py's job)")
    ap.add_argument("--on_samples_div", type=int, default=1,
                    help="with --ab_cull/--ab_occ + --occupancy_path: "
                         "divide the ON variant's coarse/fine sample "
                         "counts by this — the tightened intervals keep "
                         "sampling density, so this is the production "
                         "reduced-budget serving config (PSNR deltas "
                         "measured by occupancy_bench.py)")
    ap.add_argument("--ab_ray", action="store_true",
                    help="A/B --mega_routing ray (ray-granularity routed "
                         "mixture, models/mega.mega_apply_ray_routed) vs "
                         "the dense blend at depths[0]; occupancy flags "
                         "apply to BOTH sides. Exact — reports the max "
                         "|rgb| frame difference")
    ap.add_argument("--ab_occ", action="store_true",
                    help="A/B occupancy-bounded reduced-budget serving "
                         "WITHOUT submodule culling on either side: "
                         "occ_on = --occupancy_path (+--on_samples_div) "
                         "+ --no_cell_cull vs occ_off = plain "
                         "--no_cell_cull — isolates the sampling-budget "
                         "win from the culling machinery")
    ap.add_argument("--occupancy_mode", type=str, default=None,
                    choices=["near", "both"],
                    help="occupancy tightening mode for the ON variant "
                         "(default: the renderer's default, 'near')")
    ap.add_argument("--near", type=float, default=0.5)
    ap.add_argument("--ray_altitude_range", type=float, nargs=2,
                    default=[-2.0, 2.0])
    ap.add_argument("--model_args", type=str, default=(
        "--coarse_samples 256 --fine_samples 512 "
        "--pos_xyz_dim 12 --pos_dir_dim 4 --layers 8 --skip_layers 4 "
        "--layer_dim 256 --bg_layer_dim 256 --appearance_dim 48"
    ), help="whitespace-separated model flags (one string)")
    args = ap.parse_args()
    args.model_args = args.model_args.split()

    import scripts.render_images as ri
    from mega_nerf_tpu.data.torch_io import load_pt
    from mega_nerf_tpu.opts import get_opts_base, parse_opts

    work = Path(args.workdir)
    ds = Path(args.dataset_path)
    meta = load_pt(next((ds / "train" / "metadata").glob("*.pt")))
    c2w = np.asarray(meta["c2w"]).reshape(-1)
    fx, fy, cx, cy = [float(v) for v in np.asarray(meta["intrinsics"])]
    w, h = int(meta["W"]) * args.upscale, int(meta["H"]) * args.upscale
    fx, fy, cx, cy = (v * args.upscale for v in (fx, fy, cx, cy))

    fly = work / "input"
    if fly.exists():
        shutil.rmtree(fly)
    fly.mkdir(parents=True)
    fly.joinpath("poses.txt").write_text(
        "\n".join(" ".join(str(v) for v in c2w)
                  for _ in range(args.frames)) + "\n"
    )
    fly.joinpath("intrinsics.txt").write_text(
        f"{w} {h} {fx} {fy} {cx} {cy}\n" * args.frames
    )
    fly.joinpath("embeddings.txt").write_text(
        "\n".join("0" for _ in range(args.frames)) + "\n"
    )

    on_flags = []
    if args.occupancy_path:
        on_flags += ["--occupancy_path", args.occupancy_path]
        if args.occupancy_mode:
            on_flags += ["--occupancy_mode", args.occupancy_mode]
        if args.on_samples_div > 1:
            ma = args.model_args
            for flag in ("--coarse_samples", "--fine_samples"):
                i = ma.index(flag)
                on_flags += [flag,
                             str(int(ma[i + 1]) // args.on_samples_div)]
    if args.ab_cull:
        variants = [("cull_on", args.depths[0], on_flags),
                    ("cull_off", args.depths[0], ["--no_cell_cull"])]
    elif args.ab_ray:
        # Ray-granularity routed serving vs the dense blend, same bounds
        # on both sides (occupancy flags, if given, shrink support sets —
        # exactly the production serving stack). Routing is exact, so the
        # frame difference must stay at float-rounding level.
        variants = [
            ("ray_on", args.depths[0],
             on_flags + ["--mega_routing", "ray", "--no_cell_cull"]),
            ("ray_off", args.depths[0], on_flags + ["--no_cell_cull"]),
        ]
    elif args.ab_occ:
        variants = [
            ("occ_on", args.depths[0], on_flags + ["--no_cell_cull"]),
            ("occ_off", args.depths[0], ["--no_cell_cull"]),
        ]
    else:
        variants = [(f"depth{d}", d, []) for d in args.depths]

    results = {}
    for name, depth, extra_flags in variants:
        out = work / f"frames_{name}"
        if out.exists():
            shutil.rmtree(out)
        rhp = parse_opts(get_opts_base(), [
            "--near", str(args.near),
            "--ray_altitude_range", *[str(v) for v in args.ray_altitude_range],
        ] + args.model_args + extra_flags + [
            "--container_path", args.container,
            "--val_scale_factor", "1",
            "--compute_dtype", "bfloat16",
            "--render_dispatch_depth", str(depth),
        ])
        rhp.input = str(fly)
        rhp.output = str(out)
        rhp.dataset_path = str(ds)
        rhp.centroids_path = args.centroids_path
        rhp.save_depth_npz = False
        rhp.resume = False

        # Frame timestamps from the written artifacts: the cell overlay is
        # each frame's LAST write, so successive mtimes bound per-frame wall.
        # Wall-clock (time.time) throughout — mtimes are epoch-based.
        t0 = time.time()
        ri.main(rhp)
        total = time.time() - t0
        mtimes = sorted(
            p.stat().st_mtime for p in (out / "cells").glob("*.jpg")
        )
        n = len(mtimes)
        steady = (
            (mtimes[-1] - mtimes[0]) / (n - 1) if n > 1 else float("nan")
        )
        results[name] = {
            "frames": n,
            "total_s": round(total, 1),
            "first_frame_s": round(mtimes[0] - t0, 1) if n else None,
            "steady_s_per_frame": round(steady, 2),
            "steady_fps": round(1.0 / steady, 3) if steady == steady else None,
            "steady_rays_per_s": (
                round(w * h / steady) if steady == steady else None
            ),
        }
        print(f"{name}:", json.dumps(results[name]), flush=True)

    if args.ab_cull or args.ab_occ:
        # Culling is exact: the rendered frames must match to jpg rounding
        # (a few u8 steps of backend matmul-batching noise through the
        # codec at most). Enforce it — a silent mismatch would invalidate
        # the A/B as evidence. With occupancy bounds engaged the ON frames
        # are legitimately (slightly) different — report the diff but
        # don't gate on it (quality deltas are occupancy_bench.py's job).
        from PIL import Image

        tag = "cull" if args.ab_cull else ("ray" if args.ab_ray else "occ")
        diffs = []
        for p_on in sorted(
            (work / f"frames_{tag}_on" / "rgbs").glob("*.jpg")
        ):
            p_off = work / f"frames_{tag}_off" / "rgbs" / p_on.name
            a = np.asarray(Image.open(p_on), np.int16)
            b = np.asarray(Image.open(p_off), np.int16)
            diffs.append(int(np.abs(a - b).max()))
        assert diffs, "A/B rendered no frames — nothing was compared"
        results["max_abs_rgb_diff_u8"] = max(diffs)
        if (args.ab_cull or args.ab_ray) and not args.occupancy_path:
            key = "cull_exact" if args.ab_cull else "ray_exact"
            results[key] = max(diffs) <= 3
            assert results[key], (
                f"{tag}-on frames diverge from {tag}-off by {max(diffs)} "
                "u8 steps"
            )

    print(json.dumps({
        "metric": "flythrough_frames_per_sec",
        "frame_px": [w, h],
        "results": results,
    }))


if __name__ == "__main__":
    main()
