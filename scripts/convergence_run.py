"""Long-horizon on-chip convergence run through the FULL pipeline.

Exercises the reference's production recipe end-to-end at paper model scale
(reference `mega_nerf/opts.py:32-35,46-50,74,93`: 8x256 MLP, 256 coarse +
512 fine samples, NeRF++ background, 48-dim appearance embeddings, batch
1024) on a synthetic multi-image scene: dataset build -> cluster masks ->
FilesystemDataset parquet chunk store -> masked cell-0 training for >=20k
steps with periodic right-half val PSNR — proving the host data pipeline
keeps the chip fed past the overfit regime and that quality climbs on
held-out views.

Usage: python scripts/convergence_run.py [--steps 20000] [--workdir .exp/convergence]
Reports: val-PSNR curve + sustained train rays/s, summarized to
{workdir}/summary.json (raw curves in the experiment's tb/metrics.jsonl).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from argparse import Namespace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--workdir", type=str, default=".exp/convergence")
    ap.add_argument("--val_interval", type=int, default=2500)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--n_train", type=int, default=28)
    ap.add_argument("--scene", type=str, default="ring",
                    choices=["ring", "drone"])
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)

    # --- 1. synthetic scene (reference dataset layout, SURVEY §2.6) ---
    from tests.synthetic import make_drone_dataset, make_synthetic_dataset

    ds = work / "ds"
    if not (ds / "coordinates.pt").exists():
        print("building synthetic dataset...")
        maker = (
            make_drone_dataset if args.scene == "drone"
            else make_synthetic_dataset
        )
        maker(ds, n_train=args.n_train, n_val=2, hw=(args.hw, args.hw))

    # --- 2. cluster masks (grid 2x1 -> this run trains cell 0) ---
    import scripts.create_cluster_masks as ccm

    masks = work / "masks"
    if not (masks / "params.pt").exists():
        print("creating cluster masks...")
        ccm.main(Namespace(
            dataset_path=str(ds), segmentation_path=None, output=str(masks),
            grid_dim=[2, 1], ray_samples=256, ray_chunk_size=48 * 1024,
            resume=False, ray_altitude_range=[-2.0, 2.0], near=0.5, far=3.5,
            center_pixels=True, cluster_2d=False, boundary_margin=1.15,
        ))

    # --- 3. masked cell-0 training: paper model scale, filesystem dataset ---
    from mega_nerf_tpu.opts import get_opts_base, parse_opts
    from mega_nerf_tpu.runtime.runner import Runner

    parser = get_opts_base()
    parser.add_argument("--exp_name", type=str, default=str(work / "sub0"))
    parser.add_argument("--dataset_path", type=str, default=str(ds))
    hp = parse_opts(parser, [
        "--dataset_type", "filesystem",
        "--chunk_paths", str(work / "chunks0"),
        "--num_chunks", "8",
        "--cluster_mask_path", str(masks / "0"),
        "--near", "0.5",
        "--ray_altitude_range", "-2.0", "2.0",
        "--coarse_samples", "256", "--fine_samples", "512",
        "--pos_xyz_dim", "12", "--pos_dir_dim", "4",
        "--layers", "8", "--skip_layers", "4",
        "--layer_dim", "256", "--bg_layer_dim", "256",
        "--appearance_dim", "48",
        "--batch_size", "1024",
        "--lr", "5e-4", "--lr_decay_factor", "0.1",
        "--train_iterations", str(args.steps),
        "--ckpt_interval", str(args.steps),
        "--val_interval", str(args.val_interval),
        "--val_scale_factor", "1",
        "--compute_dtype", "bfloat16",
    ])

    t0 = time.perf_counter()
    runner = Runner(hp)
    runner.train()
    wall = time.perf_counter() - t0

    # --- 4. summarize the curves from the experiment's metrics.jsonl ---
    exp = sorted(
        (p for p in Path(hp.exp_name).iterdir() if p.name.isdigit()),
        key=lambda p: int(p.name),
    )[-1]
    val_psnr, rays_per_sec = [], []
    with open(exp / "tb" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            for k, v in rec.items():
                if k == "val/psnr":
                    val_psnr.append((rec["step"], v))
                elif k == "train/rays_per_sec":
                    rays_per_sec.append(v)

    # Per-step val entries are keyed val/psnr/<i>; the averaged protocol in
    # _run_validation stores per-image scalars — average the pairs per step.
    by_step = {}
    with open(exp / "tb" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            for k, v in rec.items():
                if k.startswith("val/psnr"):
                    by_step.setdefault(rec["step"], []).append(v)
    curve = sorted((s, sum(v) / len(v)) for s, v in by_step.items())

    sustained = (
        sorted(rays_per_sec)[len(rays_per_sec) // 2] if rays_per_sec else None
    )
    summary = {
        "steps": args.steps,
        "wall_seconds": round(wall, 1),
        "val_psnr_curve": [(s, round(p, 3)) for s, p in curve],
        "median_sustained_rays_per_sec": round(sustained, 1) if sustained else None,
        "experiment": str(exp),
    }
    with open(work / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
