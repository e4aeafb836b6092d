"""On-chip END-TO-END cell-parallel convergence run.

Drives the flagship Mega-NeRF workflow — the reference's masks -> 8
parallel jobs -> merge pipeline (`/root/reference/parscripts/run_8.txt`,
`/root/reference/scripts/merge_submodules.py:24-77`) — as ONE program on
real hardware at paper model scale:

  synthetic multi-image scene -> create_cluster_masks (2x1 grid) ->
  CellRunner one-program 2-cell training (vmapped cells on one chip, or
  sharded over a 'cell' mesh axis when chips allow) -> per-cell
  checkpoints in the merge layout -> merge_submodules container ->
  merged-model right-half val PSNR.

Reports a JSON summary: sustained cell-parallel rays/s and merged PSNR.

Usage: python scripts/cell_convergence_run.py [--steps 8000]
       [--workdir .exp/cell_convergence]
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
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--workdir", type=str, default=".exp/cell_convergence")
    ap.add_argument("--cell_axis", type=int, default=1)
    ap.add_argument("--ckpt_interval", type=int, default=0,
                    help="checkpoint every N steps (0: only at the end); "
                         "long on-chip runs should set this — the worker "
                         "can wedge spontaneously mid-run")
    ap.add_argument("--val_interval", type=int, default=0,
                    help="per-cell validation every N steps (0: never)")
    ap.add_argument("--grid", type=int, nargs=2, default=[2, 1],
                    help="cluster grid (num_cells = grid[0]*grid[1])")
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--n_train", type=int, default=28,
                    help="training images in the synthetic scene. Fine grids "
                         "need more: with a 4x2 grid, 28 ring cameras leave "
                         "each small cell so few distinct viewpoints that "
                         "submodules overfit them (train PSNR ~38) and grow "
                         "view-consistent floaters that only show up at "
                         "held-out angles — the reference's real scenes have "
                         "1000+ images per 8-cell split")
    ap.add_argument("--n_val", type=int, default=2)
    ap.add_argument("--scene", type=str, default="ring",
                    choices=["ring", "drone"],
                    help="synthetic scene: 'ring' = orbiting cameras around "
                         "two balls (the original toy); 'drone' = ground "
                         "plane + box buildings under a jittered oblique "
                         "camera lattice — the geometry the reference's "
                         "drone scenes (Mill 19 etc.) actually have, and "
                         "the honest setting for a 4x2 ground-footprint "
                         "cell split")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model/scene: wiring check on CPU")
    ap.add_argument("--distortion_loss_weight", type=float, default=0.0,
                    help="anti-floater regularizer for the per-cell "
                         "training (framework extension; 0 = reference "
                         "parity)")
    ap.add_argument("--medium", action="store_true",
                    help="4x128 model, 64+128 samples: CPU-runnable "
                         "convergence (hours), between --smoke and the "
                         "paper config")
    ap.add_argument("--bake", action="store_true",
                    help="also drive the L6 bake path on the merged model: "
                         "create_octree + a 2-frame render_images flythrough")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest per-cell checkpoint set in "
                         "the workdir (the worker can wedge mid-run; see "
                         "--ckpt_interval)")
    ap.add_argument("--batch_size", type=int, default=1024,
                    help="per-cell rays/step. The vmapped one-chip mode "
                         "materializes num_cells x batch x samples "
                         "activations: 8 cells fit at the paper 1024, a "
                         "5x5=25-cell grid needs ~512 on a 16 GB v5e")
    args = ap.parse_args()
    model_args = [
        "--coarse_samples", "256", "--fine_samples", "512",
        "--pos_xyz_dim", "12", "--pos_dir_dim", "4",
        "--layers", "8", "--skip_layers", "4",
        "--layer_dim", "256", "--bg_layer_dim", "256",
        "--appearance_dim", "48",
    ]
    if args.smoke:
        args.hw = 24
        # A 24x24 scene split 25 ways leaves border cells with a few
        # hundred masked rays — the paper batch would (loudly) starve them.
        args.batch_size = min(args.batch_size, 64)
        model_args = [
            "--coarse_samples", "32", "--fine_samples", "64",
            "--pos_xyz_dim", "6", "--pos_dir_dim", "2",
            "--layers", "2", "--skip_layers", "1",
            "--layer_dim", "32", "--bg_layer_dim", "32",
            "--appearance_dim", "8",
        ]
    elif args.medium:
        model_args = [
            "--coarse_samples", "64", "--fine_samples", "128",
            "--pos_xyz_dim", "10", "--pos_dir_dim", "4",
            "--layers", "4", "--skip_layers", "2",
            "--layer_dim", "128", "--bg_layer_dim", "128",
            "--appearance_dim", "16",
        ]

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)

    # Refuse silently reusing a workdir built for different scene/grid
    # flags: the dataset and masks stages are skipped when their artifacts
    # exist, so a changed --grid/--hw/--smoke would otherwise be ignored.
    stamp_path = work / "scene_config.json"
    stamp = {"grid": list(args.grid), "hw": args.hw, "smoke": bool(args.smoke),
             "n_train": args.n_train, "n_val": args.n_val,
             "scene": args.scene, "medium": bool(args.medium)}
    if stamp_path.exists():
        old = json.loads(stamp_path.read_text())
        # Keys absent from an older stamp were that version's defaults —
        # only a present-and-different value is a real config change.
        if any(old.get(k, v) != v for k, v in stamp.items()):
            raise SystemExit(
                f"workdir {work} was built with {old}, now asked for "
                f"{stamp}: pass a fresh --workdir (artifacts are reused "
                "as-is, the new flags would be silently ignored)"
            )
    else:
        stamp_path.write_text(json.dumps(stamp))

    # --- 1. synthetic scene (reference dataset layout, SURVEY §2.6) ---
    from tests.synthetic import make_drone_dataset, make_synthetic_dataset

    ds = work / "ds"
    if not (ds / "coordinates.pt").exists():
        print("building synthetic dataset...")
        if args.scene == "drone":
            make_drone_dataset(ds, n_train=args.n_train, n_val=args.n_val,
                               hw=(args.hw, args.hw))
        else:
            make_synthetic_dataset(ds, n_train=args.n_train,
                                   n_val=args.n_val, hw=(args.hw, args.hw))

    # --- 2. cluster masks: 2x1 grid ---
    import scripts.create_cluster_masks as ccm

    masks = work / "masks"
    if not (masks / "params.pt").exists():
        print("creating cluster masks...")
        ccm.main(Namespace(
            dataset_path=str(ds), segmentation_path=None, output=str(masks),
            grid_dim=list(args.grid), ray_samples=256, ray_chunk_size=48 * 1024,
            resume=False, ray_altitude_range=[-2.0, 2.0], near=0.5, far=3.5,
            center_pixels=True, cluster_2d=False, boundary_margin=1.15,
        ))

    # --- 3. ONE-program 2-cell training at paper model scale ---
    from mega_nerf_tpu.opts import get_opts_base, parse_opts
    from mega_nerf_tpu.runtime.cell_runner import CellRunner

    parser = get_opts_base()
    parser.add_argument("--exp_name", type=str, default=str(work / "sub"))
    parser.add_argument("--dataset_path", type=str, default=str(ds))
    hp = parse_opts(parser, [
        "--cluster_mask_path", str(masks),
        "--cell_axis", str(args.cell_axis),
        "--chunk_paths", str(work / "chunks"),
        "--num_chunks", "8",
        "--near", "0.5",
        "--ray_altitude_range", "-2.0", "2.0",
    ] + model_args + [
        "--distortion_loss_weight", str(args.distortion_loss_weight),
        "--batch_size", str(args.batch_size),
        "--lr", "5e-4", "--lr_decay_factor", "0.1",
        "--train_iterations", str(args.steps),
        "--ckpt_interval", str(args.ckpt_interval or args.steps),
        "--val_interval", str(args.val_interval or 10 * args.steps),
        "--val_scale_factor", "1",
        "--compute_dtype", "bfloat16",
    ])

    resume_from = 0
    if args.resume:
        # Latest checkpoint iteration present for EVERY cell (CellRunner's
        # _restore_cells restacks the siblings from any one of them).
        num_cells = args.grid[0] * args.grid[1]
        per_cell_iters = []
        for cell in range(num_cells):
            cell_dir = work / f"sub{cell}"
            iters = {
                (int(v.name), int(p.stem))
                for v in cell_dir.iterdir() if v.name.isdigit()
                for p in (v / "models").glob("*.ckpt")
            } if cell_dir.exists() else set()
            per_cell_iters.append(iters)
        common = set.intersection(*per_cell_iters) if per_cell_iters else set()
        if common:
            version, it = max(common, key=lambda vi: (vi[1], vi[0]))
            hp.ckpt_path = str(
                work / "sub0" / str(version) / "models" / f"{it}.ckpt"
            )
            resume_from = it
            print(f"resuming all cells from iteration {it} "
                  f"(version {version})")
        else:
            print("no common per-cell checkpoint found; training from scratch")

    t0 = time.perf_counter()
    runner = CellRunner(hp)
    num_cells = runner.num_cells
    runner.train()
    train_wall = time.perf_counter() - t0

    # --- 4. merge the per-cell checkpoints into one container ---
    import scripts.merge_submodules as ms

    merged = work / "merged.pt"
    mhp = parse_opts(get_opts_base(), [
        "--near", "0.5", "--ray_altitude_range", "-2.0", "2.0",
    ] + model_args + [
        "--train_iterations", str(args.steps),
    ])
    mhp.ckpt_prefix = str(work / "sub")
    mhp.centroid_path = str(masks / "params.pt")
    mhp.output = str(merged)
    mhp.torchscript = False
    ms.main(mhp)

    # --- 5. merged-model eval: right-half val PSNR ---
    from mega_nerf_tpu.runtime.runner import Runner

    eparser = get_opts_base()
    eparser.add_argument("--exp_name", type=str, default=str(work / "eval"))
    eparser.add_argument("--dataset_path", type=str, default=str(ds))
    ehp = parse_opts(eparser, [
        "--container_path", str(merged),
        "--near", "0.5", "--ray_altitude_range", "-2.0", "2.0",
    ] + model_args + [
        "--val_scale_factor", "1",
        "--compute_dtype", "bfloat16",
    ])
    eval_runner = Runner(ehp)
    eval_runner.eval()
    exp = sorted(
        (p for p in Path(ehp.exp_name).iterdir() if p.name.isdigit()),
        key=lambda p: int(p.name),
    )[-1]
    metrics = (exp / "metrics.txt").read_text()
    psnr = float(
        [l for l in metrics.splitlines() if "val/psnr" in l][0].split(":")[-1]
    )

    bake = {}
    if args.bake:
        # --- 6. octree bake + flythrough frames (reference README:90-109) ---
        import numpy as np

        import scripts.create_octree as co
        import scripts.render_images as ri
        from mega_nerf_tpu.data.torch_io import load_pt

        t0 = time.perf_counter()
        ohp = parse_opts(get_opts_base(), [
            "--near", "0.5", "--ray_altitude_range", "-2.0", "2.0",
        ] + model_args + ["--container_path", str(merged)])
        ohp.dataset_path = str(ds)
        ohp.output = str(work / "octree.npz")
        ohp.alpha_thresh = 0.01
        ohp.scale_alpha_thresh = 0.01
        ohp.tree_branch_n = 2
        ohp.init_grid_depth = 6
        ohp.samples_per_cell = 64
        # weight mode exercises the grid-weight visibility culling kernel
        # (the svox CUDA `_C.grid_weight_render` replacement).
        ohp.masking_mode = "weight"
        ohp.weight_thresh = 0.001
        ohp.embedding_index = 0
        meta0 = load_pt(ds / "train" / "metadata" / "000000.pt")
        # floats: int() truncation shifts projected rays up to a pixel and
        # mis-culls border voxels in the weight-mode visibility pass.
        fx0, fy0, cx0, cy0 = [float(v) for v in np.asarray(meta0["intrinsics"])]
        ohp.camera_params = [float(meta0["W"]), float(meta0["H"]),
                             fx0, fy0, cx0, cy0]
        co.main(ohp)
        bake["octree_seconds"] = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        fly = work / "flythrough"
        fly.mkdir(exist_ok=True)
        meta = load_pt(ds / "train" / "metadata" / "000000.pt")
        c2w = np.asarray(meta["c2w"]).reshape(-1)
        fly.joinpath("poses.txt").write_text(
            "\n".join(" ".join(str(v) for v in c2w) for _ in range(2)) + "\n"
        )
        fx, fy, cx, cy = np.asarray(meta["intrinsics"])
        w, h = int(meta["W"]), int(meta["H"])
        fly.joinpath("intrinsics.txt").write_text(
            f"{w} {h} {fx} {fy} {cx} {cy}\n" * 2
        )
        fly.joinpath("embeddings.txt").write_text("0\n1\n")
        rhp = parse_opts(get_opts_base(), [
            "--near", "0.5", "--ray_altitude_range", "-2.0", "2.0",
        ] + model_args + [
            "--container_path", str(merged), "--val_scale_factor", "1",
            "--compute_dtype", "bfloat16",
        ])
        rhp.input = str(fly)
        rhp.output = str(work / "frames")
        rhp.dataset_path = str(ds)
        rhp.centroids_path = str(masks / "params.pt")
        rhp.save_depth_npz = False
        rhp.resume = False
        ri.main(rhp)
        n_frames = len(list((work / "frames" / "rgbs").glob("*.jpg")))
        bake["flythrough_seconds"] = round(time.perf_counter() - t0, 1)
        bake["flythrough_frames"] = n_frames

    trained_steps = args.steps - resume_from
    summary = {
        "steps": args.steps,
        "num_cells": num_cells,
        "cell_axis": args.cell_axis,
        "train_wall_seconds": round(train_wall, 1),
        "cell_parallel_rays_per_sec": round(
            trained_steps * hp.batch_size * num_cells / train_wall, 1
        ) if trained_steps > 0 else 0.0,
        "merged_val_psnr": round(psnr, 3),
        **bake,
    }
    if resume_from:
        summary["resumed_from_iteration"] = resume_from
    with open(work / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
