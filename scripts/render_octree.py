"""Render preview frames directly from a baked octree (.npz).

In-framework validation/preview of `create_octree.py` output — the
reference can only inspect bakes through the external Mega-NeRF-Dynamic
viewer. Renders dataset views (reporting PSNR against their ground truth)
or arbitrary poses from a `render_images.py`-style input dir.

Usage:
  python scripts/render_octree.py --tree tree.npz --dataset_path DS \
      [--split val] [--steps 256] [--output outdir]
  python scripts/render_octree.py --tree tree.npz --input poses_dir \
      --output outdir
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", type=str, required=True)
    ap.add_argument("--dataset_path", type=str, default=None)
    ap.add_argument("--split", type=str, default="val")
    ap.add_argument("--input", type=str, default=None,
                    help="render_images.py-style dir (poses.txt, "
                         "intrinsics.txt)")
    ap.add_argument("--output", type=str, default=None)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--near", type=float, default=0.5)
    ap.add_argument("--far", type=float, default=4.0)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    import jax

    from mega_nerf_tpu.octree.n3tree import N3Tree
    from mega_nerf_tpu.octree.render import render_octree_rays
    from mega_nerf_tpu.ops.metrics import psnr
    from mega_nerf_tpu.ops.rays import get_ray_directions, get_rays

    import jax.numpy as jnp

    tree = N3Tree.load(args.tree)
    print(tree)

    views = []
    if args.dataset_path is not None:
        from mega_nerf_tpu.data.torch_io import load_pt

        ds = Path(args.dataset_path)
        for p in sorted((ds / args.split / "metadata").iterdir()):
            md = load_pt(p)
            img_path = None
            for ext in (".png", ".jpg"):
                cand = ds / args.split / "rgbs" / (p.stem + ext)
                if cand.exists():
                    img_path = cand
            views.append((p.stem, md, img_path))
    else:
        assert args.input is not None, "need --dataset_path or --input"
        inp = Path(args.input)
        poses = np.loadtxt(inp / "poses.txt").reshape(-1, 3, 4)
        intr = np.loadtxt(inp / "intrinsics.txt").reshape(-1, 6)
        for i, (c2w, (w, h, fx, fy, cx, cy)) in enumerate(zip(poses, intr)):
            md = {"W": int(w), "H": int(h),
                  "intrinsics": np.array([fx, fy, cx, cy], np.float32),
                  "c2w": c2w.astype(np.float32)}
            views.append((f"{i:06d}", md, None))

    out = Path(args.output) if args.output else None
    if out is not None:
        out.mkdir(parents=True, exist_ok=True)

    metrics = {}
    for stem, md, img_path in views:
        w, h = int(md["W"]), int(md["H"])
        fx, fy, cx, cy = [float(v) for v in np.asarray(md["intrinsics"])]
        dirs = get_ray_directions(w, h, fx, fy, cx, cy, True)
        rays = np.asarray(
            get_rays(dirs, jnp.asarray(np.asarray(md["c2w"], np.float32)),
                     args.near, args.far)
        ).reshape(-1, 8)
        res = render_octree_rays(tree, rays, steps=args.steps)
        rgb = res["rgb"].reshape(h, w, 3)
        if out is not None:
            Image.fromarray(
                (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            ).save(out / f"{stem}.jpg")
        if img_path is not None:
            gt = np.asarray(Image.open(img_path), np.float32) / 255.0
            metrics[stem] = round(float(np.asarray(
                psnr(jnp.asarray(rgb), jnp.asarray(gt))
            )), 3)
            print(f"{stem}: octree-render PSNR {metrics[stem]}")

    summary = {"tree": args.tree, "views": len(views)}
    if metrics:
        summary["mean_psnr"] = round(
            float(np.mean(list(metrics.values()))), 3
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
