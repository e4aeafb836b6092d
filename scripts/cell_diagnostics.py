"""Per-submodule density-field diagnostics for a merged Mega-NeRF.

The failure mode of spatially-partitioned training is the merge-time
FLOATER: a submodule places density inside its own routing region that is
consistent with every ray IT trained on, but wrong — visible as ghost
geometry when the merged mixture renders held-out views. (Observed here:
a 4x2-grid toy run whose cells each reached train PSNR ~38 merged to val
PSNR ~21, with ghost copies of scene geometry at cell boundaries; root
cause was viewpoint sparsity per cell — 28 ring cameras give a small cell
too few distinct directions to disambiguate in-cell density from
along-ray density. The reference's real scenes have 1000+ images per
8-cell split.)

This tool quantifies that per cell, from a merged container alone:

- occupancy: fraction of the cell's own Voronoi region with density above
  an opacity-relevant threshold;
- boundary disagreement: at points near routing boundaries (where the
  margin blend mixes submodules), the spread of per-submodule opacity
  predictions — seams and floaters show up as high disagreement;
- with --synthetic, exact false-positive/false-negative voxel counts
  against the analytic scene in `tests/synthetic.py`.

Usage:
  python scripts/cell_diagnostics.py --workdir .exp/cell_conv_4x2 \
      [--grid_res 33] [--synthetic] [--sigma_thresh 5.0]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, required=True,
                    help="cell_convergence_run workdir (masks/ + merged.pt)")
    ap.add_argument("--container", type=str, default=None,
                    help="merged container path (default {workdir}/merged.pt)")
    ap.add_argument("--grid_res", type=int, default=33)
    ap.add_argument("--extent", type=float, default=1.2,
                    help="probe cube half-extent around the origin")
    ap.add_argument("--sigma_thresh", type=float, default=5.0,
                    help="density treated as occupied (alpha ~ 6%% at the "
                         "paper config's ~0.012 sample spacing)")
    ap.add_argument("--boundary_margin", type=float, default=1.15)
    ap.add_argument("--synthetic", action="store_true",
                    help="score against tests/synthetic.py's analytic scene")
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--skip_layers", type=int, nargs="*", default=[4])
    ap.add_argument("--layer_dim", type=int, default=256)
    ap.add_argument("--bg_layer_dim", type=int, default=256)
    ap.add_argument("--pos_xyz_dim", type=int, default=12)
    ap.add_argument("--pos_dir_dim", type=int, default=4)
    ap.add_argument("--appearance_dim", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from argparse import Namespace

    from mega_nerf_tpu.models.container import (
        container_to_bundles,
        load_container,
    )

    work = Path(args.workdir)
    container = Path(args.container or work / "merged.pt")
    hp = Namespace(
        boundary_margin=args.boundary_margin, layers=args.layers,
        skip_layers=args.skip_layers, layer_dim=args.layer_dim,
        bg_layer_dim=args.bg_layer_dim, pos_xyz_dim=args.pos_xyz_dim,
        pos_dir_dim=args.pos_dir_dim, appearance_dim=args.appearance_dim,
        affine_appearance=False, sh_deg=None, shifted_softplus=True,
        use_cascade=False, mega_routing="auto", routing_max_experts=4,
    )
    data = load_container(container)
    fg, _bg = container_to_bundles(data, hp)
    cent = np.asarray(data.centroids, np.float32)
    k_cells = cent.shape[0]

    n = args.grid_res
    g = np.linspace(-args.extent, args.extent, n, dtype=np.float32)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)

    dists = np.linalg.norm(pts[:, None, :] - cent[None], axis=-1)
    owner = dists.argmin(1)
    # Boundary band: the margin blend is active where the runner-up
    # distance is within boundary_margin of the winner's.
    part = np.partition(dists, 1, axis=1)
    boundary = part[:, 1] <= args.boundary_margin * part[:, 0]

    truth_occ = None
    if args.synthetic:
        from tests.synthetic import scene_density_color

        true_sigma, _ = scene_density_color(jnp.asarray(pts))
        truth_occ = np.asarray(true_sigma) > 1.0

    dirs = np.zeros_like(pts)
    dirs[:, 0] = 1.0
    idx = np.zeros((pts.shape[0],), np.int32)

    @jax.jit
    def sigma_of(params_k):
        out = fg.module.apply(
            {"params": params_k}, jnp.asarray(pts), jnp.asarray(dirs),
            jnp.asarray(idx), None, True,
        )
        return out[..., 0] if out.ndim > 1 else out

    sigmas = np.stack([
        np.asarray(sigma_of(jax.tree.map(lambda x: x[k], fg.pretrained_params)))
        for k in range(k_cells)
    ])  # (K, P)

    # Opacity over one paper-config sample step, for scale-free comparison.
    alpha = 1.0 - np.exp(-np.maximum(sigmas, 0.0) * 0.012)

    rows = []
    for k in range(k_cells):
        own = owner == k
        occ = sigmas[k] > args.sigma_thresh
        row = {
            "cell": k,
            "centroid": [round(float(v), 3) for v in cent[k]],
            "own_points": int(own.sum()),
            "own_occupied_frac": round(float(occ[own].mean()), 4),
            # disagreement where this cell's blend actually mixes:
            "boundary_alpha_spread": round(float(
                np.abs(
                    alpha[k][own & boundary]
                    - np.max(
                        np.where(
                            np.arange(k_cells)[:, None] == k, -1.0, alpha
                        ),
                        axis=0,
                    )[own & boundary]
                ).mean()
            ) if (own & boundary).any() else 0.0, 4),
        }
        if truth_occ is not None:
            fp = occ & ~truth_occ & own
            fn = ~occ & truth_occ & own
            row["floater_voxels"] = int(fp.sum())
            row["missing_voxels"] = int(fn.sum())
            row["floater_frac_of_region"] = round(float(fp.sum() / own.sum()), 4)
        rows.append(row)
        print(json.dumps(row))

    summary = {
        "container": str(container),
        "cells": k_cells,
        "grid_res": n,
        "boundary_band_frac": round(float(boundary.mean()), 4),
    }
    if truth_occ is not None:
        summary["total_floater_voxels"] = int(
            sum(r["floater_voxels"] for r in rows)
        )
        summary["total_missing_voxels"] = int(
            sum(r["missing_voxels"] for r in rows)
        )
    print(json.dumps(summary))
    out = work / "cell_diagnostics.json"
    out.write_text(json.dumps({"cells": rows, "summary": summary}, indent=2))


if __name__ == "__main__":
    main()
