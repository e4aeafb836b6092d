"""Bake a dense occupancy grid over the FULL foreground region.

Probes the model's sigma on a res^3 grid spanning the fg ellipsoid's AABB
(every fg sample position lies inside the ellipsoid, hence inside this
box — `render/rendering.py:660-667`) and thresholds at the sigma whose
single-voxel crossing adds `--alpha_thresh` alpha. The output `.npz`
feeds `--occupancy_path` (render/ray_bounds.load_occupancy).

Why not reuse the viewer octree (scripts/create_octree.py)? Its bake
auto-scales its box to the dense content — measured on the 4x2 drone
scene, that box covers only ~1/4 of the fg-reachable region, and ray
segments outside it must conservatively count occupied, neutralizing the
tightening (PERF.md round 4). This bake covers everything fg sampling can
reach, so "unoccupied" is a statement about the model itself.

Cost: res=256 is 16.8M sigma probes through the merged mixture — ~1 min
on one v5e chip (the probes walk the grid in spatial order, so the
octree bake's point culler collapses the K-cell blend per chunk).

Usage: python scripts/bake_occupancy.py --container <merged.pt>
    --dataset_path <ds> --output occupancy.npz [--res 256]
    [--alpha_thresh 0.01]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    from mega_nerf_tpu.opts import get_opts_base, parse_opts

    parser = get_opts_base()
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--res", type=int, default=256)
    parser.add_argument("--alpha_thresh", type=float, default=0.01)
    hparams = parse_opts(parser, sys.argv[1:])
    bake_occupancy(hparams)


def bake_occupancy(hparams) -> None:
    import scripts.create_octree as co
    from mega_nerf_tpu.runtime.runner import EVAL_POINT_BUDGET, Runner

    # The Runner derives the exact fg ellipsoid the renderer will use
    # (altitude-pinned camera copies, ellipse_scale_factor — runner.py);
    # probing its AABB guarantees every fg sample position is inside the
    # grid, so "unoccupied" is a statement about the model, never about
    # coverage.
    runner = Runner(hparams, set_experiment_path=False)
    state = runner.make_eval_state()
    bundle, params = runner.fg, state.fg_params
    if runner.sphere_radius is not None:
        center = np.asarray(runner.sphere_center, np.float64)
        radius = np.asarray(runner.sphere_radius, np.float64)
        lo, hi = center - radius, center + radius
    else:
        # No ellipsoid (fg-only scene): fg samples lie within `far` of
        # some camera.
        cams = np.stack(
            [x.c2w[:3, 3] for x in runner.train_items + runner.val_items]
        )
        lo = cams.min(0) - runner.far
        hi = cams.max(0) + runner.far

    res = int(hparams.res)
    voxel = float((hi - lo).max()) / res
    sigma_thresh = -np.log(1.0 - hparams.alpha_thresh) / voxel

    # TPU-sized probe batches: the reference's GPU-sized model_chunk_size
    # (32k) costs ~0.4 s of relay latency per dispatch (PERF.md, octree
    # bake); take the larger of it and the eval point budget.
    chunk = max(int(hparams.model_chunk_size or 0), EVAL_POINT_BUDGET // 64)
    culler = co._make_point_culler(hparams, bundle, params)
    sigma_at = co._make_sigma_fn(bundle, params, chunk, culler)

    grid = np.zeros((res, res, res), bool)
    # Probe plane-by-plane in spatial order (keeps the point culler's
    # active sets local and the host arrays small).
    arr = (np.arange(res, dtype=np.float32) + 0.5) / res
    planes_per_batch = max(1, (2 * chunk) // (res * res))
    for x0 in range(0, res, planes_per_batch):
        xs = arr[x0 : x0 + planes_per_batch]
        g = np.stack(np.meshgrid(xs, arr, arr, indexing="ij"), axis=-1)
        pts = lo + g.reshape(-1, 3) * (hi - lo)
        sig = np.asarray(sigma_at(pts.astype(np.float32))).reshape(
            len(xs), res, res
        )
        grid[x0 : x0 + planes_per_batch] = sig >= sigma_thresh

    invradius = 1.0 / (hi - lo)
    offset = -lo * invradius  # world -> [0,1]: x*invradius + offset
    np.savez_compressed(
        hparams.output,
        occupancy=np.packbits(grid.reshape(-1)),
        res=np.int64(res),
        invradius3=invradius.astype(np.float32),
        offset=offset.astype(np.float32),
        sigma_thresh=np.float32(sigma_thresh),
    )
    print(
        f"occupancy {res}^3 over {np.round(lo, 2)}..{np.round(hi, 2)}: "
        f"{100.0 * grid.mean():.1f}% occupied "
        f"(sigma_thresh {sigma_thresh:.3f}) -> {hparams.output}"
    )


if __name__ == "__main__":
    main()
