"""Octree-bake submodule-culling A/B on a merged MegaNeRF container.

Times `scripts/create_octree.py` (reference analogue:
`/root/reference/scripts/create_octree.py`) with per-chunk exact submodule
culling (render/cell_cull.py) ON vs OFF at the cell_convergence_run bake
config, asserts the two trees are identical (culling is exact; the f16
leaf quantization absorbs f32 blend-reduction-order noise — verified
bit-identical on the 4x2 drone bake), and prints one JSON line with both
wall times.

The bake's probes walk grid/leaf points in spatial order, so each chunk's
AABB touches 1-2 cells of the routing grid — the dense blend's K x MLP
FLOPs collapse to the local cells'. Power-of-two bucketing
(cell_cull.bucket_mask) caps the per-subset-size renderer compiles at
log2(K)+1: the unbucketed cull measured SLOWER than no cull at all
(249.6 s vs 109.4 s on the 4x2 bake) because nearly K distinct subset
sizes each paid a ~40 s XLA compile over the relay.

Usage: python scripts/octree_cull_bench.py --container <merged.pt>
    --dataset_path <ds> [--workdir .exp/octree_ab]
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
    ap.add_argument("--workdir", type=str, default=".exp/octree_ab")
    ap.add_argument("--init_grid_depth", type=int, default=6)
    ap.add_argument("--samples_per_cell", type=int, default=64)
    ap.add_argument("--model_args", type=str, default=(
        "--coarse_samples 256 --fine_samples 512 "
        "--pos_xyz_dim 12 --pos_dir_dim 4 --layers 8 --skip_layers 4 "
        "--layer_dim 256 --bg_layer_dim 256 --appearance_dim 48"
    ))
    args = ap.parse_args()

    import scripts.create_octree as co
    from mega_nerf_tpu.data.torch_io import load_pt
    from mega_nerf_tpu.opts import get_opts_base, parse_opts

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    ds = Path(args.dataset_path)
    meta0 = load_pt(next(iter(sorted((ds / "train" / "metadata").iterdir()))))
    fx0, fy0, cx0, cy0 = [float(v) for v in np.asarray(meta0["intrinsics"])]

    results = {}
    for name, extra in [
        ("cull_on", ["--bake_cell_cull", "on"]),
        ("cull_off", ["--bake_cell_cull", "off"]),
    ]:
        ohp = parse_opts(get_opts_base(), [
            "--near", "0.5", "--ray_altitude_range", "-2.0", "2.0",
        ] + args.model_args.split() + extra + [
            "--container_path", args.container,
        ])
        ohp.dataset_path = str(ds)
        ohp.output = str(work / f"octree_{name}.npz")
        ohp.alpha_thresh = 0.01
        ohp.scale_alpha_thresh = 0.01
        ohp.tree_branch_n = 2
        ohp.init_grid_depth = args.init_grid_depth
        ohp.samples_per_cell = args.samples_per_cell
        ohp.masking_mode = "weight"
        ohp.weight_thresh = 0.001
        ohp.embedding_index = 0
        ohp.camera_params = [float(meta0["W"]), float(meta0["H"]),
                             fx0, fy0, cx0, cy0]
        t0 = time.time()
        co.main(ohp)
        results[name] = {"wall_s": round(time.time() - t0, 1)}
        print(f"{name}:", json.dumps(results[name]), flush=True)

    on = np.load(work / "octree_cull_on.npz")
    off = np.load(work / "octree_cull_off.npz")
    # Culling is exact in exact arithmetic, but the culled probes SUM the
    # blend over the active subset — a different f32 reduction order than
    # the dense K-way einsum. At K=8 the f16 leaf quantization absorbed
    # that noise (bit-identical trees, PERF.md round 4); at K=25 ~1% of
    # leaf values land 1 f16 ulp apart (measured max |diff| 0.03125 = one
    # ulp at magnitude ~32). Structure must match exactly; leaf data to
    # within 2 ulp-scaled steps.
    structural = set(on.files) == set(off.files) and all(
        on[k].shape == off[k].shape and (on[k] == off[k]).all()
        for k in on.files if k != "data"
    )
    a = np.asarray(on["data"], np.float32)
    b = np.asarray(off["data"], np.float32)
    ulp = np.spacing(np.maximum(np.abs(a), np.abs(b)).astype(np.float16))
    ulp = np.asarray(ulp, np.float32)
    data_close = a.shape == b.shape and bool(
        (np.abs(a - b) <= 2.0 * np.maximum(ulp, np.float32(1e-6))).all()
    )
    results["trees_identical"] = bool(structural and (a == b).all())
    results["trees_match"] = bool(structural and data_close)
    results["leaf_diff_frac"] = round(float((a != b).mean()), 5)
    assert structural and data_close, (
        "culled bake diverged from the dense bake beyond f16 "
        "reduction-order noise"
    )
    results["speedup"] = round(
        results["cull_off"]["wall_s"] / results["cull_on"]["wall_s"], 2
    )
    print(json.dumps({"metric": "octree_bake_cull_ab", "results": results}))


if __name__ == "__main__":
    main()
