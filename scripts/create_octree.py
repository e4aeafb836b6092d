"""Bake a trained model into a sparse voxel octree for the dynamic viewer.

Parity target: reference `scripts/create_octree.py` (PlenOctree-style
extraction): auto-scale the bounds by probing sigma on a coarse grid,
evaluate sigma at 2^(d+1)^3 resolution, mask voxels by sigma threshold or by
max camera-visibility weight (our jax `grid_weight_render_max` replaces the
svox CUDA kernel), refine the tree at surviving voxels, average
`samples_per_cell` model queries per leaf (fixed +x view dir, fixed
appearance index), fill internal nodes, and save the svox-layout `.npz`.
"""

from __future__ import annotations

import dataclasses
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from mega_nerf_tpu.data.torch_io import load_coordinates, load_pt
from mega_nerf_tpu.models.factory import make_nerf
from mega_nerf_tpu.octree import N3Tree, grid_weight_render_max
from mega_nerf_tpu.opts import get_opts_base, parse_opts
from mega_nerf_tpu.render.cell_cull import (
    ParamSubsetCache,
    active_cells_for_points,
)
from mega_nerf_tpu.runtime.logging import main_print, main_tqdm


def _get_extraction_opts() -> Namespace:
    parser = get_opts_base()
    parser.add_argument('--dataset_path', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--alpha_thresh', type=float, default=0.01)
    parser.add_argument('--scale_alpha_thresh', type=float, default=0.01)
    parser.add_argument('--tree_branch_n', type=int, default=2)
    parser.add_argument('--init_grid_depth', type=int, default=8)
    parser.add_argument('--samples_per_cell', type=int, default=256)
    parser.add_argument('--masking_mode', type=str, default='weight',
                        choices=['sigma', 'weight'])
    parser.add_argument('--weight_thresh', type=float, default=0.001)
    parser.add_argument('--embedding_index', type=int, default=0)
    parser.add_argument('--camera_params', type=int, nargs='+',
                        default=[800, 800, 400, 400, 400, 400])
    return parse_opts(parser, known_only=True)


def _point_chunk(hparams, bundle) -> int:
    """Points per device dispatch for the octree probes.

    The reference's `model_chunk_size` (32k, `opts.py:76`) is a GPU memory
    knob; dispatched as-is over the TPU transport each call costs ~0.4 s of
    round-trip latency and a 512^3 grid probe becomes 4096 dispatches
    (~27 min of pure latency, observed). Batch up to half the eval point
    budget per submodule instead (the dense mega blend evaluates every
    submodule on every point; half leaves XLA-path headroom) — the same
    probe in ~4 dispatches."""
    from mega_nerf_tpu.runtime.runner import EVAL_POINT_BUDGET

    n_sub = int(bundle.centroids.shape[0]) if bundle.is_mega else 1
    return max(hparams.model_chunk_size, EVAL_POINT_BUDGET // (2 * n_sub))


def _make_point_culler(hparams, bundle, params):
    """Per-chunk exact submodule culling for the bake's point probes
    (render/cell_cull.py). The probes walk grid/leaf points in spatial
    order, so each chunk's AABB overlaps 1-2 cells of the routing grid —
    the dense blend's K x MLP FLOPs drop to the local cells' with
    unchanged outputs. Returns `inputs(points_np) -> (params_subset,
    centroids_subset)` or None when culling doesn't apply. Build it ONCE
    and share between the sigma and RGBA probes: the cache holds a device
    copy of the gathered param rows per distinct active set.

    Gated by --bake_cell_cull, NOT the serving --no_cell_cull flag: the
    warm-cache bake A/B measured cull-on 1.39x SLOWER at K=8 (83.4 s vs
    60.0 s on the 4x2 drone bake, trees identical), and the K=25 bake on
    the 5x5 workflow container measured cull-on slower cold as well
    (~25 min vs 14.5 min; leaf data 1 f16 ulp apart on ~1% of values —
    blend-reduction-order noise) — PERF.md round 5. The probes' MLP time
    is small next to per-chunk mask math, param-subset gathers and
    executable switching at every measured K, so 'auto' is OFF; 'on'
    remains the opt-in for a future measurement that flips it."""
    mode = str(getattr(hparams, "bake_cell_cull", "auto"))
    k = int(bundle.centroids.shape[0]) if bundle.is_mega else 1
    if mode != "on":
        return None
    if not (
        getattr(hparams, "cell_cull", True)
        and bundle.is_mega
        and not bundle.use_routed
        and k > 1
    ):
        return None
    centroids = np.asarray(bundle.centroids, np.float32)
    cache = ParamSubsetCache(
        params, centroids,
        jax.jit(lambda p, i: jax.tree.map(lambda x: x[i], p)),
        jnp.asarray,
    )

    def inputs(points: np.ndarray):
        # points stay host-side numpy here — the mask math is host work.
        mask = active_cells_for_points(
            points, centroids, bundle.boundary_margin,
            bundle.cluster_dim_start,
        )
        return cache.get(mask)

    return inputs


def _make_sigma_fn(bundle, params, chunk: int, culler=None):
    if culler is None:
        apply = jax.jit(
            lambda p, xyz: bundle.apply(p, "fine", xyz, sigma_only=True)
        )
        probe = lambda pts: apply(params, jnp.asarray(pts))
    else:
        # Culled centroids arrive as a traced ARGUMENT: one compile per
        # active COUNT, and jit can never serve a stale closure constant.
        apply = jax.jit(
            lambda p, c, xyz: dataclasses.replace(bundle, centroids=c).apply(
                p, "fine", xyz, sigma_only=True
            )
        )

        def probe(pts):
            sub_params, sub_centroids = culler(pts)
            return apply(sub_params, sub_centroids, jnp.asarray(pts))

    def sigma_at(points: np.ndarray) -> np.ndarray:
        # Pad to a chunk multiple: a remainder-sized final call would be a
        # separate (expensive) XLA compile per distinct grid size.
        n = points.shape[0]
        n_pad = -(-n // chunk) * chunk
        if n_pad != n:
            points = np.concatenate(
                [points, np.tile(points[-1:], (n_pad - n, 1))]
            )
        out = []
        for i in range(0, n_pad, chunk):
            out.append(np.asarray(probe(points[i:i + chunk])))
        return np.concatenate(out)[:n, 0]

    return sigma_at


def _grid_points(reso: int, offset: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Cell-center world points of a reso^3 grid over the tree volume
    (reference `create_octree.py:71-76`, same meshgrid('ij') order)."""
    arr = (np.arange(reso, dtype=np.float32) + 0.5) / reso
    axes = [(arr - offset[i]) / scale[i] for i in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"))
    return g.reshape(3, -1).T


def auto_scale(hparams, sigma_at, center, radius):
    """Shrink the AABB to the sigma-occupied region
    (reference `create_octree.py:61-105`)."""
    main_print("Step 0: Auto scale")
    reso = 2 ** hparams.init_grid_depth
    radius = np.asarray(radius, np.float32)
    center = np.asarray(center, np.float32)
    scale = 0.5 / radius
    offset = 0.5 * (1.0 - center / radius)

    grid = _grid_points(reso, offset, scale)
    approx_delta = 2.0 / reso
    sigma_thresh = -np.log(1.0 - hparams.scale_alpha_thresh) / approx_delta

    sigmas = sigma_at(grid)
    occupied = grid[sigmas >= sigma_thresh]
    if occupied.shape[0] == 0:
        main_print("WARNING: no occupied cells during auto-scale; keeping bounds")
        return center.tolist(), radius.tolist()
    lc = occupied.min(axis=0) - 0.5 / reso
    uc = occupied.max(axis=0) + 0.5 / reso
    return ((lc + uc) * 0.5).tolist(), ((uc - lc) * 0.5).tolist()


def step1_refine(hparams, sigma_at, tree: N3Tree, poses: np.ndarray) -> None:
    """Grid eval + visibility mask + refinement
    (reference `create_octree.py:139-186`)."""
    main_print("Step 1: Grid eval")
    reso = 2 ** (hparams.init_grid_depth + 1)
    grid = _grid_points(reso, tree.offset, tree.invradius)

    approx_delta = 2.0 / reso
    sigma_thresh = -np.log(1.0 - hparams.alpha_thresh) / approx_delta
    sigmas = sigma_at(grid)

    if hparams.masking_mode == "sigma":
        mask = sigmas >= sigma_thresh
    elif hparams.masking_mode == "weight":
        main_print("Calculating grid weights")
        weights = grid_weight_render_max(
            sigmas, poses, hparams.camera_params, tree.offset, tree.invradius,
            reso,
        )
        mask = weights.reshape(-1) >= hparams.weight_thresh
    else:
        raise Exception(f"Unsupported masking mode: {hparams.masking_mode}")

    grid = grid[mask]
    main_print(f"Building octree over {grid.shape[0]} occupied voxels")
    for _ in range(hparams.init_grid_depth):
        if tree.refine_at_points(grid) == 0:
            break
    main_print(repr(tree))


def step2_average(hparams, bundle, params, tree: N3Tree,
                  culler=None) -> None:
    """Average model queries per leaf (reference `create_octree.py:189-209`)."""
    main_print(f"Step 2: AA with {hparams.samples_per_cell} samples per cell")
    rng = np.random.default_rng(hparams.random_seed)
    leaves = tree.leaf_indices()
    chunk = max(
        1, _point_chunk(hparams, bundle) // hparams.samples_per_cell
    )
    # Pad the leaf list to a chunk multiple (same single-compile argument
    # as sigma_at); the padded tail re-evaluates leaf 0 and is dropped.
    n_leaves = leaves.shape[0]
    n_pad = -(-n_leaves // chunk) * chunk
    if n_pad != n_leaves:
        leaves = np.concatenate(
            [leaves, np.repeat(leaves[:1], n_pad - n_leaves, axis=0)], axis=0
        )

    @jax.jit
    def eval_rgba(p, c, pts, dirs, idx):
        b = bundle if c is None else dataclasses.replace(bundle, centroids=c)
        out = b.apply(
            p, "fine", pts,
            dirs if bundle.config.pos_dir_dim > 0 else None,
            idx if bundle.config.appearance_dim > 0 else None,
        )
        return out

    for i in main_tqdm(range(0, leaves.shape[0], chunk)):
        batch_leaves = leaves[i : i + chunk]
        pts = tree.sample_leaves(batch_leaves, hparams.samples_per_cell, rng)
        flat = pts.reshape(-1, 3)
        dirs = np.zeros_like(flat)
        dirs[:, 0] = 1.0  # fixed +x view dir (reference create_octree.py:198-199)
        idx = np.full(flat.shape[0], hparams.embedding_index, np.int32)

        p_in, c_in = (params, None) if culler is None else culler(flat)
        out = np.asarray(
            eval_rgba(p_in, c_in, jnp.asarray(flat), jnp.asarray(dirs),
                      jnp.asarray(idx))
        )
        # svox/PlenOctree layout: [rgb-or-SH..., sigma] with density LAST —
        # exactly the model's output order (reference create_octree.py:206-209
        # writes it through unchanged).
        values = out.reshape(
            batch_leaves.shape[0], hparams.samples_per_cell, -1
        ).mean(axis=1)
        valid = min(chunk, n_leaves - i)
        tree.set_leaf_data(batch_leaves[:valid], values[:valid])


def main(hparams: Namespace) -> None:
    assert hparams.ckpt_path is not None or hparams.container_path is not None
    assert hparams.ray_altitude_range is not None

    dataset_path = Path(hparams.dataset_path)
    candidates = sorted((dataset_path / "train" / "metadata").iterdir())
    train_paths = [
        candidates[i] for i in range(0, len(candidates), hparams.train_every)
    ]
    metadata_paths = train_paths + list(
        (dataset_path / "val" / "metadata").iterdir()
    )
    poses = np.stack(
        [np.asarray(load_pt(p)["c2w"], np.float32) for p in metadata_paths]
    )

    # Joint-mega checkpoints (--train_mega_nerf) carry stacked submodule
    # params: hook up the centroid metadata exactly like Runner.__init__ so
    # make_nerf builds the mixture bundle they load into.
    if getattr(hparams, "train_mega_nerf", None) is not None:
        hparams._mega_centroid_metadata = load_pt(hparams.train_mega_nerf)
    bundle = make_nerf(hparams, poses.shape[0])
    params = bundle.pretrained_params
    if params is None:
        from mega_nerf_tpu.models.factory import make_bg_nerf
        from mega_nerf_tpu.parallel.train_step import (
            make_optimizer,
            make_train_state,
        )
        from mega_nerf_tpu.runtime import checkpoints as ckpt_io

        opt = make_optimizer(hparams.lr, hparams.lr_decay_factor,
                             hparams.train_iterations)
        # The checkpoint template must match the TrainState the run SAVED:
        # a training run with a background NeRF serialized bg params +
        # bg opt state too (runner._save_checkpoint), even though the bake
        # only consumes the foreground weights.
        bg_bundle = (
            make_bg_nerf(hparams, poses.shape[0]) if hparams.bg_nerf
            else None
        )
        template = make_train_state(bundle, bg_bundle, opt,
                                    jax.random.PRNGKey(0))
        state, _ = ckpt_io.load_checkpoint(hparams.ckpt_path, template)
        params = state.fg_params

    coords = load_coordinates(dataset_path)
    origin_drb = coords["origin_drb"]
    pose_scale_factor = coords["pose_scale_factor"]

    max_values = poses[:, :3, 3].max(axis=0)
    min_values = poses[:, :3, 3].min(axis=0)
    ray_altitude_range = [
        (x - origin_drb[0]) / pose_scale_factor
        for x in hparams.ray_altitude_range
    ]
    min_values[0] = ray_altitude_range[0]
    max_values[0] = ray_altitude_range[1]
    main_print(f"Min and Max values: {min_values} {max_values}")

    center = ((max_values + min_values) * 0.5).tolist()
    radius = ((max_values - min_values) * 0.5).tolist()
    main_print(f"Center and radius before autoscale: {center}, {radius}")

    culler = _make_point_culler(hparams, bundle, params)
    sigma_at = _make_sigma_fn(
        bundle, params, _point_chunk(hparams, bundle), culler
    )
    center, radius = auto_scale(hparams, sigma_at, center, radius)
    main_print(f"Center and radius after autoscale: {center}, {radius}")

    sh_deg = hparams.sh_deg if hparams.sh_deg is not None else 0
    data_dim = 1 + 3 * (sh_deg + 1) ** 2
    data_format = f"SH{(sh_deg + 1) ** 2}" if sh_deg > 0 else "RGBA"
    main_print(f"Data dim is {data_dim}")

    tree = N3Tree(
        N=hparams.tree_branch_n,
        data_dim=data_dim,
        depth_limit=hparams.init_grid_depth,
        init_reserve=500000,
        radius=radius,
        center=center,
        data_format=data_format,
    )

    step1_refine(hparams, sigma_at, tree, poses)
    step2_average(hparams, bundle, params, tree, culler)

    tree.shrink_to_fit()
    main_print("Filling in internal nodes")
    tree.fill_internal()
    main_print(repr(tree))
    main_print(f"Saving tree to: {hparams.output}")
    tree.save(hparams.output, compress=False)


if __name__ == '__main__':
    main(_get_extraction_opts())
