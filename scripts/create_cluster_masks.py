"""Spatial partitioner: per-image boolean masks of rays per grid cell.

Parity target: reference `scripts/create_cluster_masks.py`. For a
`grid_dim[0] x grid_dim[1]` grid of centroids over the camera y/z extent
(altitude zeroed), every image ray is sampled at `ray_samples` depths; a ray
belongs to cluster j iff min over samples of (dist_to_j / dist_to_nearest)
<= boundary_margin. Outputs (identical on-disk contract, SURVEY §2.6):

- `{output}/params.pt`: origin/scale/near/far/altitude/centroids/grid_dim/
  min/max position/cluster_2d;
- `{output}/{j}/{stem}.pt`: zip(torch) bool HxW masks per cluster.

TPU-native redesign: the per-ray min-distance-ratio pass is one jitted
jnp program per image chunk (cdist -> min over samples), not a nested torch
chunk loop. Images shard over jax processes (`process_index::process_count`
replacing the reference's RANK striding); `--resume` revalidates existing
zips like the reference.
"""

from __future__ import annotations

import sys
import traceback
from argparse import Namespace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mega_nerf_tpu.data.torch_io import load_coordinates, load_mask_zip, load_pt, save_mask_zip, save_pt
from mega_nerf_tpu.opts import get_opts_base, parse_opts
from mega_nerf_tpu.ops.rays import get_ray_directions, get_rays
from mega_nerf_tpu.runtime.logging import main_print, main_tqdm, sync_processes


def _get_mask_opts() -> Namespace:
    parser = get_opts_base()
    parser.add_argument('--dataset_path', type=str, required=True)
    parser.add_argument('--segmentation_path', type=str, default=None)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--grid_dim', nargs='+', type=int, required=True)
    parser.add_argument('--ray_samples', type=int, default=1000)
    parser.add_argument('--ray_chunk_size', type=int, default=48 * 1024)
    parser.add_argument('--resume', default=False, action='store_true')
    return parse_opts(parser, known_only=True)


def make_centroids(grid_dim, min_position: np.ndarray, max_position: np.ndarray
                   ) -> np.ndarray:
    """2D grid of centroids over the y/z camera extent, altitude = 0
    (reference `create_cluster_masks.py:73-80`)."""
    ranges = max_position[1:] - min_position[1:]
    gy, gz = grid_dim
    off_y = np.arange(gy) * ranges[0] / gy + ranges[0] / (gy * 2)
    off_z = np.arange(gz) * ranges[1] / gz + ranges[1] / (gz * 2)
    centroids = np.zeros((gy, gz, 3), np.float32)
    centroids[:, :, 1] = min_position[1] + off_y[:, None]
    centroids[:, :, 2] = min_position[2] + off_z[None, :]
    return centroids.reshape(-1, 3)


def min_dist_ratios_for_rays(
    rays: jnp.ndarray,  # (N, 8)
    centroids: jnp.ndarray,  # (K, 3)
    ray_samples: int,
    cluster_dim_start: int,
    sample_block: int = 100,
) -> jnp.ndarray:
    """(N, K) min over samples of dist-to-centroid / dist-to-nearest
    (reference `create_cluster_masks.py:158-188`).

    The sample axis is processed in blocks with a running min so the
    (N, S, K) distance tensor never materializes (the reference sub-chunks
    with dist_chunk_size for the same reason).
    """
    z_steps = jnp.linspace(0.0, 1.0, ray_samples)
    near, far = rays[:, 6:7], rays[:, 7:8]
    c = centroids[:, cluster_dim_start:]

    result = jnp.full((rays.shape[0], centroids.shape[0]), jnp.inf)
    for start in range(0, ray_samples, sample_block):
        z_blk = z_steps[start : start + sample_block]
        z_vals = near * (1 - z_blk) + far * z_blk  # (N, s)
        xyz = rays[:, None, 0:3] + rays[:, None, 3:6] * z_vals[..., None]
        p = xyz[..., cluster_dim_start:]
        dists = jnp.linalg.norm(p[:, :, None, :] - c[None, None, :, :], axis=-1)
        min_d = jnp.min(dists, axis=-1, keepdims=True)  # (N, s, 1)
        result = jnp.minimum(result, jnp.min(dists / (min_d + 1e-8), axis=1))
    return result


def main(hparams: Namespace) -> None:
    assert hparams.ray_altitude_range is not None
    output_path = Path(hparams.output)
    rank = jax.process_index()
    world_size = jax.process_count()
    if rank == 0:
        output_path.mkdir(parents=True, exist_ok=hparams.resume)

    dataset_path = Path(hparams.dataset_path)
    coords = load_coordinates(dataset_path)
    origin_drb = coords["origin_drb"]
    pose_scale_factor = coords["pose_scale_factor"]

    ray_altitude_range = [
        (x - origin_drb[0]) / pose_scale_factor for x in hparams.ray_altitude_range
    ]

    metadata_paths = list((dataset_path / 'train' / 'metadata').iterdir()) + list(
        (dataset_path / 'val' / 'metadata').iterdir()
    )
    camera_positions = np.stack(
        [np.asarray(load_pt(p)["c2w"])[:3, 3] for p in metadata_paths]
    )
    main_print(f"Number of images in dir: {camera_positions.shape}")
    min_position = camera_positions.min(axis=0)
    max_position = camera_positions.max(axis=0)
    main_print(f"Coord range: {min_position} {max_position}")

    centroids = make_centroids(hparams.grid_dim, min_position, max_position)
    main_print(f"Centroids: {centroids}")

    near = hparams.near / pose_scale_factor
    far = hparams.far / pose_scale_factor if hparams.far is not None else 2.0

    if rank == 0:
        save_pt(
            {
                "origin_drb": origin_drb,
                "pose_scale_factor": pose_scale_factor,
                "ray_altitude_range": ray_altitude_range,
                "near": near,
                "far": far,
                "centroids": centroids,
                "grid_dim": list(hparams.grid_dim),
                "min_position": min_position.astype(np.float32),
                "max_position": max_position.astype(np.float32),
                "cluster_2d": hparams.cluster_2d,
            },
            output_path / "params.pt",
        )
        if not hparams.resume:
            for j in range(centroids.shape[0]):
                (output_path / str(j)).mkdir(parents=True)
    # All ranks wait for rank 0's params.pt + cluster dirs before writing
    # masks into them (the reference's dist.barrier at
    # create_cluster_masks.py:104).
    sync_processes("cluster_mask_dirs")

    cluster_dim_start = 1 if hparams.cluster_2d else 0
    centroids_j = jnp.asarray(centroids)

    ratios_fn = jax.jit(
        lambda rays: min_dist_ratios_for_rays(
            rays, centroids_j, hparams.ray_samples, cluster_dim_start
        )
    )

    for subdir in ("train", "val"):
        paths = list((dataset_path / subdir / "metadata").iterdir())
        for i in main_tqdm(np.arange(rank, len(paths), world_size)):
            metadata_path = paths[int(i)]
            filename = metadata_path.stem + ".pt"

            if hparams.resume and _all_masks_valid(
                output_path, centroids.shape[0], filename
            ):
                continue

            metadata = load_pt(metadata_path)
            intrinsics = np.asarray(metadata["intrinsics"])
            directions = get_ray_directions(
                int(metadata["W"]), int(metadata["H"]),
                float(intrinsics[0]), float(intrinsics[1]),
                float(intrinsics[2]), float(intrinsics[3]),
                hparams.center_pixels,
            )
            rays = get_rays(
                directions, jnp.asarray(metadata["c2w"]), near, far,
                ray_altitude_range,
            ).reshape(-1, 8)

            ratio_chunks = []
            for j in range(0, rays.shape[0], hparams.ray_chunk_size):
                ratio_chunks.append(
                    np.asarray(ratios_fn(rays[j : j + hparams.ray_chunk_size]))
                )
            ratios = np.concatenate(ratio_chunks).reshape(
                int(metadata["H"]), int(metadata["W"]), centroids.shape[0]
            )

            seg_mask = None
            if hparams.segmentation_path is not None:
                seg_mask = load_mask_zip(
                    Path(hparams.segmentation_path) / filename
                )

            for j in range(centroids.shape[0]):
                mask = ratios[:, :, j] <= hparams.boundary_margin
                if seg_mask is not None:
                    mask = np.logical_and(mask, seg_mask)
                save_mask_zip(mask, output_path / str(j) / filename)


def _all_masks_valid(output_path: Path, k: int, filename: str) -> bool:
    for j in range(k):
        mask_path = output_path / str(j) / filename
        if not mask_path.exists():
            return False
        try:
            load_mask_zip(mask_path)
        except Exception:
            traceback.print_exc()
            return False
    return True


if __name__ == '__main__':
    main(_get_mask_opts())
