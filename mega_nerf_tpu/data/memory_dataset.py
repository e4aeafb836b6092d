"""In-RAM ray dataset: load every image, pregenerate all rays.

Parity target: reference `mega_nerf/datasets/memory_dataset.py`, redesigned
as a jax-native batch stream instead of a torch Dataset: rgbs stay uint8
until batch assembly, rays are float32 numpy, and `batches()` yields
shuffled, resumable minibatches ready for `jax.device_put`.

Ray generation runs through the same jnp ops as the device path, pinned to
the host CPU backend so nothing round-trips through the TPU.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from mega_nerf_tpu.data.dataset_utils import get_rgb_index_mask
from mega_nerf_tpu.data.image_metadata import ImageMetadata
from mega_nerf_tpu.ops.rays import get_ray_directions, get_rays


def generate_image_rays(
    metadata: ImageMetadata,
    near: float,
    far: float,
    ray_altitude_range: Optional[Sequence[float]],
    center_pixels: bool,
) -> np.ndarray:
    """All rays for one image -> (H*W, 8) float32, computed on host CPU."""
    cpu = jax.local_devices(backend="cpu")[0]  # local: never a peer process device
    with jax.default_device(cpu):
        directions = get_ray_directions(
            metadata.W,
            metadata.H,
            float(metadata.intrinsics[0]),
            float(metadata.intrinsics[1]),
            float(metadata.intrinsics[2]),
            float(metadata.intrinsics[3]),
            center_pixels,
        )
        rays = get_rays(directions, metadata.c2w, near, far, ray_altitude_range)
    return np.asarray(rays, dtype=np.float32).reshape(-1, 8)


class MemoryDataset:
    def __init__(
        self,
        metadata_items: List[ImageMetadata],
        near: float,
        far: float,
        ray_altitude_range: Optional[Sequence[float]],
        center_pixels: bool,
        rng: Optional[np.random.Generator] = None,
    ):
        rgb_list, ray_list, idx_list = [], [], []
        for item in metadata_items:
            data = get_rgb_index_mask(item, rng)
            if data is None:
                continue
            rgbs, indices, keep_mask = data
            rays = generate_image_rays(
                item, near, far, ray_altitude_range, center_pixels
            )
            if keep_mask is not None:
                rays = rays[keep_mask]
            rgb_list.append(rgbs)
            ray_list.append(rays)
            idx_list.append(indices)

        self.rgbs = np.concatenate(rgb_list)  # (M, 3) uint8
        self.rays = np.concatenate(ray_list)  # (M, 8) f32
        self.img_indices = np.concatenate(idx_list)  # (M,) i32

    def __len__(self) -> int:
        return self.rgbs.shape[0]

    def batches(
        self,
        batch_size: int,
        rng: np.random.Generator,
        drop_remainder: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of shuffled minibatches (host numpy, ready to device_put).

        `batch_size` is the GLOBAL batch; with P processes each process
        yields its disjoint batch_size/P-row slice of the same global
        shuffle (the reference's DistributedSampler, `runner.py:228-233`)."""
        if drop_remainder and len(self) < batch_size:
            raise ValueError(
                f"dataset has {len(self)} rays < batch_size {batch_size}: "
                f"the epoch would contain zero batches"
            )
        P = jax.process_count()
        assert batch_size % P == 0, (batch_size, P)
        local = batch_size // P
        offset = jax.process_index() * local
        order = rng.permutation(len(self))
        stop = (len(self) // batch_size) * batch_size if drop_remainder else len(self)
        for start in range(0, stop, batch_size):
            sel = order[start + offset : start + offset + local]
            yield {
                "rgbs": self.rgbs[sel].astype(np.float32) / 255.0,
                "rays": self.rays[sel],
                "img_indices": self.img_indices[sel],
            }
