"""Host-side data pipeline (L3): dataset formats, image metadata, ray streams.

Honors the reference's on-disk interchange contracts (SURVEY.md §2.6):
`coordinates.pt`, per-image `metadata/{stem}.pt`, zip-compressed mask
tensors, and the shuffled parquet ray-chunk store. torch (CPU) is used only
as a host-side (de)serializer for the .pt formats; all device compute is jax.
"""

from mega_nerf_tpu.data.image_metadata import ImageMetadata
from mega_nerf_tpu.data.dataset_utils import get_rgb_index_mask
from mega_nerf_tpu.data.memory_dataset import MemoryDataset
from mega_nerf_tpu.data.filesystem_dataset import FilesystemDataset
from mega_nerf_tpu.data.torch_io import load_pt, save_pt, load_mask_zip, save_mask_zip

__all__ = [
    "FilesystemDataset",
    "ImageMetadata",
    "get_rgb_index_mask",
    "MemoryDataset",
    "load_pt",
    "save_pt",
    "load_mask_zip",
    "save_mask_zip",
]
