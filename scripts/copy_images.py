"""Prepare UrbanScene3D photo sets: undistort raw photos into the dataset.

Parity target: reference `scripts/copy_images.py` behavior — the dataset's
`mappings.txt` pairs each raw photo with a metadata file; every photo is
undistorted with that metadata's intrinsics/distortion and written to the
split's `rgbs/` dir under the metadata stem.

Redesigned as a thread-pooled pipeline (undistortion is embarrassingly
parallel host IO, like the chunk writer in `data/filesystem_dataset.py`):
the metadata index is scanned once up front, then N workers decode ->
undistort -> encode concurrently.
"""

from __future__ import annotations

import argparse
import sys
from argparse import Namespace
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mega_nerf_tpu.data.torch_io import load_pt
from mega_nerf_tpu.runtime.logging import main_tqdm


def _get_images_opts() -> Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument('--image_path', type=str, required=True)
    parser.add_argument('--dataset_path', type=str, required=True)
    parser.add_argument('--workers', type=int, default=8)
    return parser.parse_args()


def _metadata_index(dataset_path: Path) -> Dict[str, Path]:
    """metadata filename -> full path, across both splits."""
    index: Dict[str, Path] = {}
    for split in ('train', 'val'):
        for p in (dataset_path / split / 'metadata').iterdir():
            index[p.name] = p
    return index


def undistort_image(raw_path: Path, metadata_path: Path, out_dir: Path) -> Path:
    """Undistort one photo with its metadata's camera model; returns the
    written path. Output size must equal the metadata's W/H."""
    import cv2

    metadata = load_pt(metadata_path)
    fx, fy, cx, cy = np.asarray(metadata['intrinsics'], np.float64)
    camera_matrix = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])

    distorted = cv2.imread(str(raw_path))
    assert distorted is not None, raw_path
    undistorted = cv2.undistort(
        distorted, camera_matrix, np.asarray(metadata['distortion'])
    )
    h, w = undistorted.shape[:2]
    assert (h, w) == (metadata['H'], metadata['W']), (raw_path, h, w)

    out = out_dir / f"{metadata_path.stem}{raw_path.suffix}"
    cv2.imwrite(str(out), undistorted)
    return out


def main(hparams: Namespace) -> None:
    image_path = Path(hparams.image_path)
    dataset_path = Path(hparams.dataset_path)
    for split in ('train', 'val'):
        (dataset_path / split / 'rgbs').mkdir(exist_ok=True)

    index = _metadata_index(dataset_path)
    jobs: List[Tuple[Path, Path]] = []
    for line in (dataset_path / 'mappings.txt').read_text().splitlines():
        image_name, metadata_name = line.strip().split(',')
        metadata_path = index.get(metadata_name)
        assert metadata_path is not None, f"no metadata for {metadata_name}"
        jobs.append((image_path / image_name, metadata_path))

    with ThreadPoolExecutor(max_workers=getattr(hparams, 'workers', 8)) as pool:
        futures = [
            pool.submit(
                undistort_image, raw, meta, meta.parent.parent / 'rgbs'
            )
            for raw, meta in jobs
        ]
        for f in main_tqdm(futures):
            f.result()


if __name__ == '__main__':
    main(_get_images_opts())
