"""Join raw UrbanScene3D photos with provided metadata via mappings.txt.

Parity target: reference `scripts/copy_images.py`: for each
`image_name,metadata_name` pair, undistort the raw photo with the
intrinsics/distortion stored in the metadata and write it into the matching
split's rgbs/ dir.
"""

from __future__ import annotations

import argparse
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mega_nerf_tpu.data.torch_io import load_pt
from mega_nerf_tpu.runtime.logging import main_tqdm


def _get_images_opts() -> Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument('--image_path', type=str, required=True)
    parser.add_argument('--dataset_path', type=str, required=True)
    return parser.parse_args()


def main(hparams: Namespace) -> None:
    import cv2

    image_path = Path(hparams.image_path)
    dataset_path = Path(hparams.dataset_path)
    (dataset_path / 'train' / 'rgbs').mkdir(exist_ok=True)
    (dataset_path / 'val' / 'rgbs').mkdir(exist_ok=True)

    lines = (dataset_path / 'mappings.txt').read_text().splitlines()
    for line in main_tqdm(lines):
        image_name, metadata_name = line.strip().split(',')
        metadata_path = dataset_path / 'train' / 'metadata' / metadata_name
        if not metadata_path.exists():
            metadata_path = dataset_path / 'val' / 'metadata' / metadata_name
            assert metadata_path.exists(), metadata_name

        distorted = cv2.imread(str(image_path / image_name))
        metadata = load_pt(metadata_path)
        intrinsics = np.asarray(metadata['intrinsics'])
        camera_matrix = np.array(
            [
                [intrinsics[0], 0, intrinsics[2]],
                [0, intrinsics[1], intrinsics[3]],
                [0, 0, 1],
            ]
        )
        undistorted = cv2.undistort(
            distorted, camera_matrix, np.asarray(metadata['distortion'])
        )
        assert undistorted.shape[0] == metadata['H']
        assert undistorted.shape[1] == metadata['W']

        ext = image_name.split('.')[-1]
        cv2.imwrite(
            str(
                metadata_path.parent.parent / 'rgbs'
                / f"{metadata_path.stem}.{ext}"
            ),
            undistorted,
        )


if __name__ == '__main__':
    main(_get_images_opts())
