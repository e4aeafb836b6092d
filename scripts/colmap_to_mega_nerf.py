"""COLMAP/PixSFM sparse model -> the canonical Mega-NeRF dataset layout.

Parity target: reference `scripts/colmap_to_mega_nerf.py:336-418`. Converts
poses from COLMAP's RDF camera convention to the DRB world convention,
centers them on the camera bounding-box midpoint, scales by --scale,
undistorts images, and writes coordinates.pt + per-image metadata with the
train/val split (every len/num_val-th image is validation).

Camera models: SIMPLE_RADIAL (like the reference) plus SIMPLE_PINHOLE /
PINHOLE (no distortion) and RADIAL / OPENCV (cv2-native k1 k2 [p1 p2]).
"""

from __future__ import annotations

import argparse
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mega_nerf_tpu.data.colmap import qvec_to_rotmat, read_model
from mega_nerf_tpu.data.torch_io import save_pt
from mega_nerf_tpu.runtime.logging import main_tqdm

RDF_TO_DRB = np.array(
    [[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0]]
)


def _get_opts() -> Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_path', type=str, required=True)
    parser.add_argument('--images_path', type=str, required=True)
    parser.add_argument('--output_path', type=str, required=True)
    parser.add_argument('--scale', type=float, required=True,
                        help='pose scale factor (brings cameras into [-1, 1])')
    parser.add_argument('--num_val', type=int, default=20)
    return parser.parse_args()


def camera_matrix_and_distortion(camera):
    p = camera.params
    if camera.model == "SIMPLE_RADIAL":
        k = np.array([[p[0], 0, p[1]], [0, p[0], p[2]], [0, 0, 1]])
        dist = np.array([p[3], 0, 0, 0])
    elif camera.model == "SIMPLE_PINHOLE":
        k = np.array([[p[0], 0, p[1]], [0, p[0], p[2]], [0, 0, 1]])
        dist = np.zeros(4)
    elif camera.model == "PINHOLE":
        k = np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1]])
        dist = np.zeros(4)
    elif camera.model == "RADIAL":
        # f, cx, cy, k1, k2
        k = np.array([[p[0], 0, p[1]], [0, p[0], p[2]], [0, 0, 1]])
        dist = np.array([p[3], p[4], 0, 0])
    elif camera.model == "OPENCV":
        # fx, fy, cx, cy, k1, k2, p1, p2 — cv2's native ordering
        k = np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1]])
        dist = np.array([p[4], p[5], p[6], p[7]])
    else:
        raise AssertionError(f"Unsupported camera model: {camera.model}")
    return k, dist


def colmap_c2w_to_drb(qvec: np.ndarray, tvec: np.ndarray) -> np.ndarray:
    """COLMAP world-to-camera (RDF) -> camera-to-world in DRB, (3, 4)."""
    w2c = np.eye(4)
    w2c[:3, :3] = qvec_to_rotmat(qvec)
    w2c[:3, 3] = tvec
    c2w = np.linalg.inv(w2c)
    return np.hstack(
        [
            RDF_TO_DRB @ c2w[:3, :3] @ np.linalg.inv(RDF_TO_DRB),
            RDF_TO_DRB @ c2w[:3, 3:],
        ]
    )


def main(hparams: Namespace) -> None:
    import cv2

    cameras, images = read_model(hparams.model_path)

    c2ws = {
        image.id: colmap_c2w_to_drb(image.qvec, image.tvec)
        for image in images.values()
    }

    positions = np.stack([c2w[:3, 3] for c2w in c2ws.values()])
    print(f"{positions.shape[0]} images")
    max_values = positions.max(axis=0)
    min_values = positions.min(axis=0)
    origin = (max_values + min_values) * 0.5
    diagonal = np.linalg.norm(positions - origin, axis=-1).max()
    print(origin, diagonal, max_values, min_values)

    output_path = Path(hparams.output_path)
    output_path.mkdir(parents=True)
    for split in ("train", "val"):
        (output_path / split / "metadata").mkdir(parents=True)
        (output_path / split / "rgbs").mkdir(parents=True)

    images_path = Path(hparams.images_path)
    val_stride = max(1, int(positions.shape[0] / hparams.num_val))

    with (output_path / "mappings.txt").open("w") as f:
        ordered = sorted(images.values(), key=lambda x: x.name)
        for i, image in enumerate(main_tqdm(ordered)):
            split_dir = output_path / ("val" if i % val_stride == 0 else "train")

            distorted = cv2.imread(str(images_path / image.name))
            camera = cameras[image.camera_id]
            camera_matrix, distortion = camera_matrix_and_distortion(camera)
            undistorted = cv2.undistort(distorted, camera_matrix, distortion)
            cv2.imwrite(str(split_dir / "rgbs" / f"{i:06d}.jpg"), undistorted)

            camera_in_drb = c2ws[image.id].copy()
            camera_in_drb[:, 3] = (camera_in_drb[:, 3] - origin) / hparams.scale
            assert np.logical_and(
                camera_in_drb >= -1, camera_in_drb <= 1
            ).all(), "increase --scale: poses fall outside [-1, 1]"

            metadata_name = f"{i:06d}.pt"
            # Final column remap into the renderer's DRB camera frame
            # (reference colmap_to_mega_nerf.py:408-411).
            c2w_final = np.concatenate(
                [
                    camera_in_drb[:, 1:2],
                    -camera_in_drb[:, :1],
                    camera_in_drb[:, 2:4],
                ],
                axis=-1,
            ).astype(np.float32)
            save_pt(
                {
                    "H": int(distorted.shape[0]),
                    "W": int(distorted.shape[1]),
                    "c2w": c2w_final,
                    "intrinsics": np.array(
                        [
                            camera_matrix[0][0],
                            camera_matrix[1][1],
                            camera_matrix[0][2],
                            camera_matrix[1][2],
                        ],
                        np.float32,
                    ),
                    "distortion": distortion.astype(np.float32),
                },
                split_dir / "metadata" / metadata_name,
            )
            f.write(f"{image.name},{metadata_name}\n")

    save_pt(
        {"origin_drb": origin, "pose_scale_factor": hparams.scale},
        output_path / "coordinates.pt",
    )


if __name__ == '__main__':
    main(_get_opts())
