"""COLMAP readers + dataset converter on a synthetic sparse model."""

from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest

from mega_nerf_tpu.data.colmap import (
    ColmapCamera,
    ColmapImage,
    qvec_to_rotmat,
    read_model,
    write_model_txt,
)
from mega_nerf_tpu.data.torch_io import load_coordinates, load_pt


def _rot_to_qvec(r: np.ndarray) -> np.ndarray:
    w = np.sqrt(max(0.0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
    x = (r[2, 1] - r[1, 2]) / (4 * w)
    y = (r[0, 2] - r[2, 0]) / (4 * w)
    z = (r[1, 0] - r[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def test_qvec_identity_and_roundtrip():
    np.testing.assert_allclose(
        qvec_to_rotmat(np.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-9
    )
    rng = np.random.default_rng(0)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = 0.8
    q = np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])
    r = qvec_to_rotmat(q)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(_rot_to_qvec(r), q, atol=1e-9)


@pytest.fixture()
def colmap_scene(tmp_path):
    """Synthetic sparse model: 6 cameras ringed around the origin, plus
    matching distorted 'photos'."""
    import cv2

    rng = np.random.default_rng(1)
    cameras = {
        1: ColmapCamera(1, "SIMPLE_RADIAL", 32, 24,
                        np.array([30.0, 16.0, 12.0, 0.01]))
    }
    images = {}
    (tmp_path / "photos").mkdir()
    for i in range(6):
        theta = 2 * np.pi * i / 6
        pos = 3.0 * np.array([np.cos(theta), np.sin(theta), 0.4])
        # w2c: camera looks somewhere; use a random small rotation.
        angle = 0.2 * rng.normal()
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        q = np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])
        r = qvec_to_rotmat(q)
        tvec = -r @ pos  # so that camera center == pos
        images[i + 1] = ColmapImage(i + 1, q, tvec, 1, f"img_{i}.jpg")
        img = rng.integers(0, 255, (24, 32, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "photos" / f"img_{i}.jpg"), img)

    write_model_txt(tmp_path / "sparse", cameras, images)
    return tmp_path


def test_read_model_txt(colmap_scene):
    cameras, images = read_model(colmap_scene / "sparse")
    assert len(cameras) == 1 and len(images) == 6
    assert cameras[1].model == "SIMPLE_RADIAL"
    assert images[1].name == "img_0.jpg"
    np.testing.assert_allclose(
        np.linalg.norm(images[3].qvec), 1.0, atol=1e-6
    )


def test_converter_end_to_end(colmap_scene):
    import scripts.colmap_to_mega_nerf as conv

    out = colmap_scene / "dataset"
    conv.main(
        Namespace(
            model_path=str(colmap_scene / "sparse"),
            images_path=str(colmap_scene / "photos"),
            output_path=str(out),
            scale=10.0,
            num_val=3,
        )
    )
    coords = load_coordinates(out)
    assert coords["pose_scale_factor"] == 10.0

    train_meta = sorted((out / "train" / "metadata").glob("*.pt"))
    val_meta = sorted((out / "val" / "metadata").glob("*.pt"))
    assert len(train_meta) + len(val_meta) == 6
    assert len(val_meta) == 3  # every 2nd image (6 // num_val=3 -> stride 2)

    meta = load_pt(train_meta[0])
    assert meta["W"] == 32 and meta["H"] == 24
    c2w = np.asarray(meta["c2w"])
    assert c2w.shape == (3, 4)
    # Rotation part stays orthonormal through the RDF->DRB conjugation and
    # the final column remap.
    np.testing.assert_allclose(
        c2w[:, :3] @ c2w[:, :3].T, np.eye(3), atol=1e-5
    )
    assert (np.abs(c2w[:, 3]) <= 1).all()
    # Positions across images stay distinct and centered.
    positions = np.stack(
        [np.asarray(load_pt(p)["c2w"])[:, 3] for p in train_meta + val_meta]
    )
    assert np.abs(positions).max() <= 0.5  # scale 10 on a radius-3 ring
    assert len(np.unique(positions.round(4), axis=0)) == 6

    # rgbs written for each metadata file.
    for p in train_meta:
        assert (out / "train" / "rgbs" / f"{p.stem}.jpg").exists()


def test_copy_images(colmap_scene):
    import shutil

    import scripts.colmap_to_mega_nerf as conv
    import scripts.copy_images as ci

    out = colmap_scene / "dataset2"
    conv.main(
        Namespace(
            model_path=str(colmap_scene / "sparse"),
            images_path=str(colmap_scene / "photos"),
            output_path=str(out),
            scale=10.0,
            num_val=3,
        )
    )
    # Simulate the UrbanScene3D flow: metadata + mappings.txt but no rgbs.
    shutil.rmtree(out / "train" / "rgbs")
    shutil.rmtree(out / "val" / "rgbs")
    ci.main(
        Namespace(
            image_path=str(colmap_scene / "photos"), dataset_path=str(out)
        )
    )
    n = len(list((out / "train" / "rgbs").iterdir())) + len(
        list((out / "val" / "rgbs").iterdir())
    )
    assert n == 6
