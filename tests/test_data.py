import numpy as np
import pytest

from mega_nerf_tpu.data import (
    ImageMetadata,
    MemoryDataset,
    get_rgb_index_mask,
    load_mask_zip,
    save_mask_zip,
)
from mega_nerf_tpu.data.torch_io import load_coordinates, load_pt, save_pt
from tests.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    return make_synthetic_dataset(tmp_path_factory.mktemp("ds"), n_train=3, n_val=1,
                                  hw=(16, 16))


def test_pt_roundtrip(tmp_path):
    obj = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": 3, "c": "x"}
    save_pt(obj, tmp_path / "t.pt")
    back = load_pt(tmp_path / "t.pt")
    np.testing.assert_array_equal(back["a"], obj["a"])
    assert back["b"] == 3 and back["c"] == "x"


def test_reference_torch_compat(tmp_path):
    # Files written by us load with plain torch and vice versa.
    import torch

    save_pt({"x": np.ones((2, 2), np.float32)}, tmp_path / "ours.pt")
    loaded = torch.load(tmp_path / "ours.pt", weights_only=False)
    assert isinstance(loaded["x"], torch.Tensor)

    torch.save({"y": torch.arange(4)}, tmp_path / "theirs.pt")
    back = load_pt(tmp_path / "theirs.pt")
    np.testing.assert_array_equal(back["y"], np.arange(4))


def test_mask_zip_roundtrip(tmp_path):
    mask = np.random.default_rng(0).random((8, 10)) > 0.5
    save_mask_zip(mask, tmp_path / "m.pt")
    back = load_mask_zip(tmp_path / "m.pt")
    np.testing.assert_array_equal(back, mask)


def test_coordinates_and_metadata(dataset):
    coords = load_coordinates(dataset)
    assert coords["pose_scale_factor"] == 1.0
    np.testing.assert_array_equal(coords["origin_drb"], np.zeros(3))
    meta = load_pt(dataset / "train" / "metadata" / "000000.pt")
    assert meta["W"] == 16 and meta["H"] == 16
    assert meta["c2w"].shape == (3, 4)


def test_image_metadata_load(dataset):
    meta = load_pt(dataset / "train" / "metadata" / "000000.pt")
    item = ImageMetadata(
        dataset / "train" / "rgbs" / "000000.png", meta["c2w"], 16, 16,
        meta["intrinsics"], 0, None, False,
    )
    img = item.load_image()
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert item.load_mask() is None


def test_val_image_keeps_left_half_only(dataset):
    meta = load_pt(dataset / "val" / "metadata" / "000003.pt")
    item = ImageMetadata(
        dataset / "val" / "rgbs" / "000003.png", meta["c2w"], 16, 16,
        meta["intrinsics"], 3, None, True,
    )
    rgbs, indices, keep = get_rgb_index_mask(item)
    assert rgbs.shape[0] == 16 * 8  # left half only
    assert (indices == 3).all()
    keep2d = keep.reshape(16, 16)
    assert not keep2d[:, 8:].any() and keep2d[:, :8].all()


def test_val_mask_rebalancing(dataset, tmp_path):
    # A mask selecting only right-half pixels must be rebalanced into an
    # equal number of left-half pixels.
    mask = np.zeros((16, 16), bool)
    mask[:, 12:] = True  # 64 right-half pixels
    save_mask_zip(mask, tmp_path / "000003.pt")
    meta = load_pt(dataset / "val" / "metadata" / "000003.pt")
    item = ImageMetadata(
        dataset / "val" / "rgbs" / "000003.png", meta["c2w"], 16, 16,
        meta["intrinsics"], 3, tmp_path / "000003.pt", True,
    )
    rgbs, _, keep = get_rgb_index_mask(item, np.random.default_rng(0))
    keep2d = keep.reshape(16, 16)
    assert not keep2d[:, 8:].any()
    assert keep2d[:, :8].sum() == 64  # rebalanced count preserved


def test_memory_dataset_batches(dataset):
    from mega_nerf_tpu.data.torch_io import load_pt as _load

    items = []
    for i, split in ((0, "train"), (1, "train"), (2, "train")):
        meta = _load(dataset / split / "metadata" / f"{i:06d}.pt")
        items.append(
            ImageMetadata(
                dataset / split / "rgbs" / f"{i:06d}.png", meta["c2w"], 16, 16,
                meta["intrinsics"], i, None, False,
            )
        )
    ds = MemoryDataset(items, 0.5, 3.0, None, True)
    assert len(ds) == 3 * 16 * 16
    batches = list(ds.batches(64, np.random.default_rng(0)))
    assert len(batches) == len(ds) // 64
    b = batches[0]
    assert b["rays"].shape == (64, 8) and b["rgbs"].shape == (64, 3)
    assert b["rgbs"].dtype == np.float32 and b["rgbs"].max() <= 1.0
    # Deterministic given the same rng seed.
    b2 = next(iter(ds.batches(64, np.random.default_rng(0))))
    np.testing.assert_array_equal(b["rays"], b2["rays"])


def test_drone_dataset_layout_and_content(tmp_path):
    """The drone-survey generator writes the reference dataset layout with
    informative (non-constant) oblique views of the box scene."""
    import numpy as np
    from PIL import Image

    from mega_nerf_tpu.data.torch_io import load_pt
    from tests.synthetic import make_drone_dataset

    root = make_drone_dataset(tmp_path / "ds", n_train=4, n_val=1, hw=(32, 32))
    coords = load_pt(root / "coordinates.pt")
    assert float(coords["pose_scale_factor"]) == 1.0
    train = sorted((root / "train" / "rgbs").glob("*.png"))
    assert len(train) == 4
    assert len(list((root / "val" / "rgbs").glob("*.png"))) == 1
    for p in train:
        img = np.asarray(Image.open(p), np.float32) / 255.0
        assert img.std() > 0.05, f"{p} looks constant"
        md = load_pt(root / "train" / "metadata" / (p.stem + ".pt"))
        assert int(md["W"]) == 32 and np.asarray(md["c2w"]).shape == (3, 4)
        # cameras are ABOVE the scene (DRB x points down)
        assert float(np.asarray(md["c2w"])[0, 3]) < 0.0
