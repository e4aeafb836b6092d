"""FilesystemDataset: parquet chunk contract, prefetch, resume, and parity
of regenerated rays with directly-computed rays."""

from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

from mega_nerf_tpu.data import FilesystemDataset, ImageMetadata, MemoryDataset
from mega_nerf_tpu.data.torch_io import load_pt
from tests.synthetic import make_synthetic_dataset


def _items(dataset: Path, n: int, hw=16) -> list:
    items = []
    for i in range(n):
        meta = load_pt(dataset / "train" / "metadata" / f"{i:06d}.pt")
        items.append(
            ImageMetadata(
                dataset / "train" / "rgbs" / f"{i:06d}.png", meta["c2w"], hw, hw,
                meta["intrinsics"], i, None, False,
            )
        )
    return items


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    return make_synthetic_dataset(
        tmp_path_factory.mktemp("fsds"), n_train=4, n_val=0, hw=(16, 16)
    )


def _make(ds_root, tmp_path, **kw):
    items = _items(ds_root, 4)
    args = dict(
        metadata_items=items, near=0.5, far=3.5, ray_altitude_range=None,
        center_pixels=True, chunk_paths=[tmp_path / "chunks"], num_chunks=4,
        scale_factor=1, disk_flush_size=500,
        rng=np.random.default_rng(0),
    )
    args.update(kw)
    return FilesystemDataset(**args), items


def test_write_and_schema(ds_root, tmp_path):
    ds, _ = _make(ds_root, tmp_path)
    files = sorted((tmp_path / "chunks").glob("*.parquet"))
    assert len(files) == 4
    table = pq.read_table(files[0])
    # Shared intrinsics -> pixel_indices schema.
    assert set(table.column_names) == {
        "img_indices", "rgbs_0", "rgbs_1", "rgbs_2", "pixel_indices"
    }
    stamp = load_pt(tmp_path / "chunks" / "metadata.pt")
    assert stamp["images"] == 4 and stamp["scale_factor"] == 1
    # All rays present across chunks exactly once.
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 4 * 16 * 16


def test_rays_match_memory_dataset(ds_root, tmp_path):
    """Regenerated rays (pixel_indices path) == directly generated rays."""
    ds, items = _make(ds_root, tmp_path)
    mem = MemoryDataset(items, 0.5, 3.5, None, True)
    chunk = ds.load_chunk()
    # Build lookup from (img, pixel) -> ray using the memory dataset layout.
    mem_rays = mem.rays.reshape(4, 16 * 16, 8)
    table = pq.read_table(sorted((tmp_path / "chunks").glob("*.parquet"))[0])
    # order of load_chunk matches file 0
    pix = table["pixel_indices"].to_numpy()
    img = table["img_indices"].to_numpy().astype(np.int64)
    np.testing.assert_allclose(
        chunk["rays"], mem_rays[img, pix], atol=1e-5
    )
    # And rgbs match the image pixels.
    mem_rgbs = mem.rgbs.reshape(4, 16 * 16, 3)
    np.testing.assert_array_equal(chunk["rgbs"], mem_rgbs[img, pix])


def test_chunks_shuffled(ds_root, tmp_path):
    ds, _ = _make(ds_root, tmp_path)
    chunk = ds.load_chunk()
    # A shuffled chunk should interleave images.
    assert len(np.unique(chunk["img_indices"][:64])) > 1


def test_cycle_and_resume(ds_root, tmp_path):
    ds, _ = _make(ds_root, tmp_path)
    c0 = ds.load_chunk()
    c1 = ds.load_chunk()
    assert ds.position == 2
    # Cycling wraps around deterministically.
    ds2, _ = _make(
        ds_root, tmp_path / "x",
        chunk_paths=[tmp_path / "chunks"],  # reuse!
    )
    ds2.set_position(1)
    c1b = ds2.load_chunk()
    np.testing.assert_array_equal(c1["img_indices"], c1b["img_indices"])
    np.testing.assert_allclose(c1["rays"], c1b["rays"], atol=1e-6)


def test_reuse_validates_stamp(ds_root, tmp_path):
    _make(ds_root, tmp_path)
    # Same config -> reuse silently.
    ds2, _ = _make(ds_root, tmp_path)
    assert len(ds2._parquet_paths) == 4
    # Wrong image count -> hard error.
    items = _items(ds_root, 3)
    with pytest.raises(AssertionError):
        FilesystemDataset(
            metadata_items=items, near=0.5, far=3.5, ray_altitude_range=None,
            center_pixels=True, chunk_paths=[tmp_path / "chunks"], num_chunks=4,
            scale_factor=1, disk_flush_size=500,
        )


def test_batches_interface(ds_root, tmp_path):
    ds, _ = _make(ds_root, tmp_path)
    batches = list(ds.batches(64, np.random.default_rng(1)))
    assert len(batches) >= 1
    b = batches[0]
    assert b["rays"].shape == (64, 8)
    assert b["rgbs"].dtype == np.float32 and b["rgbs"].max() <= 1.0


def test_differing_intrinsics_materializes_rays(ds_root, tmp_path):
    items = _items(ds_root, 4)
    # Perturb one camera's intrinsics -> rays_0..7 schema.
    items[2].intrinsics = items[2].intrinsics * 1.1
    ds = FilesystemDataset(
        metadata_items=items, near=0.5, far=3.5, ray_altitude_range=None,
        center_pixels=True, chunk_paths=[tmp_path / "chunks"], num_chunks=2,
        scale_factor=1, disk_flush_size=10**9,
        rng=np.random.default_rng(0),
    )
    files = sorted((tmp_path / "chunks").glob("*.parquet"))
    cols = set(pq.read_table(files[0]).column_names)
    assert "rays_0" in cols and "pixel_indices" not in cols
    stamp = load_pt(tmp_path / "chunks" / "metadata.pt")
    assert stamp["near"] == 0.5 and stamp["far"] == 3.5
    chunk = ds.load_chunk()
    assert np.isfinite(chunk["rays"]).all()
