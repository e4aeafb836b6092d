"""The full Mega-NeRF workflow on a synthetic scene: create_cluster_masks ->
per-submodule training -> merge_submodules -> merged-container eval.

This is the BASELINE config-3 analogue in miniature (grid 2x1, two
submodules, tiny MLPs, CPU).
"""

from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest

from mega_nerf_tpu.data.torch_io import load_mask_zip, load_pt
from mega_nerf_tpu.runtime.runner import Runner
from tests.synthetic import make_synthetic_dataset, tiny_train_hparams


@pytest.fixture(scope="module")
def workflow(tmp_path_factory):
    root = tmp_path_factory.mktemp("mega")
    ds = make_synthetic_dataset(root / "ds", n_train=5, n_val=1, hw=(20, 20))

    # --- 1. cluster masks (grid 2x1 over the y/z camera extent) ---
    import scripts.create_cluster_masks as ccm

    mask_hp = Namespace(
        dataset_path=str(ds),
        segmentation_path=None,
        output=str(root / "masks"),
        grid_dim=[2, 1],
        ray_samples=64,
        ray_chunk_size=48 * 1024,
        resume=False,
        ray_altitude_range=[-10.0, 10.0],
        near=0.5,
        far=3.5,
        center_pixels=True,
        cluster_2d=False,
        boundary_margin=1.15,
    )
    ccm.main(mask_hp)
    return root, ds


def test_masks_written_and_cover_all_pixels(workflow):
    root, ds = workflow
    params = load_pt(root / "masks" / "params.pt")
    assert params["centroids"].shape == (2, 3)
    assert list(params["grid_dim"]) == [2, 1]
    assert params["near"] == 0.5 / 1.0  # pose_scale_factor 1

    m0 = load_mask_zip(root / "masks" / "0" / "000000.pt")
    m1 = load_mask_zip(root / "masks" / "1" / "000000.pt")
    assert m0.shape == (20, 20)
    # With margin >= 1 the nearest cluster always qualifies: full coverage.
    assert (m0 | m1).all()
    # And the boundary overlap is nonempty but not total.
    assert (m0 & m1).any()
    assert not (m0 & m1).all()


def test_submodule_training_and_merge(workflow, tmp_path):
    root, ds = workflow

    # --- 2. per-submodule training (the parscript fan-out, sequentially) ---
    for i in range(2):
        hp = tiny_train_hparams(
            ds, root / f"sub{i}",
            cluster_mask_path=str(root / "masks" / str(i)),
            train_iterations=60,
            ckpt_interval=60,
            ray_altitude_range=[-10.0, 10.0],
        )
        Runner(hp).train()
        assert (root / f"sub{i}" / "0" / "models" / "60.ckpt").exists()

    # --- 3. merge ---
    import scripts.merge_submodules as ms

    merge_hp = tiny_train_hparams(
        ds, root / "unused",
        train_iterations=60,
        ray_altitude_range=[-10.0, 10.0],
    )
    merge_hp.ckpt_prefix = str(root / "sub")
    merge_hp.centroid_path = str(root / "masks" / "params.pt")
    merge_hp.output = str(root / "merged.pt")
    merge_hp.torchscript = True
    ms.main(merge_hp)
    assert (root / "merged.pt").exists()
    assert (root / "merged.pt.ts").exists()

    # --- 4. eval the merged container through the Runner ---
    eval_hp = tiny_train_hparams(
        ds, tmp_path / "eval_merged",
        ray_altitude_range=[-10.0, 10.0],
        container_path=str(root / "merged.pt"),
    )
    runner = Runner(eval_hp)
    assert runner.fg.is_mega and runner.fg.centroids.shape == (2, 3)
    runner.eval()
    content = (tmp_path / "eval_merged" / "0" / "metrics.txt").read_text()
    psnr = float(
        [l for l in content.splitlines() if "val/psnr" in l][0].split(":")[-1]
    )
    # Spatially-split training on a tiny scene: just require a sane render.
    assert psnr > 12, content

    # The TorchScript container also round-trips through our loader.
    eval_hp2 = tiny_train_hparams(
        ds, tmp_path / "eval_merged_ts",
        ray_altitude_range=[-10.0, 10.0],
        container_path=str(root / "merged.pt.ts"),
    )
    runner2 = Runner(eval_hp2)
    assert runner2.fg.is_mega

    # --- 5. flythrough rendering from the merged container ---
    import scripts.render_images as ri

    flythrough = tmp_path / "flythrough"
    flythrough.mkdir()
    meta = load_pt(ds / "val" / "metadata" / "000005.pt")
    c2w = np.asarray(meta["c2w"]).reshape(-1)
    (flythrough / "poses.txt").write_text(
        "\n".join(" ".join(str(v) for v in c2w) for _ in range(2)) + "\n"
    )
    fx, fy, cx, cy = np.asarray(meta["intrinsics"])
    (flythrough / "intrinsics.txt").write_text(
        f"20 20 {fx} {fy} {cx} {cy}\n" * 2
    )
    (flythrough / "embeddings.txt").write_text("0\n1\n")

    render_hp = tiny_train_hparams(
        ds, tmp_path / "unused2",
        ray_altitude_range=[-10.0, 10.0],
        container_path=str(root / "merged.pt"),
        val_scale_factor=1,
    )
    render_hp.input = str(flythrough)
    render_hp.output = str(tmp_path / "frames")
    render_hp.dataset_path = str(ds)
    render_hp.centroids_path = str(root / "masks" / "params.pt")
    render_hp.save_depth_npz = True
    render_hp.resume = False
    ri.main(render_hp)

    frames = tmp_path / "frames"
    for sub in ("rgbs", "depths", "cells"):
        assert len(list((frames / sub).glob("*.jpg"))) == 2, sub
    depth_npz = np.load(frames / "depths_npz" / "000000.npy")
    assert depth_npz.shape == (20, 20) and np.isfinite(depth_npz).all()
    # Resume skips everything.
    render_hp.resume = True
    ri.main(render_hp)
