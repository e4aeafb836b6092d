"""End-to-end cell-parallel workflow: cluster masks -> ONE-program 2-cell
training on the 8-device virtual mesh -> merge_submodules -> merged eval,
compared against two independent per-submodule jobs on the SAME masks
(the reference's parscript fan-out, `/root/reference/parscripts/run_8.txt`).

This drives the REAL path the dryrun only sketches: per-cell masked ray
streams from cluster masks, (cells, per_cell, ...) batches, per-cell
checkpoints in the merge layout, resume from mid-stream.
"""

from argparse import Namespace

import numpy as np
import pytest

from mega_nerf_tpu.runtime.cell_runner import CellRunner
from mega_nerf_tpu.runtime.runner import Runner
from tests.synthetic import make_synthetic_dataset, tiny_train_hparams

TRAIN_ITERS = 60


def _eval_merged(root, ds, out_dir, container):
    hp = tiny_train_hparams(
        ds, out_dir, ray_altitude_range=[-10.0, 10.0],
        container_path=str(container),
    )
    runner = Runner(hp)
    runner.eval()
    content = (out_dir / "0" / "metrics.txt").read_text()
    return float(
        [l for l in content.splitlines() if "val/psnr" in l][0].split(":")[-1]
    )


def _merge(root, prefix, output):
    import scripts.merge_submodules as ms

    hp = tiny_train_hparams(
        root / "ds", root / "unused",
        train_iterations=TRAIN_ITERS, ray_altitude_range=[-10.0, 10.0],
    )
    hp.ckpt_prefix = str(prefix)
    hp.centroid_path = str(root / "masks" / "params.pt")
    hp.output = str(output)
    hp.torchscript = False
    ms.main(hp)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("cellwf")
    ds = make_synthetic_dataset(root / "ds", n_train=5, n_val=1, hw=(20, 20))

    import scripts.create_cluster_masks as ccm

    ccm.main(Namespace(
        dataset_path=str(ds), segmentation_path=None,
        output=str(root / "masks"), grid_dim=[2, 1], ray_samples=64,
        ray_chunk_size=48 * 1024, resume=False,
        ray_altitude_range=[-10.0, 10.0], near=0.5, far=3.5,
        center_pixels=True, cluster_2d=False, boundary_margin=1.15,
    ))
    return root, ds


def test_cell_parallel_matches_independent_jobs(scene, tmp_path):
    root, ds = scene

    # --- one-program 2-cell training over mesh cell=2 x data=4 ---
    hp = tiny_train_hparams(
        ds, root / "joint/sub",
        cluster_mask_path=str(root / "masks"),
        train_iterations=TRAIN_ITERS, ckpt_interval=TRAIN_ITERS,
        ray_altitude_range=[-10.0, 10.0],
        cell_axis=2,
    )
    CellRunner(hp).train()
    for i in range(2):
        ckpt = root / f"joint/sub{i}" / "0" / "models" / f"{TRAIN_ITERS}.ckpt"
        assert ckpt.exists(), ckpt

    _merge(root, root / "joint/sub", root / "joint_merged.pt")
    joint_psnr = _eval_merged(
        root, ds, tmp_path / "eval_joint", root / "joint_merged.pt"
    )

    # --- the same two submodules as independent jobs (parscript mode) ---
    for i in range(2):
        ind_hp = tiny_train_hparams(
            ds, root / f"ind/sub{i}",
            cluster_mask_path=str(root / "masks" / str(i)),
            train_iterations=TRAIN_ITERS, ckpt_interval=TRAIN_ITERS,
            ray_altitude_range=[-10.0, 10.0],
        )
        Runner(ind_hp).train()
    _merge(root, root / "ind/sub", root / "ind_merged.pt")
    ind_psnr = _eval_merged(
        root, ds, tmp_path / "eval_ind", root / "ind_merged.pt"
    )

    # Both yield sane renders and land in the same quality regime (they are
    # equivalent up to RNG streams, not bitwise).
    assert joint_psnr > 12, joint_psnr
    assert abs(joint_psnr - ind_psnr) < 3.0, (joint_psnr, ind_psnr)


def test_cell_parallel_resume_exact(scene):
    """Mid-stream resume: restarting from the straight run's OWN step-30
    checkpoint and training to 60 reproduces its final state bitwise
    (params, optimizer, PRNG keys, stream positions)."""
    root, ds = scene

    def run(exp, ckpt_path=None):
        hp = tiny_train_hparams(
            ds, root / exp,
            cluster_mask_path=str(root / "masks"),
            train_iterations=TRAIN_ITERS, ckpt_interval=30,
            ray_altitude_range=[-10.0, 10.0],
            cell_axis=2,
        )
        if ckpt_path is not None:
            hp.ckpt_path = str(ckpt_path)
        runner = CellRunner(hp)
        runner.train()
        return runner.final_state

    full = run("full/sub")
    resumed = run(
        "resumed/sub",
        ckpt_path=root / "full/sub0" / "0" / "models" / "30.ckpt",
    )

    import jax

    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cell_dataset_streams_match_independent(scene):
    """Each cell's stream is exactly what an independent job's dataset
    yields for the same (seed, epoch, cell)."""
    from mega_nerf_tpu.data.cell_dataset import CellDataset

    root, ds = scene
    hp = tiny_train_hparams(
        ds, root / "unused_streams",
        cluster_mask_path=str(root / "masks"),
        ray_altitude_range=[-10.0, 10.0],
        cell_axis=2,
    )
    runner = CellRunner(hp)
    cd = CellDataset(
        runner.cell_items, runner.near, runner.far,
        runner.ray_altitude_range, hp.center_pixels, hp.random_seed,
    )
    b1 = cd.next_batch(64)
    assert b1["rays"].shape == (2, 64, 8)
    assert b1["rgbs"].shape == (2, 64, 3)

    # Reference stream: an independent MemoryDataset on cell 0's masks with
    # the same seeding.
    from mega_nerf_tpu.data.memory_dataset import MemoryDataset

    ind = MemoryDataset(
        runner.cell_items[0], runner.near, runner.far,
        runner.ray_altitude_range, hp.center_pixels,
        np.random.default_rng((hp.random_seed, 0)),
    )
    ind_batch = next(
        ind.batches(64, np.random.default_rng((hp.random_seed, 0, 0)))
    )
    np.testing.assert_array_equal(b1["rays"][0], ind_batch["rays"])
    np.testing.assert_array_equal(b1["rgbs"][0], ind_batch["rgbs"])


def test_cell_parallel_mid_train_validation(scene, tmp_path):
    """CellRunner validates every submodule at --val_interval like the
    reference's independent jobs do (runner.py:285-290): per-cell val
    metrics land under val/cell{i}/..."""
    import json

    root, ds = scene
    hp = tiny_train_hparams(
        ds, tmp_path / "valrun/sub",
        cluster_mask_path=str(root / "masks"),
        train_iterations=30, ckpt_interval=30, val_interval=20,
        ray_altitude_range=[-10.0, 10.0],
        cell_axis=2,
    )
    CellRunner(hp).train()

    metrics_file = tmp_path / "valrun/sub0" / "0" / "tb" / "metrics.jsonl"
    keys = set()
    with open(metrics_file) as f:
        for line in f:
            keys.update(json.loads(line).keys())
    for cell in range(2):
        assert any(k.startswith(f"val/cell{cell}/psnr") for k in keys), keys
