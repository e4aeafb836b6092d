"""Joint MegaNeRF training (--train_mega_nerf): all submodules in one model
with hard spatial routing, trained under a single optimizer.

Reference equivalent: MegaNeRF under DDP with the dead-submodule gradient
hack (`models/mega_nerf.py:51-59`); in jax the jitted graph always touches
all parameters so no hack is needed — unrouted submodules just get zero
gradients.
"""

import numpy as np
import pytest

from mega_nerf_tpu.data.torch_io import save_pt
from mega_nerf_tpu.runtime.runner import Runner
from tests.synthetic import make_synthetic_dataset, tiny_train_hparams


def test_joint_mega_training(tmp_path):
    ds = make_synthetic_dataset(tmp_path / "ds", n_train=4, n_val=1, hw=(16, 16))
    centroid_meta = {
        "centroids": np.array([[0.0, -0.7, 0.0], [0.0, 0.7, 0.0]], np.float32),
        "cluster_2d": False,
        "grid_dim": [2, 1],
        "min_position": np.full(3, -1.5, np.float32),
        "max_position": np.full(3, 1.5, np.float32),
    }
    save_pt(centroid_meta, tmp_path / "params.pt")

    hp = tiny_train_hparams(
        ds, tmp_path / "exp",
        train_iterations=60, ckpt_interval=60,
        train_mega_nerf=str(tmp_path / "params.pt"),
    )
    runner = Runner(hp)
    assert runner.fg.is_mega
    assert runner.fg.centroids.shape == (2, 3)
    runner.train()

    state = runner.final_state
    # Stacked params: leading submodule axis of 2 on every leaf.
    import jax

    for leaf in jax.tree.leaves(state.fg_params):
        assert leaf.shape[0] == 2
    # Both submodules actually moved (each owns rays on its side of the
    # scene, so both receive gradient).
    init_runner = Runner(
        tiny_train_hparams(
            ds, tmp_path / "exp_b",
            train_mega_nerf=str(tmp_path / "params.pt"),
            train_iterations=60,
        ),
        set_experiment_path=False,
    )
    from mega_nerf_tpu.parallel.train_step import make_optimizer, make_train_state

    opt = make_optimizer(hp.lr, hp.lr_decay_factor, hp.train_iterations)
    init_state = make_train_state(init_runner.fg, None, opt, init_runner.init_key)
    moved = jax.tree.map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(axis=tuple(range(1, a.ndim))),
        state.fg_params, init_state.fg_params,
    )
    for leaf in jax.tree.leaves(moved):
        assert (leaf > 0).all(), "a submodule never received gradient"

    metrics = (tmp_path / "exp" / "0" / "metrics.txt").read_text()
    psnr = float([l for l in metrics.splitlines() if "val/psnr" in l][0].split(":")[-1])
    assert psnr > 12, metrics
