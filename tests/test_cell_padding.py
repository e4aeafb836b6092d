"""Non-divisible cell counts on power-of-two meshes (CellRunner padding).

The reference's parscript queue dispatches any K submodule jobs over any
GPU count (`/root/reference/parscripts/run_8.txt` + the parscript pip
package); its 25-submodule models (`/root/reference/README.md:46`) have no
power-of-two-compatible factor. The one-program cell-parallel trainer
handles this by padding the stacked cell axis to a multiple of the mesh
'cell' axis with dummy cells (CellRunner.padded_cells): dummies train
throwaway params on a synthetic stream, nothing crosses the cell axis, and
metrics/checkpoints/merge only ever see the real cells.
"""

from argparse import Namespace

import numpy as np

from mega_nerf_tpu.runtime.cell_runner import CellRunner
from tests.synthetic import make_synthetic_dataset, tiny_train_hparams


def _make_scene(root, grid_dim):
    ds = make_synthetic_dataset(root / "ds", n_train=5, n_val=1, hw=(20, 20))

    import scripts.create_cluster_masks as ccm

    ccm.main(Namespace(
        dataset_path=str(ds), segmentation_path=None,
        output=str(root / "masks"), grid_dim=grid_dim, ray_samples=64,
        ray_chunk_size=48 * 1024, resume=False,
        ray_altitude_range=[-10.0, 10.0], near=0.5, far=3.5,
        center_pixels=True, cluster_2d=False, boundary_margin=1.15,
    ))
    return ds


def test_cell_axis_isolation_bitwise():
    """The property padding rests on: a cell's training step is a pure
    function of ITS stacked row — swapping another row's (params, batch)
    for anything else leaves it bit-identical. Two 4-cell programs on the
    same (cell=2, data=4) mesh share rows 0..2; row 3 is a dummy
    (fresh-init params + synthetic rays) in one and a copy of row 2 in the
    other. Rows 0..2 of the results must match bitwise."""
    import jax

    from mega_nerf_tpu.models import make_nerf
    from mega_nerf_tpu.parallel.cell_parallel import (
        make_cell_parallel_train_step,
        make_cell_train_state,
    )
    from mega_nerf_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_over_cells,
    )
    from mega_nerf_tpu.parallel.train_step import make_optimizer
    from mega_nerf_tpu.render.rendering import RenderSettings
    from tests.test_models import tiny_hparams

    fg = make_nerf(tiny_hparams(), appearance_count=1)
    bg = None
    settings = RenderSettings(coarse_samples=8, fine_samples=8)
    opt = make_optimizer(1e-3, 0.1, 100)
    mesh = make_mesh(cell_axis=2, data_axis=4)

    state4 = make_cell_train_state(fg, bg, opt, jax.random.key(7), 4)
    state4 = jax.device_get(state4)

    rng = np.random.default_rng(3)
    B = 64
    rays = np.concatenate(
        [
            np.full((3, B, 3), 0.0, np.float32),
            rng.standard_normal((3, B, 3)).astype(np.float32),
            np.full((3, B, 1), 0.5, np.float32),
            np.full((3, B, 1), 3.0, np.float32),
        ],
        axis=-1,
    )
    rays[..., 3:6] /= np.linalg.norm(rays[..., 3:6], axis=-1, keepdims=True)
    batch3 = {
        "rays": rays,
        "rgbs": rng.random((3, B, 3)).astype(np.float32),
        "img_indices": np.zeros((3, B), np.int32),
    }

    dummy_rays = np.zeros((1, B, 8), np.float32)
    dummy_rays[..., 5] = 1.0
    dummy_rays[..., 6] = 0.5
    dummy_rays[..., 7] = 1.0
    batch_dummy = {
        "rays": dummy_rays,
        "rgbs": np.full((1, B, 3), 0.5, np.float32),
        "img_indices": np.zeros((1, B), np.int32),
    }
    batch_copy = {k: v[2:3] for k, v in batch3.items()}

    step = jax.jit(
        make_cell_parallel_train_step(fg, bg, settings, opt, mesh),
        donate_argnums=(0,),
    )

    outs = []
    for extra in (batch_dummy, batch_copy):
        batch = {
            k: np.concatenate([batch3[k], extra[k]]) for k in batch3
        }
        st = shard_over_cells(mesh, state4)
        bt = shard_batch(mesh, batch, with_cell_axis=True)
        new_state, metrics = step(st, bt)
        outs.append(jax.device_get((new_state.fg_params, metrics)))

    (fg_a, m_a), (fg_b, m_b) = outs
    for a, b in zip(jax.tree.leaves(fg_a), jax.tree.leaves(fg_b)):
        np.testing.assert_array_equal(np.asarray(a)[:3], np.asarray(b)[:3])
    for k in m_a:
        np.testing.assert_array_equal(
            np.asarray(m_a[k])[:3], np.asarray(m_b[k])[:3], err_msg=k
        )
    # The swapped row itself genuinely differed (the test discriminates).
    assert not np.array_equal(
        np.asarray(m_a["loss"])[3], np.asarray(m_b["loss"])[3]
    )


def test_padded_3_cells_on_cell_axis_2_mechanics(tmp_path):
    """3 cells on cell_axis=2 pads to 4: trains, checkpoints exactly the 3
    real cells in merge layout, logs metrics only for real cells, and the
    padded run's quality lands in the same regime as the unpadded
    cell_axis=1 run (bitwise equality across different mesh shapes is not
    expected — the 'data' axis pmean association differs)."""
    ds = _make_scene(tmp_path, [3, 1])

    def train(exp, cell_axis):
        hp = tiny_train_hparams(
            ds, tmp_path / exp,
            cluster_mask_path=str(tmp_path / "masks"),
            train_iterations=20, ckpt_interval=20,
            ray_altitude_range=[-10.0, 10.0],
            cell_axis=cell_axis,
        )
        runner = CellRunner(hp)
        runner.train()
        return runner

    r1 = train("ax1/sub", 1)
    r2 = train("ax2/sub", 2)
    assert r1.padded_cells == 3 and r2.padded_cells == 4

    import jax

    fg1 = jax.device_get(r1.final_state.fg_params)
    fg2 = jax.device_get(r2.final_state.fg_params)
    for a, b in zip(jax.tree.leaves(fg1), jax.tree.leaves(fg2)):
        a, b = np.asarray(a), np.asarray(b)
        assert b.shape[0] == 4 and a.shape[0] == 3
        # Same init, same streams; only reduction association differs.
        assert np.max(np.abs(b[:3] - a)) < 5e-2

    for i in range(3):
        assert (tmp_path / f"ax2/sub{i}" / "0" / "models" / "20.ckpt").exists()
    assert not (tmp_path / "ax2/sub3").exists()

    import json

    keys = set()
    with open(tmp_path / "ax2/sub0" / "0" / "tb" / "metrics.jsonl") as f:
        for line in f:
            keys.update(json.loads(line).keys())
    assert any(k == "train/psnr/cell2" for k in keys), keys
    assert not any(k == "train/psnr/cell3" for k in keys), keys


def test_25_cells_on_8_device_mesh(tmp_path):
    """The reference's 5x5=25-submodule shape shards onto the virtual
    8-device mesh (cell_axis=8, padded to 32), trains, checkpoints all 25
    real cells, resumes, and merges into a 25-submodule container."""
    ds = _make_scene(tmp_path, [5, 5])

    hp = tiny_train_hparams(
        ds, tmp_path / "g25/sub",
        cluster_mask_path=str(tmp_path / "masks"),
        train_iterations=10, ckpt_interval=10,
        ray_altitude_range=[-10.0, 10.0],
        cell_axis=8,
    )
    runner = CellRunner(hp)
    runner.train()
    assert runner.num_cells == 25 and runner.padded_cells == 32

    for i in range(25):
        assert (tmp_path / f"g25/sub{i}" / "0" / "models" / "10.ckpt").exists()

    # Resume from any one cell checkpoint restacks all 25 + fresh dummies.
    hp2 = tiny_train_hparams(
        ds, tmp_path / "g25r/sub",
        cluster_mask_path=str(tmp_path / "masks"),
        train_iterations=12, ckpt_interval=12,
        ray_altitude_range=[-10.0, 10.0],
        cell_axis=8,
    )
    hp2.ckpt_path = str(tmp_path / "g25/sub0" / "0" / "models" / "10.ckpt")
    CellRunner(hp2).train()

    import scripts.merge_submodules as ms

    mhp = tiny_train_hparams(
        ds, tmp_path / "unused",
        train_iterations=10, ray_altitude_range=[-10.0, 10.0],
    )
    mhp.ckpt_prefix = str(tmp_path / "g25/sub")
    mhp.centroid_path = str(tmp_path / "masks" / "params.pt")
    mhp.output = str(tmp_path / "merged25.pt")
    mhp.torchscript = False
    ms.main(mhp)

    from mega_nerf_tpu.models.container import load_container

    cont = load_container(tmp_path / "merged25.pt")
    assert np.asarray(cont.centroids).shape[0] == 25
    assert len(cont.fg_states) == 25
