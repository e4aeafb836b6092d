"""Cell-parallel shard_map training on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.models import make_nerf
from mega_nerf_tpu.parallel.cell_parallel import (
    make_cell_parallel_train_step,
    make_cell_train_state,
    place_cell_parallel,
)
from mega_nerf_tpu.parallel.mesh import make_mesh
from mega_nerf_tpu.parallel.train_step import make_optimizer, make_train_state, make_train_step
from mega_nerf_tpu.render.rendering import RenderSettings
from tests.test_models import tiny_hparams


def _random_batch(key, cells, per_cell, with_cell_axis=True):
    k1, k2 = jax.random.split(key)
    shape = (cells, per_cell) if with_cell_axis else (per_cell,)
    o = jax.random.normal(k1, shape + (3,)) * 0.1
    d = jax.random.normal(k2, shape + (3,))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full(shape + (1,), 0.5), jnp.full(shape + (1,), 2.0)], -1
    )
    rgbs = jnp.abs(jnp.sin(o * 5.0))
    idx = jnp.zeros(shape, jnp.int32)
    return {"rays": rays, "rgbs": rgbs, "img_indices": idx}


def test_cell_parallel_one_step_4x2():
    hp = tiny_hparams()
    fg = make_nerf(hp, appearance_count=1)
    mesh = make_mesh(cell_axis=4, data_axis=2)
    settings = RenderSettings(coarse_samples=8, fine_samples=8)
    opt = make_optimizer(1e-3, 0.1, 100)

    state = make_cell_train_state(fg, None, opt, jax.random.PRNGKey(0), num_cells=4)
    batch = _random_batch(jax.random.PRNGKey(1), 4, 16)

    step = jax.jit(
        make_cell_parallel_train_step(
            fg, None, settings, opt, mesh, use_appearance=False
        ),
        donate_argnums=(0,),
    )
    with mesh:
        state_p, batch_p = place_cell_parallel(mesh, state, batch)
        new_state, metrics = step(state_p, batch_p)
        jax.block_until_ready(metrics)

    # Per-cell metrics, all finite.
    assert metrics["loss"].shape == (4,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert (np.asarray(new_state.step) == 1).all()
    # Cells trained independently: identical inputs would give identical
    # params, but different init keys -> different losses.
    losses = np.asarray(metrics["loss"])
    assert len(np.unique(losses.round(8))) > 1


def test_cell_parallel_matches_independent_training():
    """One cell-parallel step ~= K independent single-cell steps (the
    equivalence that justifies replacing the parscript fan-out).
    Tolerances are loose-ish: oneDNN reorders f32 accumulations between
    batched (vmap) and per-cell matmuls on CPU."""
    hp = tiny_hparams(pos_dir_dim=0, appearance_dim=0, layers=2, skip_layers=[],
                      layer_dim=16)
    fg = make_nerf(hp, appearance_count=1)
    settings = RenderSettings(coarse_samples=8, fine_samples=0, perturb=0.0,
                              sigma_noise=False)
    import optax
    opt = optax.sgd(0.1)  # linear in grads: equivalence is numerically stable
    cells = 4

    state = make_cell_train_state(fg, None, opt, jax.random.PRNGKey(0), cells)
    batch = _random_batch(jax.random.PRNGKey(1), cells, 16)

    mesh = make_mesh(cell_axis=4, data_axis=2)
    step = make_cell_parallel_train_step(
        fg, None, settings, opt, mesh, use_appearance=False
    )
    with mesh:
        state_p, batch_p = place_cell_parallel(mesh, state, batch)
        par_state, par_metrics = jax.jit(step)(state_p, batch_p)
    par_state = jax.device_get(par_state)

    # Reference: run each cell alone with the plain single-device step.
    single_step = make_train_step(fg, None, settings, opt, use_appearance=False)
    for c in range(cells):
        cell_state = jax.tree.map(lambda x: x[c], state)
        cell_batch = jax.tree.map(lambda x: x[c], batch)
        ref_state, ref_metrics = jax.jit(single_step)(cell_state, cell_batch)
        np.testing.assert_allclose(
            float(par_metrics["loss"][c]), float(ref_metrics["loss"]), rtol=5e-3
        )
        ref_leaves = jax.tree.leaves(ref_state.fg_params)
        par_leaves = jax.tree.leaves(
            jax.tree.map(lambda x: x[c], par_state.fg_params)
        )
        for a, b in zip(ref_leaves, par_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_data_axis_reduction_matches_large_batch():
    """Grad pmean over 'data' == single-device step on the concatenated batch
    (data parallelism is exact, like DDP's all-reduce)."""
    hp = tiny_hparams(pos_dir_dim=0, appearance_dim=0, layers=2, skip_layers=[],
                      layer_dim=16)
    fg = make_nerf(hp, appearance_count=1)
    settings = RenderSettings(coarse_samples=8, fine_samples=0, perturb=0.0,
                              sigma_noise=False)
    import optax
    opt = optax.sgd(0.1)

    state = make_cell_train_state(fg, None, opt, jax.random.PRNGKey(0), 1)
    batch = _random_batch(jax.random.PRNGKey(1), 1, 32)

    mesh = make_mesh(cell_axis=1, data_axis=8)
    step = make_cell_parallel_train_step(
        fg, None, settings, opt, mesh, use_appearance=False
    )
    with mesh:
        state_p, batch_p = place_cell_parallel(mesh, state, batch)
        par_state, par_metrics = jax.jit(step)(state_p, batch_p)
    par_state = jax.device_get(par_state)

    single_step = make_train_step(fg, None, settings, opt, use_appearance=False)
    cell_state = jax.tree.map(lambda x: x[0], state)
    cell_batch = jax.tree.map(lambda x: x[0], batch)
    ref_state, ref_metrics = jax.jit(single_step)(cell_state, cell_batch)

    # NOTE: the sharded step averages per-shard means -> with equal shard
    # sizes this equals the full-batch mean exactly.
    np.testing.assert_allclose(
        float(par_metrics["loss"][0]), float(ref_metrics["loss"]), rtol=5e-3
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.fg_params),
        jax.tree.leaves(jax.tree.map(lambda x: x[0], par_state.fg_params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
