from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mega_nerf_tpu.models import (
    Cascade,
    NeRF,
    NeRFConfig,
    cluster_weights,
    frequency_encode,
    make_bg_nerf,
    make_nerf,
    mega_apply,
)


def tiny_hparams(**kw):
    base = dict(
        pos_xyz_dim=4,
        pos_dir_dim=2,
        layers=3,
        skip_layers=[1],
        layer_dim=16,
        bg_layer_dim=16,
        appearance_dim=0,
        affine_appearance=False,
        use_cascade=False,
        sh_deg=None,
        shifted_softplus=True,
    )
    base.update(kw)
    return Namespace(**base)


def test_frequency_encode_width_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = frequency_encode(x, 4)
    assert out.shape == (1, 3 * (1 + 2 * 4))
    np.testing.assert_allclose(np.asarray(out[0, :3]), np.asarray(x[0]))
    # First sin block is sin(1 * x).
    np.testing.assert_allclose(np.asarray(out[0, 3:6]), np.sin(np.asarray(x[0])), atol=1e-6)


def test_nerf_forward_shapes_and_ranges():
    bundle = make_nerf(tiny_hparams(), appearance_count=3)
    params = bundle.init(jax.random.key(0))
    xyz = jax.random.normal(jax.random.key(1), (32, 3))
    dirs = jax.random.normal(jax.random.key(2), (32, 3))
    out = bundle.apply(params, "fine", xyz, dirs)
    assert out.shape == (32, 4)
    rgb, sigma = np.asarray(out[:, :3]), np.asarray(out[:, 3])
    assert (rgb >= 0).all() and (rgb <= 1).all()  # sigmoid
    assert (sigma >= 0).all()  # shifted softplus


def test_nerf_sigma_only():
    bundle = make_nerf(tiny_hparams(), appearance_count=1)
    params = bundle.init(jax.random.key(0))
    xyz = jax.random.normal(jax.random.key(1), (8, 3))
    out = bundle.apply(params, "coarse", xyz, sigma_only=True)
    assert out.shape == (8, 1)


def test_nerf_appearance_changes_rgb_not_sigma():
    bundle = make_nerf(tiny_hparams(appearance_dim=4), appearance_count=5)
    params = bundle.init(jax.random.key(0))
    xyz = jax.random.normal(jax.random.key(1), (8, 3))
    dirs = jax.random.normal(jax.random.key(2), (8, 3))
    out0 = bundle.apply(params, "fine", xyz, dirs, jnp.zeros(8, jnp.int32))
    out1 = bundle.apply(params, "fine", xyz, dirs, jnp.ones(8, jnp.int32))
    assert not np.allclose(np.asarray(out0[:, :3]), np.asarray(out1[:, :3]))
    np.testing.assert_allclose(np.asarray(out0[:, 3]), np.asarray(out1[:, 3]), atol=1e-6)


def test_nerf_affine_appearance():
    bundle = make_nerf(
        tiny_hparams(appearance_dim=4, affine_appearance=True), appearance_count=2
    )
    params = bundle.init(jax.random.key(0))
    xyz = jax.random.normal(jax.random.key(1), (8, 3))
    dirs = jax.random.normal(jax.random.key(2), (8, 3))
    out = bundle.apply(params, "fine", xyz, dirs, jnp.zeros(8, jnp.int32))
    assert out.shape == (8, 4)


def test_nerf_sh_head():
    bundle = make_nerf(tiny_hparams(sh_deg=2, pos_dir_dim=0), appearance_count=1)
    params = bundle.init(jax.random.key(0))
    xyz = jax.random.normal(jax.random.key(1), (8, 3))
    out = bundle.apply(params, "fine", xyz)
    # rgb_dim = 3 * (2+1)^2 = 27, + sigma
    assert out.shape == (8, 28)
    # SH coefficients are raw (not sigmoided): some should be negative.
    assert (np.asarray(out[:, :27]) < 0).any()


def test_sh_requires_no_dir_branch():
    with pytest.raises(AssertionError):
        NeRFConfig(pos_dir_dim=4, rgb_dim=27)


def test_bg_nerf_xyz4():
    bundle = make_bg_nerf(tiny_hparams(), appearance_count=1)
    params = bundle.init(jax.random.key(0))
    xyz = jax.random.normal(jax.random.key(1), (8, 4))
    dirs = jax.random.normal(jax.random.key(2), (8, 3))
    out = bundle.apply(params, "fine", xyz, dirs)
    assert out.shape == (8, 4)


def test_cascade_coarse_and_fine_differ():
    bundle = make_nerf(tiny_hparams(use_cascade=True), appearance_count=1)
    params = bundle.init(jax.random.key(0))
    assert "coarse" in params and "fine" in params
    xyz = jax.random.normal(jax.random.key(1), (8, 3))
    dirs = jax.random.normal(jax.random.key(2), (8, 3))
    c = bundle.apply(params, "coarse", xyz, dirs)
    f = bundle.apply(params, "fine", xyz, dirs)
    assert not np.allclose(np.asarray(c), np.asarray(f))


def test_sigma_noise_shifts_preactivation():
    bundle = make_nerf(tiny_hparams(), appearance_count=1)
    params = bundle.init(jax.random.key(0))
    xyz = jax.random.normal(jax.random.key(1), (8, 3))
    dirs = jax.random.normal(jax.random.key(2), (8, 3))
    base = bundle.apply(params, "fine", xyz, dirs)
    noisy = bundle.apply(params, "fine", xyz, dirs, sigma_noise=jnp.full((8, 1), 10.0))
    assert (np.asarray(noisy[:, 3]) > np.asarray(base[:, 3])).all()


def test_cluster_weights_hard_assignment():
    centroids = jnp.array([[0.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    pts = jnp.array([[0.0, 1.0, 0.0], [0.0, 9.0, 0.0]])
    w = cluster_weights(pts, centroids, boundary_margin=1.0)
    np.testing.assert_array_equal(np.asarray(w), [[1.0, 0.0], [0.0, 1.0]])


def test_cluster_weights_soft_blend_and_margin():
    centroids = jnp.array([[0.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 100.0, 0.0]])
    pts = jnp.array([[0.0, 1.0, 0.0]])  # equidistant from first two
    w = np.asarray(cluster_weights(pts, centroids, boundary_margin=1.5))
    np.testing.assert_allclose(w[0, :2], 0.5, atol=1e-5)
    assert w[0, 2] == 0.0  # outside margin
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)


def test_cluster_weights_2d_ignores_altitude():
    centroids = jnp.array([[5.0, 0.0, 0.0], [-5.0, 10.0, 0.0]])
    pts = jnp.array([[-5.0, 1.0, 0.0]])  # altitude matches centroid 1, yz near 0
    w_3d = np.asarray(cluster_weights(pts, centroids, 1.0, cluster_dim_start=0))
    w_2d = np.asarray(cluster_weights(pts, centroids, 1.0, cluster_dim_start=1))
    assert w_3d[0].argmax() == 1  # full 3D: altitude dominates
    assert w_2d[0].argmax() == 0  # 2D: yz distance dominates


def test_mega_apply_hard_matches_single_submodule():
    cfg = NeRFConfig(pos_xyz_dim=2, pos_dir_dim=0, layers=2, skip_layers=(),
                     layer_dim=8, appearance_dim=0)
    module = NeRF(cfg)
    keys = jax.random.split(jax.random.key(0), 2)
    xyz_init = jnp.zeros((1, 3))
    stacked = jax.vmap(lambda k: module.init(k, xyz_init)["params"])(keys)
    single0 = jax.tree.map(lambda x: x[0], stacked)
    pts = jax.random.normal(jax.random.key(3), (6, 3)) * 0.1  # near origin
    centroids = jnp.array([[0.0, 0.0, 0.0], [0.0, 50.0, 0.0]])
    w = cluster_weights(pts, centroids, 1.0)
    apply_fn = lambda p, *a: module.apply({"params": p}, *a)
    blended = mega_apply(apply_fn, stacked, w, pts)
    direct = module.apply({"params": single0}, pts)
    np.testing.assert_allclose(np.asarray(blended), np.asarray(direct), atol=1e-5)


def test_param_count_matches_reference_arithmetic():
    # Default paper config: 8 layers x 256 ch, skip at 4, pos_xyz 12, pos_dir 4,
    # appearance 48. Reference layer sizes (models/nerf.py:60-109).
    h = Namespace(
        pos_xyz_dim=12, pos_dir_dim=4, layers=8, skip_layers=[4], layer_dim=256,
        appearance_dim=48, affine_appearance=False, use_cascade=False, sh_deg=None,
        shifted_softplus=True,
    )
    bundle = make_nerf(h, appearance_count=10)
    params = bundle.init(jax.random.key(0))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    in_xyz = 3 + 3 * 12 * 2  # 75
    in_dir = 3 + 3 * 4 * 2  # 27
    expected = (
        (in_xyz + 1) * 256  # trunk_0
        + 3 * ((256 + 1) * 256)  # trunk 1-3 (wait: layers 1,2,3)
        + ((256 + in_xyz + 1) * 256)  # skip layer 4
        + 3 * ((256 + 1) * 256)  # trunk 5-7
        + (256 + 1) * 1  # sigma
        + (256 + 1) * 256  # trunk_final
        + (256 + in_dir + 48 + 1) * 128  # dir_a branch
        + (128 + 1) * 3  # rgb
        + 10 * 48  # appearance embedding
    )
    assert n == expected, (n, expected)
