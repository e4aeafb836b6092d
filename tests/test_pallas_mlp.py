"""Fused Pallas MLP vs the Flax reference forward (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.models import make_nerf
from mega_nerf_tpu.render.pallas_mlp import fused_nerf_eval, pack_params
from tests.test_models import tiny_hparams


def _compare(hp_kw, appearance_count=6, n=256, atol=2e-5):
    hp = tiny_hparams(**hp_kw)
    bundle = make_nerf(hp, appearance_count)
    params = bundle.init(jax.random.key(0))
    packed = pack_params(bundle.config, params)

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dirs = rng.normal(size=(n, 3))
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True),
                       jnp.float32)
    idx = jnp.asarray(rng.integers(0, appearance_count, n), jnp.int32)

    use_dirs = bundle.config.pos_dir_dim > 0
    use_app = bundle.config.appearance_dim > 0
    ref = bundle.apply(
        params, "fine", xyz, dirs if use_dirs else None,
        idx if use_app else None,
    )

    app_embed = None
    if use_app:
        app_embed = jnp.asarray(params["appearance"]["embedding"])[idx]
    out = fused_nerf_eval(
        packed, xyz, dirs if use_dirs else None, app_embed, block=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


def test_fused_matches_flax_full_model():
    _compare({"appearance_dim": 4})


def test_fused_matches_flax_no_appearance():
    _compare({"appearance_dim": 0})


def test_fused_matches_flax_no_dirs():
    _compare({"appearance_dim": 0, "pos_dir_dim": 0})


def test_fused_matches_flax_paper_arch():
    _compare(
        {
            "pos_xyz_dim": 12, "pos_dir_dim": 4, "layers": 8,
            "skip_layers": [4], "layer_dim": 256, "appearance_dim": 48,
        },
        appearance_count=16,
        n=256,
        atol=5e-5,
    )


def test_in_kernel_encode_matches_pre_encode():
    """encode_in_kernel=True (raw coords in, compile-time constant encode) must
    be bit-identical to the XLA pre-encode path: both compute the same
    select/scale/sin formulation in f32 before the compute-dtype cast."""
    for hp_kw, app_count in (
        ({"appearance_dim": 4}, 6),
        ({"appearance_dim": 0, "pos_dir_dim": 0}, 1),
        (
            {
                "pos_xyz_dim": 12, "pos_dir_dim": 4, "layers": 8,
                "skip_layers": [4], "layer_dim": 256, "appearance_dim": 48,
            },
            16,
        ),
    ):
        hp = tiny_hparams(**hp_kw)
        bundle = make_nerf(hp, app_count)
        params = bundle.init(jax.random.key(1))
        packed = pack_params(bundle.config, params)
        rng = np.random.default_rng(1)
        n = 256
        xyz = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        app = None
        if bundle.config.appearance_dim > 0:
            idx = jnp.asarray(rng.integers(0, app_count, n), jnp.int32)
            app = jnp.asarray(params["appearance"]["embedding"])[idx]
        use_dirs = bundle.config.pos_dir_dim > 0
        out_pre = fused_nerf_eval(
            packed, xyz, dirs if use_dirs else None, app, block=128,
            interpret=True, encode_in_kernel=False,
        )
        out_ink = fused_nerf_eval(
            packed, xyz, dirs if use_dirs else None, app, block=128,
            interpret=True, encode_in_kernel=True,
        )
        np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out_ink))


def test_renderer_pallas_path_matches_xla():
    """render_rays with use_pallas=True == default path (eval mode)."""
    from mega_nerf_tpu.render import RenderSettings, render_rays

    hp = tiny_hparams(appearance_dim=4)
    bundle = make_nerf(hp, 6)
    params = bundle.init(jax.random.key(0))
    n = 32
    o = jnp.zeros((n, 3)).at[:, 2].set(2.0)
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 0.5), jnp.full((n, 1), 3.0)], -1
    )
    idx = jnp.zeros(n, jnp.int32)
    base = RenderSettings(coarse_samples=16, fine_samples=16, get_depth=True)
    fused = RenderSettings(coarse_samples=16, fine_samples=16, get_depth=True,
                           use_pallas=True)
    r0, _ = render_rays(bundle, None, params, None, rays, idx, base)
    r1, _ = render_rays(bundle, None, params, None, rays, idx, fused)
    np.testing.assert_allclose(
        np.asarray(r0["rgb_fine"]), np.asarray(r1["rgb_fine"]), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(r0["depth_fine"]), np.asarray(r1["depth_fine"]), atol=5e-4
    )


def test_freq_encode_groups_packed_layout():
    """The packed two-group encode tile is column-exactly the two separate
    encodes laid back to back (the dir_packed weight rows rely on this)."""
    import numpy as np

    from mega_nerf_tpu.render.pallas_mlp import (
        _freq_encode_block,
        _freq_encode_groups,
    )

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    nfx, nfd = 12, 4
    enc_in = 3 * (1 + 2 * nfx)   # 75
    dir_in = 3 * (1 + 2 * nfd)   # 27
    noise = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    packed = _freq_encode_groups(
        jnp.concatenate([xyz, dirs], axis=-1),
        ((3, nfx), (3, nfd)), 128,
        extra=noise, extra_col=enc_in + dir_in,
    )
    sep_x = _freq_encode_block(xyz, nfx, enc_in)
    sep_d = _freq_encode_block(dirs, nfd, dir_in)
    np.testing.assert_array_equal(np.asarray(packed[:, :enc_in]),
                                  np.asarray(sep_x))
    np.testing.assert_array_equal(
        np.asarray(packed[:, enc_in:enc_in + dir_in]), np.asarray(sep_d))
    np.testing.assert_array_equal(
        np.asarray(packed[:, enc_in + dir_in]), np.asarray(noise))
    assert not np.any(np.asarray(packed[:, enc_in + dir_in + 1:]))
