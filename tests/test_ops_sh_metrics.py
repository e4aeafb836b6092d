import jax
import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.ops import eval_sh, psnr, ssim
from mega_nerf_tpu.ops.sh import C0, C1


def test_sh_deg0_constant():
    sh = jnp.ones((5, 3, 1))
    dirs = jax.random.normal(jax.random.key(0), (5, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(np.asarray(out), C0, atol=1e-6)


def test_sh_deg1_hand_values():
    # Only the l=1, m=0 style band active: sh[...,2] couples to z with +C1.
    sh = jnp.zeros((1, 1, 4)).at[..., 2].set(1.0)
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(float(eval_sh(1, sh, dirs)[0, 0]), C1, atol=1e-6)
    # sh[...,1] couples to y with -C1; sh[...,3] couples to x with -C1.
    sh = jnp.zeros((1, 1, 4)).at[..., 1].set(1.0)
    dirs = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(float(eval_sh(1, sh, dirs)[0, 0]), -C1, atol=1e-6)


def test_sh_linearity_deg4():
    key = jax.random.key(1)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (7, 3, 25))
    b = jax.random.normal(k2, (7, 3, 25))
    dirs = jax.random.normal(k3, (7, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    lhs = eval_sh(4, a + 2.0 * b, dirs)
    rhs = eval_sh(4, a, dirs) + 2.0 * eval_sh(4, b, dirs)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_psnr_known_value():
    a = jnp.zeros((10, 3))
    b = jnp.full((10, 3), 0.1)
    # mse = 0.01 -> psnr = 20 dB
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-3)


def test_ssim_identical_is_one():
    img = jax.random.uniform(jax.random.key(2), (32, 32, 3))
    np.testing.assert_allclose(float(ssim(img, img, 1.0)), 1.0, atol=1e-4)


def test_ssim_decreases_with_noise():
    img = jax.random.uniform(jax.random.key(3), (32, 32, 3))
    small = img + 0.02 * jax.random.normal(jax.random.key(4), img.shape)
    big = img + 0.3 * jax.random.normal(jax.random.key(5), img.shape)
    s_small = float(ssim(jnp.clip(small, 0, 1), img, 1.0))
    s_big = float(ssim(jnp.clip(big, 0, 1), img, 1.0))
    assert s_small > s_big
    assert 0.0 < s_big < s_small < 1.0
