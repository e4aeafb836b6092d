import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.ops import composite_weights


def test_constant_sigma_closed_form():
    # Homogeneous medium: weight of segment i = exp(-sigma*t_i) - exp(-sigma*t_{i+1})
    # (up to the reference's +1e-8 cumprod epsilon).
    n, s = 2, 64
    sigma = 3.0
    z = jnp.linspace(0.0, 2.0, s)[None].repeat(n, 0)
    sig = jnp.full((n, s), sigma)
    last_delta = jnp.full((n,), 1e10)
    out = composite_weights(sig, z, last_delta)
    w = np.asarray(out.weights)
    # Total opacity approaches 1 - exp(-sigma * length) as the last sample
    # has infinite extent -> alpha_last ~ 1, so total ~ 1.
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-3)
    # bg_lambda ~ 0 for an opaque last segment.
    assert (np.asarray(out.bg_lambda) < 1e-3).all()


def test_zero_sigma_transparent():
    n, s = 3, 16
    z = jnp.linspace(0.0, 1.0, s)[None].repeat(n, 0)
    sig = jnp.zeros((n, s))
    out = composite_weights(sig, z, jnp.full((n,), 1e10))
    np.testing.assert_allclose(np.asarray(out.weights), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.bg_lambda), 1.0, atol=1e-5)


def test_finite_last_delta_leaves_transmittance():
    # With a finite last delta and moderate sigma, some light passes through.
    n, s = 1, 8
    z = jnp.linspace(0.0, 1.0, s)[None]
    sig = jnp.full((n, s), 1.0)
    out = composite_weights(sig, z, jnp.array([0.5]))
    lam = float(out.bg_lambda[0])
    # Analytic: prod over segments of exp(-sigma*delta) (+eps); total optical
    # depth = 1.0 (path) + 0.5 (last) = 1.5.
    np.testing.assert_allclose(lam, np.exp(-1.5), rtol=5e-2)


def test_flip_descending_order():
    # Flipped (descending z) compositing matches unflipped on reversed input.
    n, s = 2, 12
    z = jnp.linspace(0.0, 1.0, s)[None].repeat(n, 0)
    sig = jnp.abs(jnp.sin(jnp.arange(s, dtype=jnp.float32)))[None].repeat(n, 0)
    fwd = composite_weights(sig, z, jnp.full((n,), 1e10), flip=False)
    rev = composite_weights(sig[:, ::-1][:, ::-1], z, jnp.full((n,), 1e10), flip=False)
    np.testing.assert_allclose(np.asarray(fwd.weights), np.asarray(rev.weights))
    flipped = composite_weights(sig, z[:, ::-1], jnp.full((n,), 1e10), flip=True)
    # Deltas have the same magnitudes -> same alphas -> same weights.
    np.testing.assert_allclose(
        np.asarray(flipped.weights), np.asarray(fwd.weights), atol=1e-6
    )


def test_weights_match_manual_cumprod():
    n, s = 1, 5
    z = jnp.array([[0.1, 0.3, 0.4, 0.8, 1.0]])
    sig = jnp.array([[0.5, 2.0, 0.0, 1.0, 3.0]])
    out = composite_weights(sig, z, jnp.array([2.0]))
    deltas = np.array([0.2, 0.1, 0.4, 0.2, 2.0])
    alphas = 1 - np.exp(-deltas * np.asarray(sig[0]))
    trans = np.cumprod(1 - alphas + 1e-8)
    trans_shift = np.concatenate([[1.0], trans[:-1]])
    np.testing.assert_allclose(np.asarray(out.weights[0]), alphas * trans_shift, rtol=1e-4)
    np.testing.assert_allclose(float(out.bg_lambda[0]), trans[-1], rtol=1e-4)
