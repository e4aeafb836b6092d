import jax
import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.ops import expand_and_perturb_z_vals, sample_cdf, sample_pdf


def test_perturb_zero_is_identity():
    z = jnp.linspace(0.0, 1.0, 16)[None].repeat(4, 0)
    out = expand_and_perturb_z_vals(z, 0.0, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(z))


def test_perturb_stays_within_strata():
    z = jnp.linspace(1.0, 5.0, 32)[None].repeat(8, 0)
    out = expand_and_perturb_z_vals(z, 1.0, jax.random.key(1))
    out = np.asarray(out)
    zn = np.asarray(z)
    mids = 0.5 * (zn[:, :-1] + zn[:, 1:])
    lower = np.concatenate([zn[:, :1], mids], -1)
    upper = np.concatenate([mids, zn[:, -1:]], -1)
    assert (out >= lower - 1e-6).all() and (out <= upper + 1e-6).all()
    # Still sorted per ray.
    assert (np.diff(out, axis=-1) >= -1e-6).all()


def test_sample_cdf_uniform_det_gives_linspace():
    n, s = 3, 8
    bins = jnp.linspace(2.0, 4.0, s + 1)[None].repeat(n, 0)
    cdf = jnp.linspace(1.0 / s, 1.0, s)[None].repeat(n, 0)
    out = sample_cdf(bins, cdf, 5, det=True, key=None)
    np.testing.assert_allclose(np.asarray(out), np.linspace(2.0, 4.0, 5)[None].repeat(3, 0), atol=1e-5)


def test_sample_pdf_concentrates_on_heavy_bin():
    n, s = 4, 10
    bins = jnp.linspace(0.0, 1.0, s + 1)[None].repeat(n, 0)
    w = jnp.zeros((n, s)).at[:, 7].set(1.0)  # all mass in bin [0.7, 0.8]
    out = sample_pdf(bins, w, 64, det=False, key=jax.random.key(2))
    out = np.asarray(out)
    assert ((out >= 0.69) & (out <= 0.81)).mean() > 0.95


def test_sample_pdf_det_reproducible_and_in_range():
    n, s = 2, 6
    bins = jnp.linspace(1.0, 3.0, s + 1)[None].repeat(n, 0)
    w = jnp.abs(jax.random.normal(jax.random.key(3), (n, s)))
    a = sample_pdf(bins, w, 16, det=True, key=None)
    b = sample_pdf(bins, w, 16, det=True, key=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) >= 1.0 - 1e-5).all() and (np.asarray(a) <= 3.0 + 1e-5).all()


def test_sample_pdf_handles_zero_weights():
    n, s = 2, 5
    bins = jnp.linspace(0.0, 1.0, s + 1)[None].repeat(n, 0)
    w = jnp.zeros((n, s))
    out = sample_pdf(bins, w, 8, det=True, key=None)
    assert np.isfinite(np.asarray(out)).all()
