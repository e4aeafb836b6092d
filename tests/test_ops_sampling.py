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


def _random_sorted_cdf(key, n, s, duplicates=False):
    w = jnp.abs(jax.random.normal(key, (n, s))) + 1e-3
    if duplicates:
        # zero out runs of bins -> duplicate cdf values (flat regions)
        w = w * (jax.random.uniform(jax.random.key(7), (n, s)) > 0.4)
    cdf = jnp.cumsum(w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-8), -1)
    return jnp.concatenate([jnp.zeros((n, 1)), cdf], axis=-1)


def test_bracket_grouped_matches_dense():
    """The two-level grouped search is bit-identical to the full masked
    reduce, including duplicate cdf values, u at the 0/1 endpoints, and
    group sizes that do not divide the cdf length."""
    from mega_nerf_tpu.ops.sampling import _bracket_dense, _bracket_grouped

    for si, s in enumerate([65, 128, 257]):
        n = 5
        cdf = _random_sorted_cdf(jax.random.key(10 + si), n, s - 1,
                                 duplicates=(si % 2 == 0))
        bins = jnp.sort(jax.random.uniform(jax.random.key(20 + si), (n, s)),
                        axis=-1) * 3.0 + 0.5
        u = jnp.sort(jax.random.uniform(jax.random.key(30 + si), (n, 33)), -1)
        # exact endpoints + values equal to interior cdf entries
        u = u.at[:, 0].set(0.0).at[:, -1].set(1.0).at[:, 1].set(cdf[:, s // 2])
        for group in (16, 32, 7):
            got = _bracket_grouped(u, cdf, bins, group=group)
            want = _bracket_dense(u, cdf, bins)
            for a, b, name in zip(got, want,
                                  ["cdf_lo", "cdf_hi", "bins_lo", "bins_hi"]):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"s={s} group={group} {name}")


def test_sample_cdf_grouped_threshold_consistent():
    """sample_cdf output is identical just below and above the grouped-path
    size threshold when fed the same distribution shape."""
    n = 3
    for s in (63, 64, 200):  # 63 -> dense path, >=64 -> grouped path
        # sample_cdf takes cdf WITHOUT the leading zero (it adds it) and
        # bins with one more entry than cdf.
        cdf = _random_sorted_cdf(jax.random.key(40 + s), n, s - 1)[:, 1:]
        bins = jnp.linspace(0.5, 3.5, s)[None].repeat(n, 0)
        out = sample_cdf(bins, cdf, 17, det=True, key=None)
        out = np.asarray(out)
        assert np.isfinite(out).all()
        assert (np.diff(out, axis=-1) >= -1e-6).all()  # ascending guarantee
        assert (out >= 0.5 - 1e-5).all() and (out <= 3.5 + 1e-5).all()


def test_bracket_grouped_paper_shape_fuzz():
    """Bit-equality at the real eval shape class (cdf 257 entries, 512
    draws, sorted uniforms like the random path) over several seeds."""
    from mega_nerf_tpu.ops.sampling import _bracket_dense, _bracket_grouped

    for seed in range(3):
        n, s, fs = 4, 257, 512
        cdf = _random_sorted_cdf(jax.random.key(seed), n, s - 1,
                                 duplicates=(seed == 1))
        bins = jnp.cumsum(
            jax.random.uniform(jax.random.key(100 + seed), (n, s)) * 0.01
            + 1e-4, axis=-1,
        ) + 0.5
        e = -jnp.log1p(-jax.random.uniform(jax.random.key(200 + seed),
                                           (n, fs + 1)))
        t = jnp.cumsum(e, -1)
        u = t[:, :-1] / t[:, -1:]
        got = _bracket_grouped(u, cdf, bins)
        want = _bracket_dense(u, cdf, bins)
        for a, b, name in zip(got, want,
                              ["cdf_lo", "cdf_hi", "bins_lo", "bins_hi"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"seed={seed} {name}")
