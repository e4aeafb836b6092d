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


def _sorted_lists(rng, n, sa, sb, flip, ties=False):
    za = np.sort(rng.uniform(1.0, 9.0, (n, sa)).astype(np.float32), axis=-1)
    zb = np.sort(rng.uniform(1.0, 9.0, (n, sb)).astype(np.float32), axis=-1)
    if ties:
        # Inject cross-list and within-list duplicate depths (re-sorting
        # afterwards keeps the merge's sortedness precondition).
        zb[:, 1] = za[:, 2]
        za[:, 4] = za[:, 3]
        za = np.sort(za, axis=-1)
        zb = np.sort(zb, axis=-1)
    if flip:
        za = za[:, ::-1].copy()
        zb = zb[:, ::-1].copy()
    sig_a = rng.uniform(0.0, 3.0, (n, sa)).astype(np.float32)
    sig_b = rng.uniform(0.0, 3.0, (n, sb)).astype(np.float32)
    return map(jnp.asarray, (za, sig_a, zb, sig_b))


def test_merge_matches_union():
    from mega_nerf_tpu.ops import composite_weights_merge, composite_weights_union

    rng = np.random.default_rng(0)
    for flip in (False, True):
        for ties in (False, True):
            za, sa_, zb, sb_ = _sorted_lists(rng, 3, 8, 5, flip, ties)
            last = jnp.asarray(rng.uniform(0.5, 2.0, (3,)).astype(np.float32))
            got = composite_weights_merge(za, sa_, zb, sb_, last, flip=flip)
            want = composite_weights_union(
                jnp.concatenate([za, zb], -1),
                jnp.concatenate([sa_, sb_], -1),
                last, flip=flip,
            )
            np.testing.assert_allclose(
                np.asarray(got.weights), np.asarray(want.weights),
                rtol=1e-6, atol=1e-7,
                err_msg=f"flip={flip} ties={ties}",
            )
            np.testing.assert_allclose(
                np.asarray(got.bg_lambda), np.asarray(want.bg_lambda),
                rtol=1e-5, atol=1e-12, err_msg=f"flip={flip} ties={ties}",
            )


def test_merge_gradients_match_union():
    import jax

    from mega_nerf_tpu.ops import composite_weights_merge, composite_weights_union

    rng = np.random.default_rng(1)
    za, sa_, zb, sb_ = _sorted_lists(rng, 2, 6, 4, False)
    last = jnp.asarray(np.float32([1.0, 1.5]))
    probe = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32))

    def loss_merge(sa, sb):
        cw = composite_weights_merge(za, sa, zb, sb, last)
        return jnp.sum(cw.weights * probe) + jnp.sum(cw.bg_lambda)

    def loss_union(sa, sb):
        cw = composite_weights_union(
            jnp.concatenate([za, zb], -1), jnp.concatenate([sa, sb], -1), last
        )
        return jnp.sum(cw.weights * probe) + jnp.sum(cw.bg_lambda)

    g0 = jax.grad(loss_merge, argnums=(0, 1))(sa_, sb_)
    g1 = jax.grad(loss_union, argnums=(0, 1))(sa_, sb_)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_sample_cdf_random_mode_ascending():
    import jax

    from mega_nerf_tpu.ops import sample_cdf

    rng = np.random.default_rng(2)
    bins = jnp.asarray(np.sort(rng.uniform(1, 9, (4, 9)), -1).astype(np.float32))
    w = rng.uniform(0.1, 1.0, (4, 8)).astype(np.float32)
    cdf = jnp.asarray(np.cumsum(w / w.sum(-1, keepdims=True), -1))
    out = np.asarray(sample_cdf(bins, cdf, 32, det=False, key=jax.random.key(3)))
    assert (np.diff(out, axis=-1) >= 0).all()
    assert (out >= np.asarray(bins)[:, :1]).all()
    assert (out <= np.asarray(bins)[:, -1:]).all()


def test_merge_grouped_matches_merge():
    """The two-level grouped cross terms reproduce the pairwise merge
    compositor — flips, ties, non-dividing group sizes, and list lengths
    spanning the paper config's 512+256 shape class."""
    from mega_nerf_tpu.ops.compositing import (
        composite_weights_merge,
        composite_weights_merge_grouped,
    )

    rng = np.random.default_rng(5)
    for sa, sb in ((8, 5), (40, 23), (64, 32)):
        for flip in (False, True):
            for ties in (False, True):
                za, sa_, zb, sb_ = _sorted_lists(rng, 3, sa, sb, flip, ties)
                last = jnp.asarray(
                    rng.uniform(0.5, 2.0, (3,)).astype(np.float32)
                )
                want = composite_weights_merge(za, sa_, zb, sb_, last, flip=flip)
                for group in (16, 7):
                    got = composite_weights_merge_grouped(
                        za, sa_, zb, sb_, last, flip=flip, group=group
                    )
                    np.testing.assert_allclose(
                        np.asarray(got.weights), np.asarray(want.weights),
                        rtol=2e-5, atol=1e-6,
                        err_msg=f"sa={sa} sb={sb} flip={flip} ties={ties} "
                                f"group={group}",
                    )
                    np.testing.assert_allclose(
                        np.asarray(got.bg_lambda), np.asarray(want.bg_lambda),
                        rtol=2e-5, atol=1e-10,
                        err_msg=f"sa={sa} sb={sb} flip={flip} ties={ties} "
                                f"group={group}",
                    )


def test_merge_grouped_gradients_match():
    import jax

    from mega_nerf_tpu.ops.compositing import (
        composite_weights_merge,
        composite_weights_merge_grouped,
    )

    rng = np.random.default_rng(6)
    za, sa_, zb, sb_ = _sorted_lists(rng, 2, 6, 4, False)
    last = jnp.asarray(np.float32([1.0, 1.5]))
    probe = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32))

    def mk(fn):
        def loss(sa, sb):
            cw = fn(za, sa, zb, sb, last)
            return jnp.sum(cw.weights * probe) + jnp.sum(cw.bg_lambda)
        return loss

    g0 = jax.grad(mk(composite_weights_merge_grouped), argnums=(0, 1))(sa_, sb_)
    g1 = jax.grad(mk(composite_weights_merge), argnums=(0, 1))(sa_, sb_)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
