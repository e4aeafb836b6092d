"""Depth-sample generation: stratified perturbation + hierarchical inverse-CDF.

Parity targets: reference `mega_nerf/rendering.py:472-536`
(`_expand_and_perturb_z_vals`, `_sample_pdf`, `_sample_cdf`). All functions
take an explicit jax PRNG key instead of relying on global RNG state, and
compile to static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_and_perturb_z_vals(
    z_vals: jnp.ndarray,
    perturb: float,
    key: jax.Array | None,
) -> jnp.ndarray:
    """Stratified jitter of per-ray depth samples.

    z_vals: (N_rays, S). When perturb > 0 each sample is redrawn uniformly in
    its interval [lower, upper) delimited by neighboring midpoints; scaled by
    `perturb`. Parity: reference `rendering.py:472-483`.
    """
    if perturb <= 0 or key is None:
        return z_vals
    mids = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    u = perturb * jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * u


def sample_cdf(
    bins: jnp.ndarray,
    cdf: jnp.ndarray,
    fine_samples: int,
    det: bool,
    key: jax.Array | None,
) -> jnp.ndarray:
    """Inverse-transform sampling of `fine_samples` depths from a per-ray CDF.

    bins: (N, S+1) bin edges; cdf: (N, S) cumulative weights in (0, 1].
    Deterministic mode uses an even linspace over [0, 1]. Parity:
    reference `rendering.py:505-536`.
    """
    n_rays, n_bins = cdf.shape
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, S+1)

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, fine_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (n_rays, fine_samples))
    else:
        u = jax.random.uniform(key, (n_rays, fine_samples), dtype=cdf.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_bins)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bins_lo = jnp.take_along_axis(bins, below, axis=-1)
    bins_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-8, jnp.ones_like(denom), denom)
    return bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    fine_samples: int,
    det: bool,
    key: jax.Array | None,
) -> jnp.ndarray:
    """Hierarchical resampling: draw fine depths proportional to coarse weights.

    bins: (N, S+1) interval midpoint edges; weights: (N, S) detached coarse
    compositing weights. Parity: reference `rendering.py:486-502`.
    """
    weights = weights + 1e-8
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    return sample_cdf(bins, cdf, fine_samples, det, key)
