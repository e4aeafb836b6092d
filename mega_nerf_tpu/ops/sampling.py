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
    reference `rendering.py:505-536` (random mode matches in distribution
    of the sample SET; see the sorted-uniform note below).

    Guarantee: the returned depths are ascending along the last axis in
    BOTH modes (u ascends and the inverse-CDF interpolation is monotone).
    """
    n_rays, n_bins = cdf.shape
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, S+1)

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, fine_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (n_rays, fine_samples))
    else:
        # Sorted uniforms via exponential spacings (Sukhatme): cumulative
        # sums of iid Exp(1) normalized by the (fs+1)-th partial sum are
        # EXACTLY the order statistics of fs iid U(0,1) draws. The sampled
        # depth SET is distributed identically to the reference's plain
        # torch.rand (rendering.py:517) — only the per-index order differs,
        # and every consumer is order-invariant — while the ascending order
        # guarantee lets the hierarchical merge compositor
        # (ops/compositing.py::composite_weights_merge) replace the O(S^2)
        # pairwise union with within-list prefix sums + O(Sa*Sb) cross
        # terms. No sort: TPU sorts are per-element scalar loops.
        e = -jnp.log1p(-jax.random.uniform(
            key, (n_rays, fine_samples + 1), dtype=cdf.dtype
        ))
        s = jnp.cumsum(e, axis=-1)
        u = s[:, :-1] / s[:, -1:]

    # Bracketing-neighbor lookup WITHOUT searchsorted / take_along_axis:
    # on TPU those compile to per-element binary-search while-loops and
    # scalar-core gathers (~150 ms/step at the paper config — profiled).
    # Both `bins` and `cdf` ascend, and "cdf_j <= u" is a prefix mask, so
    # the left neighbor of u is a prefix-masked MAX and the right neighbor
    # a suffix-masked MIN — XLA fuses each broadcast+select+reduce into one
    # vectorized pass with no (N, fs, S+1) materialization.
    # Semantics match searchsorted(cdf, u, side="right") with index clamping
    # (the clamps below cover u outside [cdf_0, cdf_S], including the
    # deterministic u = 1.0 endpoint), duplicate cdf values included: the
    # prefix max of an ascending array IS its last in-prefix element.
    # Finite sentinels, not +-inf: infs inside fused where/reduce kernels
    # produce 0*inf = NaN under XLA's optimized (but not de-optimized)
    # lowering. cdf lives in [0, 1] and bins are scene depths << 1e30.
    mask = cdf[:, None, :] <= u[:, :, None]  # (N, fs, S+1)
    neg = jnp.array(-1e30, cdf.dtype)
    pos = jnp.array(1e30, cdf.dtype)
    cdf_lo = jnp.max(jnp.where(mask, cdf[:, None, :], neg), axis=-1)
    cdf_hi = jnp.min(jnp.where(mask, pos, cdf[:, None, :]), axis=-1)
    bins_lo = jnp.max(jnp.where(mask, bins[:, None, :], neg), axis=-1)
    bins_hi = jnp.min(jnp.where(mask, pos, bins[:, None, :]), axis=-1)
    cdf_lo = jnp.maximum(cdf_lo, cdf[:, :1])
    bins_lo = jnp.maximum(bins_lo, bins[:, :1])
    cdf_hi = jnp.minimum(cdf_hi, cdf[:, -1:])
    bins_hi = jnp.minimum(bins_hi, bins[:, -1:])

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
