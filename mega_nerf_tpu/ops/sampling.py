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


def _bracket_dense(
    u: jnp.ndarray, cdf: jnp.ndarray, bins: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bracketing (cdf_lo, cdf_hi, bins_lo, bins_hi) of each u in a per-ray
    ascending cdf, via full masked reduces over all S+1 entries.

    Semantics match searchsorted(cdf, u, side="right") BEFORE the boundary
    clamps (callers clamp). O(fs * S) VPU work per ray.
    """
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
    return cdf_lo, cdf_hi, bins_lo, bins_hi


def _bracket_grouped(
    u: jnp.ndarray, cdf: jnp.ndarray, bins: jnp.ndarray, group: int = 16
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`_bracket_dense` in O(fs * (G + g)) VPU work via a two-level search.

    The dense bracketing is ~19% of eval device time at the paper config
    (PERF.md round-3 profile: 64 ms of 331 per 16k-ray chunk). Both cdf and
    u ascend, so the bracketing pair lives in ONE g-wide group of the cdf:
    level 1 counts how many group-max values precede u (G compares), the
    straddling group's block is selected with a one-hot matmul (MXU, exact:
    one-hot weights are 0/1), and the within-block masked reduces run over
    g elements instead of S+1. Group-level candidates gmax[gi-1] /
    gmin[gi+1] cover brackets that fall outside the selected block.
    Bit-identical to `_bracket_dense` (tests/test_ops_sampling.py).
    """
    n_rays, p = cdf.shape
    fs = u.shape[-1]
    g = group
    num_groups = -(-p // g)
    pad = num_groups * g - p
    # +1e30 pads sit past the real entries: never <= u (so never in a
    # prefix), and the callers' boundary clamps remove them from hi-side
    # mins when u exceeds every real cdf value.
    big = jnp.array(1e30, cdf.dtype)
    neg = -big
    cdf_p = jnp.pad(cdf, ((0, 0), (0, pad)), constant_values=1e30)
    bins_p = jnp.pad(bins, ((0, 0), (0, pad)), constant_values=1e30)
    cdf_blocks = cdf_p.reshape(n_rays, num_groups, g)
    bins_blocks = bins_p.reshape(n_rays, num_groups, g)
    gmax_cdf = cdf_blocks[:, :, -1]  # (N, G) last (== max) of each group
    gmin_cdf = cdf_blocks[:, :, 0]
    gmax_bins = bins_blocks[:, :, -1]
    gmin_bins = bins_blocks[:, :, 0]

    # Level 1: straddling group index. Groups < gi are entirely prefix
    # (their max <= u); groups > gi entirely suffix (ascending cdf).
    gi = jnp.sum(
        (gmax_cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1
    )
    gi = jnp.minimum(gi, num_groups - 1)  # u past every group max

    # Level 2: ONE one-hot, ONE stacked select (no row gathers on TPU).
    # The one-hot is a (N, fs, G) dot operand, so it materializes — build
    # it once and read it once by stacking every payload the bracket
    # needs along the last axis: the cdf block, the bins block, and the
    # group-level bracket candidates. Those candidates — the last
    # fully-prefix group's max (bracket lo when the block's first element
    # already exceeds u) and the first fully-suffix group's min (bracket
    # hi when the block is all prefix) — become SHIFTED per-group arrays
    # (prev-max, next-min) so the same oh selects them, sentinels landing
    # exactly where gi-1 / gi+1 would be out of range. The one-hot is
    # exact in any dtype; HIGHEST precision keeps the f32 payload
    # un-truncated (default TPU dots round f32 inputs to bf16).
    oh = (jnp.arange(num_groups) == gi[..., None]).astype(cdf.dtype)
    prev_max_cdf = jnp.concatenate(
        [jnp.full_like(gmax_cdf[:, :1], neg), gmax_cdf[:, :-1]], axis=-1
    )
    prev_max_bins = jnp.concatenate(
        [jnp.full_like(gmax_bins[:, :1], neg), gmax_bins[:, :-1]], axis=-1
    )
    next_min_cdf = jnp.concatenate(
        [gmin_cdf[:, 1:], jnp.full_like(gmin_cdf[:, :1], big)], axis=-1
    )
    next_min_bins = jnp.concatenate(
        [gmin_bins[:, 1:], jnp.full_like(gmin_bins[:, :1], big)], axis=-1
    )
    payload = jnp.concatenate(
        [
            cdf_blocks,
            bins_blocks,
            jnp.stack(
                [prev_max_cdf, prev_max_bins, next_min_cdf, next_min_bins],
                axis=-1,
            ),
        ],
        axis=-1,
    )  # (N, G, 2g + 4)
    sel = jnp.einsum(
        "nfG,nGk->nfk", oh, payload, precision=jax.lax.Precision.HIGHEST
    )
    sel_cdf, sel_bins = sel[..., :g], sel[..., g:2 * g]
    glo_cdf, glo_bins = sel[..., 2 * g], sel[..., 2 * g + 1]
    ghi_cdf, ghi_bins = sel[..., 2 * g + 2], sel[..., 2 * g + 3]

    m = sel_cdf <= u[:, :, None]  # (N, fs, g)
    lo_cdf_w = jnp.max(jnp.where(m, sel_cdf, neg), axis=-1)
    hi_cdf_w = jnp.min(jnp.where(m, big, sel_cdf), axis=-1)
    lo_bins_w = jnp.max(jnp.where(m, sel_bins, neg), axis=-1)
    hi_bins_w = jnp.min(jnp.where(m, big, sel_bins), axis=-1)

    return (
        jnp.maximum(lo_cdf_w, glo_cdf),
        jnp.minimum(hi_cdf_w, ghi_cdf),
        jnp.maximum(lo_bins_w, glo_bins),
        jnp.minimum(hi_bins_w, ghi_bins),
    )


def sample_cdf(
    bins: jnp.ndarray,
    cdf: jnp.ndarray,
    fine_samples: int,
    det: bool,
    key: jax.Array | None,
    grouped: bool | None = None,
) -> jnp.ndarray:
    """Inverse-transform sampling of `fine_samples` depths from a per-ray CDF.

    bins: (N, S+1) bin edges; cdf: (N, S) cumulative weights in (0, 1].
    Deterministic mode uses an even linspace over [0, 1]. Parity:
    reference `rendering.py:505-536` (random mode matches in distribution
    of the sample SET; see the sorted-uniform note below).

    `grouped`: None = size heuristic (two-level bracketing when the cdf has
    >= 64 entries); True/False force the grouped / dense bracketing. The
    train render path forces False until the grouped einsum pattern is
    validated against the deployed compiler next to the fused train
    kernels (render/rendering.py).

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
    # vectorized pass with no (N, fs, S+1) materialization. At eval sizes
    # the two-level grouped search does the same in ~9x less VPU work
    # (`_bracket_grouped`); tiny cdfs keep the single-level reduce.
    # Semantics match searchsorted(cdf, u, side="right") with index clamping
    # (the clamps below cover u outside [cdf_0, cdf_S], including the
    # deterministic u = 1.0 endpoint), duplicate cdf values included: the
    # prefix max of an ascending array IS its last in-prefix element.
    if grouped is None:
        grouped = cdf.shape[-1] >= 64
    bracket = _bracket_grouped if grouped else _bracket_dense
    cdf_lo, cdf_hi, bins_lo, bins_hi = bracket(u, cdf, bins)
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
    grouped: bool | None = None,
) -> jnp.ndarray:
    """Hierarchical resampling: draw fine depths proportional to coarse weights.

    bins: (N, S+1) interval midpoint edges; weights: (N, S) detached coarse
    compositing weights. Parity: reference `rendering.py:486-502`.
    """
    weights = weights + 1e-8
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    return sample_cdf(bins, cdf, fine_samples, det, key, grouped=grouped)
