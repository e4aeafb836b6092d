"""Alpha compositing for volume rendering.

Parity target: the compositing tail of the reference's `_inference`
(`mega_nerf/rendering.py:352-393`): deltas -> alphas -> transmittance ->
per-sample weights, with the NeRF++-style `bg_lambda` (transmittance past the
last sample) used to composite a background model behind the foreground.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeWeights(NamedTuple):
    weights: jnp.ndarray  # (N, S) per-sample compositing weights
    bg_lambda: jnp.ndarray  # (N,) transmittance after the final sample


def composite_weights(
    sigmas: jnp.ndarray,
    z_vals: jnp.ndarray,
    last_delta: jnp.ndarray,
    flip: bool = False,
) -> CompositeWeights:
    """Compute per-sample compositing weights from densities and depths.

    sigmas: (N, S) non-negative densities; z_vals: (N, S) sample depths
    (ascending, or descending when `flip` — the background model samples in
    descending inverse-depth order, reference `rendering.py:353-355`);
    last_delta: (N,) or (N, 1) the segment length past the final sample
    (1e10 for open rays, `fg_far - z_max` for rays capped by the background
    sphere).

    weights[i] = alpha[i] * prod_{j<i}(1 - alpha[j] + 1e-8)
    bg_lambda = prod_j (1 - alpha[j] + 1e-8)
    """
    if last_delta.ndim == sigmas.ndim:
        last_delta = last_delta[..., 0]
    if flip:
        deltas = z_vals[..., :-1] - z_vals[..., 1:]
    else:
        deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate([deltas, last_delta[..., None]], axis=-1)

    alphas = 1.0 - jnp.exp(-deltas * sigmas)
    # The 1e-8 inside the cumprod matches the reference (rendering.py:361) and
    # keeps gradients finite when alpha == 1.
    trans = jnp.cumprod(1.0 - alphas + 1e-8, axis=-1)
    bg_lambda = trans[..., -1]
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    return CompositeWeights(weights=alphas * trans, bg_lambda=bg_lambda)

def composite_weights_merge(
    z_a: jnp.ndarray,
    sigmas_a: jnp.ndarray,
    z_b: jnp.ndarray,
    sigmas_b: jnp.ndarray,
    last_delta: jnp.ndarray,
    flip: bool = False,
) -> CompositeWeights:
    """Compositing weights for the union of TWO PRE-SORTED sample lists.

    Exact drop-in for `composite_weights_union(concat([z_a, z_b], -1), ...)`
    when each list is sorted in composite order (ascending z, or descending
    when `flip`; within-list ties must be index-adjacent, which sortedness
    gives for free). Exploiting the structure drops the cost from
    O((Sa+Sb)^2) pairwise comparisons to within-list prefix sums (cumsum)
    plus O(Sa*Sb) cross-list masked reduces over ONE shared predicate —
    4.5x fewer ops at the paper config's 512+256 hierarchical merge
    (reference `rendering.py:336-350`), the renderer's only caller.

    Tie semantics match the union's strict (z, concat index) order: list A
    occupies the lower concat indices, so a B sample tied with an A sample
    composites AFTER it. Weights come back in concat order [A | B].

    z_a/sigmas_a: (N, Sa); z_b/sigmas_b: (N, Sb); last_delta: (N,) or (N, 1).
    """
    if last_delta.ndim == sigmas_a.ndim:
        last_delta = last_delta[..., 0]
    # Canonical keys: ascending in composite order; gaps in key space equal
    # gaps in z space for both directions.
    ka = -z_a if flip else z_a
    kb = -z_b if flip else z_b

    big = jnp.array(1e30, ka.dtype)  # finite sentinel (see union docstring)
    bigs = jnp.full_like(ka[..., :1], big)
    gap_a_own = jnp.concatenate([ka[..., 1:] - ka[..., :-1], bigs], axis=-1)
    gap_b_own = jnp.concatenate(
        [kb[..., 1:] - kb[..., :-1], jnp.full_like(kb[..., :1], big)], axis=-1
    )

    # Cross predicate: "b_j strictly before a_i" == kb_j < ka_i; its
    # complement is "b_j at-or-after a_i", which by the concat-index tie
    # rule is exactly "b_j composites after a_i". Each side gets its own
    # orientation of the (Sa, Sb) comparison so every masked reduce runs
    # over the MINOR axis: reducing the middle axis of a fused broadcast
    # faults the TPU backend outright at eval-sized N (observed at
    # N=16384, Sa=512, Sb=256), while minor-axis reduces fuse cleanly.
    kai = ka[..., :, None]  # (N, Sa, 1)
    kbj = kb[..., None, :]  # (N, 1, Sb)
    m = kbj < kai           # (N, Sa, Sb)
    kbi = kb[..., :, None]  # (N, Sb, 1)
    kaj = ka[..., None, :]  # (N, 1, Sa)
    mt = kaj > kbi          # (N, Sb, Sa) — m transposed

    gap_a_cross = jnp.min(jnp.where(m, big, kbj - kai), axis=-1)  # (N, Sa)
    gap_b_cross = jnp.min(jnp.where(mt, kaj - kbi, big), axis=-1)  # (N, Sb)
    delta_a = jnp.minimum(gap_a_own, gap_a_cross)
    delta_b = jnp.minimum(gap_b_own, gap_b_cross)
    delta_a = jnp.where(delta_a < 1e29, delta_a, last_delta[:, None])
    delta_b = jnp.where(delta_b < 1e29, delta_b, last_delta[:, None])

    u_a = -delta_a * sigmas_a
    u_b = -delta_b * sigmas_b
    log_eps = jnp.log(jnp.array(1e-8, u_a.dtype))
    log_t_a = jnp.logaddexp(u_a, log_eps)  # log(1 - alpha + 1e-8), stable VJP
    log_t_b = jnp.logaddexp(u_b, log_eps)

    # Exclusive within-list prefix sums (composite order == index order).
    ca = jnp.cumsum(log_t_a, axis=-1) - log_t_a
    cb = jnp.cumsum(log_t_b, axis=-1) - log_t_b
    # Cross contributions: everything in the other list that lies before.
    ta_cross = jnp.sum(jnp.where(m, log_t_b[..., None, :], 0.0), axis=-1)
    tb_cross = jnp.sum(jnp.where(mt, 0.0, log_t_a[..., None, :]), axis=-1)

    w_a = -jnp.expm1(u_a) * jnp.exp(ca + ta_cross)
    w_b = -jnp.expm1(u_b) * jnp.exp(cb + tb_cross)
    bg_lambda = jnp.exp(
        jnp.sum(log_t_a, axis=-1) + jnp.sum(log_t_b, axis=-1)
    )
    return CompositeWeights(
        weights=jnp.concatenate([w_a, w_b], axis=-1), bg_lambda=bg_lambda
    )


def _cross_terms_grouped(
    q: jnp.ndarray,
    keys: jnp.ndarray,
    log_t: jnp.ndarray | None,
    strict: bool,
    group: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Per-query cross-list terms against ONE sorted key list, two-level.

    For each query q_i over ascending keys (N, P) with per-key payload
    `log_t`, define prefix_i = {j : keys_j < q_i} (strict) or {keys_j <=
    q_i}. Returns (next_key, prefix_sum): the smallest key NOT in the
    prefix (1e30 sentinel if none) and the payload sum over the prefix
    (None when `log_t` is None — the keys-only mode skips the payload
    select entirely rather than einsumming a zeros payload).

    This is the merge compositor's O(Sa*Sb) pairwise work in O(Q*(G+g)):
    level 1 counts fully-prefix groups by their max key, the straddling
    group's block is selected with an exact one-hot matmul (MXU), and the
    within-block mask handles the boundary; whole-group payload sums ride
    an exclusive cumsum over G. Exact subset sums — only float
    reassociation differs from the pairwise form.
    """
    n, p = keys.shape
    g = group
    num_groups = -(-p // g)
    pad = num_groups * g - p
    big = jnp.array(1e30, keys.dtype)
    # Pads: 1e30 keys are never in any prefix (q is a real depth) and never
    # the next_key min unless no real key qualifies — the wanted sentinel.
    keys_p = jnp.pad(keys, ((0, 0), (0, pad)), constant_values=1e30)
    k_blk = keys_p.reshape(n, num_groups, g)
    gmax = k_blk[:, :, -1]
    gmin = k_blk[:, :, 0]

    def pred(k, x):
        return k < x if strict else k <= x

    full = pred(gmax[:, None, :], q[:, :, None])  # (N, Q, G)
    gi = jnp.minimum(
        jnp.sum(full.astype(jnp.int32), axis=-1), num_groups - 1
    )

    # ONE one-hot, ONE stacked select: the (N, Q, G) one-hot is a dot
    # operand (it materializes), so every per-group payload rides the same
    # einsum — the key block, the log_t block, the exclusive group-prefix
    # sum, and the next group's min key SHIFTED so the sentinel lands
    # where gi+1 would be out of range.
    hp = jax.lax.Precision.HIGHEST
    oh = (jnp.arange(num_groups) == gi[..., None]).astype(keys.dtype)
    next_min = jnp.concatenate(
        [gmin[:, 1:], jnp.full_like(gmin[:, :1], big)], axis=-1
    )
    if log_t is None:
        payload = jnp.concatenate(
            [k_blk, next_min[..., None]], axis=-1
        )  # (N, G, g + 1)
        sel = jnp.einsum("nqG,nGk->nqk", oh, payload, precision=hp)
        sel_k, next_group = sel[..., :g], sel[..., g]
        prefix_sum = None
    else:
        lt_blk = jnp.pad(
            log_t, ((0, 0), (0, pad))
        ).reshape(n, num_groups, g)
        group_sums = jnp.sum(lt_blk, axis=-1)  # (N, G)
        excl = jnp.cumsum(group_sums, axis=-1) - group_sums
        payload = jnp.concatenate(
            [k_blk, lt_blk, jnp.stack([excl, next_min], axis=-1)], axis=-1
        )  # (N, G, 2g + 2)
        sel = jnp.einsum("nqG,nGk->nqk", oh, payload, precision=hp)
        sel_k, sel_lt = sel[..., :g], sel[..., g:2 * g]
        group_prefix, next_group = sel[..., 2 * g], sel[..., 2 * g + 1]

    m = pred(sel_k, q[:, :, None])  # (N, Q, g)
    if log_t is not None:
        prefix_sum = group_prefix + jnp.sum(
            jnp.where(m, sel_lt, 0.0), axis=-1
        )
    next_within = jnp.min(jnp.where(m, big, sel_k), axis=-1)
    return jnp.minimum(next_within, next_group), prefix_sum


def composite_weights_merge_grouped(
    z_a: jnp.ndarray,
    sigmas_a: jnp.ndarray,
    z_b: jnp.ndarray,
    sigmas_b: jnp.ndarray,
    last_delta: jnp.ndarray,
    flip: bool = False,
    group: int = 16,
) -> CompositeWeights:
    """`composite_weights_merge` with two-level grouped cross terms.

    Same contract and tie semantics (lists pre-sorted in composite order;
    A occupies the lower concat indices). The O(Sa*Sb) pairwise masked
    reduces — ~20% of eval device time at the paper config even in the
    4.5x-cheaper merge form (PERF.md round-3 profile) — become
    O(Sa*(G+g)) grouped searches plus exact one-hot block selects
    (`_cross_terms_grouped`). Results differ from the pairwise form only
    by float reassociation of the prefix log-transmittance sums
    (tests/test_ops_compositing.py pins allclose at 1e-5).

    Also a candidate workaround for the deployed-compiler fault that
    forces eval onto the union compositor (render/compositor_probe.py):
    the grouped lowering contains no (N, Sa, Sb) fused broadcasts at all.
    """
    if last_delta.ndim == sigmas_a.ndim:
        last_delta = last_delta[..., 0]
    ka = -z_a if flip else z_a
    kb = -z_b if flip else z_b

    big = jnp.array(1e30, ka.dtype)
    gap_a_own = jnp.concatenate(
        [ka[..., 1:] - ka[..., :-1], jnp.full_like(ka[..., :1], big)], axis=-1
    )
    gap_b_own = jnp.concatenate(
        [kb[..., 1:] - kb[..., :-1], jnp.full_like(kb[..., :1], big)], axis=-1
    )

    log_eps = jnp.log(jnp.array(1e-8, ka.dtype))

    # Tie rule (concat order: A before B): a B sample tied with an A sample
    # composites AFTER it. Successors of a_i in B = {kb_j >= ka_i} =
    # complement of the STRICT prefix {kb_j < ka_i}; successors of b_j in
    # A = {ka_i > kb_j} = complement of the NON-STRICT prefix
    # {ka_i <= kb_j}. Deltas depend only on keys, so next-keys come first;
    # the prefix log-transmittance sums need log_t (which needs deltas)
    # and run as a second grouped pass — XLA CSEs the repeated group
    # search and block selects between the two passes.
    next_b_for_a, _ = _cross_terms_grouped(
        ka, kb, None, strict=True, group=group
    )
    next_a_for_b, _ = _cross_terms_grouped(
        kb, ka, None, strict=False, group=group
    )
    delta_a = jnp.minimum(gap_a_own, next_b_for_a - ka)
    delta_b = jnp.minimum(gap_b_own, next_a_for_b - kb)
    delta_a = jnp.where(delta_a < 1e29, delta_a, last_delta[:, None])
    delta_b = jnp.where(delta_b < 1e29, delta_b, last_delta[:, None])

    u_a = -delta_a * sigmas_a
    u_b = -delta_b * sigmas_b
    log_t_a = jnp.logaddexp(u_a, log_eps)
    log_t_b = jnp.logaddexp(u_b, log_eps)

    _, ta_cross = _cross_terms_grouped(
        ka, kb, log_t_b, strict=True, group=group
    )
    _, tb_cross = _cross_terms_grouped(
        kb, ka, log_t_a, strict=False, group=group
    )

    ca = jnp.cumsum(log_t_a, axis=-1) - log_t_a
    cb = jnp.cumsum(log_t_b, axis=-1) - log_t_b
    w_a = -jnp.expm1(u_a) * jnp.exp(ca + ta_cross)
    w_b = -jnp.expm1(u_b) * jnp.exp(cb + tb_cross)
    bg_lambda = jnp.exp(
        jnp.sum(log_t_a, axis=-1) + jnp.sum(log_t_b, axis=-1)
    )
    return CompositeWeights(
        weights=jnp.concatenate([w_a, w_b], axis=-1), bg_lambda=bg_lambda
    )


def composite_weights_union(
    z_all: jnp.ndarray,
    sigmas: jnp.ndarray,
    last_delta: jnp.ndarray,
    flip: bool = False,
) -> CompositeWeights:
    """Compositing weights for an UNSORTED union of sample sets.

    Sort-free equivalent of `sort(z) -> composite_weights` for the
    hierarchical coarse+fine merge (reference `rendering.py:336-361`). On
    TPU, the sorted formulation costs a sort custom-call plus
    take-along-axis payload gathers forward and scatters backward (~90 ms
    of a 171 ms train step at the paper config — profiled); here every
    order-dependent quantity is instead a masked reduction over the (S, S)
    pairwise depth comparison, which XLA fuses into vectorized
    compare+reduce passes, and the backward pass is reductions too:

    - successor gap:  delta_i = min_{j after i} z_j - z_i  (else last_delta)
    - transmittance:  T_i = exp( sum_{j before i} log(1 - alpha_j + 1e-8) )
    - weights_i = alpha_i * T_i ; bg_lambda = prod over ALL samples.

    "before/after" is the strict total order (z, index) — ascending z, or
    descending when `flip` — exactly a stable argsort of z_all, so ties
    (duplicate depths) get delta 0 like the sorted path. Weights come back
    in the ORIGINAL sample order; compositing consumers (rgb/depth sums)
    are order-invariant, so no reordering of payloads is ever needed.

    z_all: (N, S) union depths; sigmas: (N, S); last_delta: (N,) or (N, 1).
    """
    if last_delta.ndim == sigmas.ndim:
        last_delta = last_delta[..., 0]
    n, s = z_all.shape
    idx = jnp.arange(s)
    zi = z_all[:, :, None]  # (N, S, 1) "self"
    zj = z_all[:, None, :]  # (N, 1, S) "other"
    tie = (zj == zi) & (idx[None, :] > idx[:, None])
    if flip:
        after = (zj < zi) | tie  # descending order: after == smaller z
        gap = zi - zj
    else:
        after = (zj > zi) | tie
        gap = zj - zi

    # Finite sentinel, not +inf: an inf inside a fused where/min backward
    # pass produces 0*inf = NaN cotangents under XLA (observed on the bg
    # flip path). 1e30 is far above any real gap (z <= far <= 1e10).
    big = jnp.array(1e30, z_all.dtype)
    succ_gap = jnp.min(jnp.where(after, gap, big), axis=-1)  # (N, S)
    deltas = jnp.where(succ_gap < 1e29, succ_gap, last_delta[:, None])

    u = -deltas * sigmas  # log-survival per segment, <= 0
    alphas = -jnp.expm1(u)
    # log-domain exclusive "cumprod" (1e-8 matches reference rendering.py:361).
    # logaddexp(u, log 1e-8) == log(exp(u) + 1e-8) == log(1 - alpha + 1e-8),
    # but composing log(1 - alphas + 1e-8) literally NaNs under XLA's fused
    # backward when u underflows (grad -1/(1e-8) * 1e10 * exp(-huge) gets
    # reassociated into inf * 0); logaddexp's VJP is stable by construction.
    log_t = jnp.logaddexp(u, jnp.log(jnp.array(1e-8, u.dtype)))  # (N, S)
    before = jnp.swapaxes(after, -1, -2)  # before[i, j] == after[j, i]
    trans = jnp.exp(jnp.sum(jnp.where(before, log_t[:, None, :], 0.0), axis=-1))
    bg_lambda = jnp.exp(jnp.sum(log_t, axis=-1))
    return CompositeWeights(weights=alphas * trans, bg_lambda=bg_lambda)
