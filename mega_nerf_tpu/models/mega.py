"""MegaNeRF spatial mixture: route sample points to spatial submodules.

Parity target: reference `mega_nerf/models/mega_nerf.py`. The reference
boolean-indexes points per submodule (dynamic shapes); the TPU-native design
is dense: every submodule is evaluated on every point via `jax.vmap` over a
*stacked* parameter pytree (leading axis = submodule), and results are
blended with routing weights that are zero outside each cell's boundary
margin. With a hard assignment (margin == 1) the blend is a one-hot select.

Dense evaluation costs K× FLOPs at query time; for the merged-model render
path this is acceptable for K ≤ 8 and fully MXU-friendly. The training path
never pays it — independent cells train under `shard_map` with their own
parameters (see `mega_nerf_tpu.parallel`).

For large K (the reference's 25-submodule models, `README.md:46`),
`mega_apply_routed` replaces the dense blend: points are bucketed by their
nonzero-weight submodules, sorted so each bucket occupies contiguous
block-aligned slots, and evaluated block-by-block with only the owning
submodule's parameters — ~M×N point evaluations (M = experts/point, 1 for
hard assignment) instead of K×N, with identical results.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax


def cluster_weights(
    points: jnp.ndarray,
    centroids: jnp.ndarray,
    boundary_margin: float,
    cluster_dim_start: int = 0,
) -> jnp.ndarray:
    """Routing weights of each point over K submodule centroids.

    points: (N, 3) positions used for routing (for background points these
    are the *real-world* coordinates, reference `mega_nerf.py:36`);
    centroids: (K, 3). `cluster_dim_start` = 1 drops the altitude dimension
    (cluster_2d). Returns (N, K) weights summing to 1 per point.

    margin == 1 -> hard argmin one-hot (reference `mega_nerf.py:29-30,46-47`);
    margin > 1 -> inverse-distance blend over submodules whose distance is
    within margin × the minimum (reference `mega_nerf.py:21-27`).
    """
    p = points[..., cluster_dim_start:3]
    c = centroids[:, cluster_dim_start:]
    dists = jnp.linalg.norm(p[..., None, :] - c[None, ...], axis=-1)  # (N, K)

    if boundary_margin == 1:
        return jax.nn.one_hot(jnp.argmin(dists, axis=-1), centroids.shape[0],
                              dtype=points.dtype)

    inv = 1.0 / (dists + 1e-8)
    min_d = jnp.min(dists, axis=-1, keepdims=True)
    inv = jnp.where(dists > boundary_margin * min_d, 0.0, inv)
    return inv / jnp.sum(inv, axis=-1, keepdims=True)


def mega_apply(
    apply_fn: Callable[..., jnp.ndarray],
    stacked_params,
    weights: jnp.ndarray,
    xyz: jnp.ndarray,
    dirs: Optional[jnp.ndarray] = None,
    image_indices: Optional[jnp.ndarray] = None,
    sigma_noise: Optional[jnp.ndarray] = None,
    sigma_only: bool = False,
) -> jnp.ndarray:
    """Blend K submodule evaluations with per-point routing weights.

    apply_fn(params, xyz, dirs, image_indices, sigma_noise, sigma_only) is a
    single-submodule forward; stacked_params has a leading K axis on every
    leaf; weights: (N, K) from `cluster_weights`. Dense equivalent of the
    reference's masked scatter-add (`mega_nerf.py:34-49`) — identical output,
    static shapes.
    """
    outs = jax.vmap(
        lambda p: apply_fn(p, xyz, dirs, image_indices, sigma_noise, sigma_only)
    )(stacked_params)  # (K, N, C)
    return jnp.einsum("nk,knc->nc", weights.astype(outs.dtype), outs)


def mega_apply_ray_routed(
    apply_fn: Callable[..., jnp.ndarray],
    stacked_params,
    centroids: jnp.ndarray,
    boundary_margin: float,
    cluster_dim_start: int,
    xyz: jnp.ndarray,
    rays_d: Optional[jnp.ndarray],
    image_indices: Optional[jnp.ndarray],
    support: jnp.ndarray,
    capacity: int,
    sigma_only: bool = False,
    xyz_real: bool = False,
    cell_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Ray-granularity routed mixture: each submodule evaluates ONLY the
    rays whose support set contains it, in a static-capacity bucket.

    The TPU-honest replacement for `mega_apply_routed`'s per-POINT
    sorted-gather (measured ~50x below MLP throughput on v5e: per-point
    argsort + row gathers + scatter-adds run on the scalar core —
    PERF.md "routed vs dense"). Here every data movement is a one-hot
    matmul (MXU) and the unit of routing is a whole RAY:

      1. `support` (R, K) bool says which cells can have nonzero routing
         weight anywhere on each ray (host: `cell_cull.ray_support_masks`
         — a conservative superset; in-graph: any() over the true
         per-point weights). `capacity` (static) must be >= the largest
         per-cell ray count; the caller buckets it to a power of two so
         distinct compiles stay O(log R).
      2. One cumsum assigns each (ray, cell) pair a slot; a one-hot
         dispatch tensor D (R, K, C) sends each supported ray's compact
         payload [flattened sample positions | view dir | appearance id]
         to its cells via a single HIGHEST-precision matmul — exact: 0/1
         weights, one nonzero per output row, f32 multiplies.
      3. Each expert k (vmap over the stacked param axis — no parameter
         gather at all) recomputes `cluster_weights` on its own points and
         keeps only ITS column: per-point blend weights never need to be
         dispatched. Experts run the ordinary `apply_fn` on (C*S) points.
      4. The transpose of D combines pre-weighted expert outputs back into
         ray order — again one matmul; each output point sums exactly its
         supported cells' `w_k * f_k`, i.e. the dense blend restricted to
         the support set.

    EXACTNESS CONTRACT: equals `mega_apply` wherever `support` covers
    every cell with nonzero `cluster_weights` along the ray (conservative
    supersets only add zero-weight terms) AND `capacity` >= max per-cell
    load (overflowed rays would silently drop — callers with host-side
    masks must size it; see `ray_route_capacity`).

    Cost: sum(|support|) / (K * R) of the dense blend's MLP FLOPs (the
    padding slots evaluate dead zeros that the combine drops), plus two
    one-hot matmuls over the compact payload — O(K*C*R*(S*D+4)) MACs,
    orders below the MLP at paper widths.

    xyz: (R, S, D) model input whose [..., :3] are the routing
    coordinates (mirrors `ModelBundle.apply`: `xyz_real=True` feeds
    [..., 3:] to the model); rays_d: (R, 3) per-ray view directions or
    None; image_indices: (R,) int32 or None. Returns (R, S, O) f32.

    VIRTUAL EXPERTS (`cell_ids`): a single shared capacity pads every
    cell to the MAX per-cell load — with skewed supports (a camera's
    central cells are supported by every ray) the padding eats all the
    savings (measured: K=25 ray-routing 0.57x dense before this).
    `ray_route_plan` splits hot cells into load-balanced replicas: it
    expands `support` to (R, Kv) virtual-expert columns, each holding at
    most `capacity` rays of ONE cell, and returns `cell_ids` (Kv,) int32
    mapping each virtual expert to the cell whose parameters and weight
    column it uses. Replicas of a cell partition its rays, so summing
    their combined outputs is exactly the single-expert sum; empty cells
    get no replica at all (free culling). With `cell_ids=None` the
    experts are the cells themselves (support must be (R, K)).
    """
    r, s, d = xyz.shape
    k = centroids.shape[0]
    c = int(capacity)
    support = support.astype(bool)
    if cell_ids is None:
        assert support.shape[1] == k
        cell_ids = jnp.arange(k)
    else:
        cell_ids = jnp.asarray(cell_ids, jnp.int32)
        assert support.shape[1] == cell_ids.shape[0]
        stacked_params = jax.tree.map(lambda x: x[cell_ids], stacked_params)
    kv = support.shape[1]

    pos = jnp.cumsum(support.astype(jnp.int32), axis=0) - 1  # (R, Kv)
    slot = jnp.where(support, pos, c)  # dead -> out of range -> zero row
    disp = jax.nn.one_hot(slot, c, dtype=jnp.float32)  # (R, Kv, C)

    pay = [xyz.reshape(r, s * d).astype(jnp.float32)]
    if rays_d is not None:
        pay.append(rays_d.astype(jnp.float32))
    if image_indices is not None:
        pay.append(image_indices.astype(jnp.float32)[:, None])
    payload = jnp.concatenate(pay, axis=-1) if len(pay) > 1 else pay[0]

    hi = jax.lax.Precision.HIGHEST
    sent = jnp.einsum("rkc,rp->kcp", disp, payload, precision=hi)

    xk = sent[..., : s * d].reshape(kv, c * s, d)
    off = s * d
    dk = None
    if rays_d is not None:
        dk = jnp.broadcast_to(
            sent[..., off : off + 3][:, :, None, :], (kv, c, s, 3)
        ).reshape(kv, c * s, 3)
        off += 3
    ik = None
    if image_indices is not None:
        ik = jnp.broadcast_to(
            jnp.round(sent[..., off]).astype(jnp.int32)[:, :, None], (kv, c, s)
        ).reshape(kv, c * s)

    def expert_fn(p_k, cid, xf, df, if_):
        routing_pts = xf[..., :3]
        model_in = xf[..., 3:] if xyz_real else xf
        w = cluster_weights(
            routing_pts, centroids, boundary_margin, cluster_dim_start
        )  # (C*S, K)
        wk = jnp.einsum(
            "nk,k->n", w, jax.nn.one_hot(cid, k, dtype=w.dtype),
            precision=hi,
        )
        out = apply_fn(p_k, model_in, df, if_, None, sigma_only)  # (C*S, O)
        return out.astype(jnp.float32) * wk[:, None].astype(jnp.float32)

    outs = jax.vmap(expert_fn)(
        stacked_params, cell_ids, xk, dk, ik
    )  # (Kv, C*S, O)
    o_dim = outs.shape[-1]
    combined = jnp.einsum(
        "rkc,kcq->rq",
        disp,
        outs.reshape(kv, c, s * o_dim),
        precision=hi,
    )
    return combined.reshape(r, s, o_dim)


def ray_route_capacity(support, bucket: bool = True) -> int:
    """Static dispatch capacity for `mega_apply_ray_routed`: the max
    per-cell ray count of `support` (host-side numpy (R, K) bool),
    rounded up to a power of two so chunked render loops compile
    O(log R) variants instead of one per distinct load."""
    import numpy as np

    counts = np.asarray(support, bool).sum(axis=0)
    cap = max(int(counts.max()) if counts.size else 0, 1)
    if bucket:
        cap = 1 << (cap - 1).bit_length()
    return cap


def ray_route_plan(support, bucket: bool = True, expert_cost: float = 4.0,
                   capacity: int = 0, pad_experts_to: int = 0):
    """Load-balanced virtual-expert plan for `mega_apply_ray_routed`.

    support: host-side numpy (R, K) bool. Returns
    `(support_v (R, Kv) bool, cell_ids (Kv,) int32, capacity int)`:
    each cell with load L is split into ceil(L / capacity) replicas
    holding consecutive blocks of its supporting rays, so every
    virtual-expert column carries at most `capacity` rays REGARDLESS of
    load skew (a single shared capacity pads every cell to the max load
    — ruinous when a camera's central cells are supported by every
    ray). Cells with zero load get no replica (free culling).

    `capacity` is chosen over power-of-two candidates to minimize
    `padded_slots(C) + expert_cost * Kv(C)` — padded slots cost MLP
    activation traffic, but each virtual expert also costs a replicated
    parameter-table row (the gather materializes (Kv, ...) weights in
    HBM and every batched GEMM streams them) plus dispatch/weight
    bookkeeping; `expert_cost` is that overhead expressed in slots.
    Pure slot minimization degenerates to capacity 1 = one expert per
    (ray, cell) pair, i.e. thousands of replicated weight tables. Ties
    keep the larger capacity. With `bucket`, Kv is also padded to a
    power of two with zero-support dummy replicas of cell 0 (zero
    dispatch rows -> their output is never combined), so chunked render
    loops compile O(log R * log K) variants instead of one per distinct
    plan.

    `capacity > 0` FORCES the dispatch capacity instead of optimizing it,
    and `pad_experts_to` pads Kv with dead replicas up to a given count —
    together they let a chunked render unify every chunk's plan under ONE
    (Kv, capacity) compile key: per-chunk optimal plans produced a fresh
    jit key per chunk shape and the compile sprawl swamped the routing
    win end to end (measured: K=25 512^2 flythrough, ray 163 s/frame vs
    dense 80 — first frame 451 s and never steady; PERF.md round 5).
    """
    import numpy as np

    support = np.asarray(support, bool)
    r, k = support.shape
    loads = support.sum(axis=0)
    max_load = int(loads.max()) if loads.size else 0
    if max_load == 0:
        # Degenerate: nothing routes anywhere. One dead expert keeps
        # shapes non-empty; its zero dispatch rows combine to zero.
        kv_pad = max(1, int(pad_experts_to))
        sup_v = np.zeros((r, kv_pad), bool)
        return sup_v, np.zeros(kv_pad, np.int32), max(1, int(capacity))

    if capacity > 0:
        cap = int(capacity)
    else:
        cap_hi = 1 << (max_load - 1).bit_length()
        best_c, best_cost = cap_hi, None
        c = cap_hi
        while c >= 1:
            replicas = -(-loads // c)
            cost = float((replicas * c).sum()) + expert_cost * float(
                replicas.sum()
            )
            # strict improvement only: ties keep the LARGER capacity
            if best_cost is None or cost < best_cost:
                best_c, best_cost = c, cost
            c //= 2
        cap = int(best_c)

    cols, ids = [], []
    for j in range(k):
        rows = np.flatnonzero(support[:, j])
        for start in range(0, len(rows), cap):
            col = np.zeros(r, bool)
            col[rows[start : start + cap]] = True
            cols.append(col)
            ids.append(j)
    kv = len(cols)
    kv_pad = kv
    if pad_experts_to:
        assert pad_experts_to >= kv, (pad_experts_to, kv)
        kv_pad = int(pad_experts_to)
    elif bucket:
        kv_pad = 1 << (kv - 1).bit_length()
    for _ in range(kv_pad - kv):
        cols.append(np.zeros(r, bool))
        ids.append(0)
    return (
        np.stack(cols, axis=1),
        np.asarray(ids, np.int32),
        cap,
    )


def mega_apply_routed(
    apply_fn: Callable[..., jnp.ndarray],
    stacked_params,
    weights: jnp.ndarray,
    xyz: jnp.ndarray,
    dirs: Optional[jnp.ndarray] = None,
    image_indices: Optional[jnp.ndarray] = None,
    sigma_noise: Optional[jnp.ndarray] = None,
    sigma_only: bool = False,
    *,
    max_experts: int = 4,
    block: int = 1024,
    blocks_per_step: int = 8,
) -> jnp.ndarray:
    """Sorted-gather routing: evaluate each point ONLY under the submodules
    it has nonzero routing weight for.

    Same contract as `mega_apply`, exact whenever every point has at most
    `max_experts` nonzero weights — always for hard assignment (margin == 1
    -> one nonzero) and for boundary blends that touch ≤M cells (a 2D grid
    corner touches 4). Points with MORE than M nonzero weights (e.g. high
    above a 2D centroid grid, where 3D distances to many cells fall within
    the margin) blend over their M nearest submodules with the weights
    renormalized to sum to 1 — a graceful truncation of the reference's
    full within-margin blend (`mega_nerf.py:21-27`), never a dropped
    contribution.

    TPU-native static-shape plan (the reference boolean-indexes per
    submodule, `mega_nerf.py:35-49` — dynamic shapes):

      1. top_k picks each point's ≤M candidate submodules; zero-weight
         entries route to a dead bucket K.
      2. One stable argsort groups the E = N·M (point, submodule) entries by
         bucket; per-bucket segments are padded to `block` multiples so
         every block belongs to exactly one bucket (total length is the
         static worst case E + (K+1)·block).
      3. `lax.map` walks the blocks `blocks_per_step` at a time: gather the
         block's points, gather its ONE submodule's parameters (a (bps,)
         leading-axis gather of the stacked pytree), run the ordinary
         apply_fn under vmap. All-dead steps (the sorted tail) skip the MLP
         through `lax.cond` at run time.
      4. A weighted scatter-add puts block outputs back into point order.

    Cost: ≈ (E + padding) point evaluations — for K=25 hard-assigned this is
    1/25th of the dense blend's FLOPs — plus an O(E log E) integer sort and
    two gathers, negligible next to the MLP.
    """
    n, k = weights.shape
    m = min(max_experts, k)
    topw, topk = lax.top_k(weights, m)  # (N, M)
    # Renormalize so truncated points still blend to weight 1 (no-op when
    # all nonzero weights were captured: they already summed to 1).
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    valid = topw > 0
    bucket = jnp.where(valid, topk, k).reshape(-1)  # (E,) dead -> K
    point = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, m))
    e = n * m

    order = jnp.argsort(bucket, stable=True)
    sb = bucket[order]
    sp = point.reshape(-1)[order]
    sw = topw.reshape(-1)[order]

    counts = jnp.zeros((k + 1,), jnp.int32).at[bucket].add(1)
    padded = ((counts + block - 1) // block) * block
    pstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    dest = pstart[sb] + (jnp.arange(e, dtype=jnp.int32) - start[sb])

    # Static worst-case padded length, rounded to whole lax.map steps.
    step = block * blocks_per_step
    length = e + (k + 1) * block
    length = ((length + step - 1) // step) * step
    nsteps = length // step

    slot_point = jnp.full((length,), n, jnp.int32).at[dest].set(sp)
    slot_weight = jnp.zeros((length,), sw.dtype).at[dest].set(sw)
    slot_bucket = jnp.full((length,), k, jnp.int32).at[dest].set(sb)
    # Segments are block-aligned, so each block holds one bucket (padding
    # slots carry the dead id K; min recovers the real owner).
    blk_bucket = slot_bucket.reshape(length // block, block).min(axis=1)

    def pad_gather(x, fill):
        if x is None:
            return None
        pad_row = jnp.full((1,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad_row])[slot_point].reshape(
            (nsteps, blocks_per_step, block) + x.shape[1:]
        )

    xs = {
        "b": blk_bucket.reshape(nsteps, blocks_per_step),
        "x": pad_gather(xyz, 0),
        "d": pad_gather(dirs, 0),
        "i": pad_gather(image_indices, 0),
        "s": pad_gather(sigma_noise, 0),
    }

    def eval_step(bids, xb, db, ib, snb):
        pb = jax.tree.map(
            lambda q: q[jnp.minimum(bids, k - 1)], stacked_params
        )
        return jax.vmap(
            lambda p, x, d_, i_, s_: apply_fn(p, x, d_, i_, s_, sigma_only)
        )(pb, xb, db, ib, snb)

    out_sd = jax.eval_shape(
        eval_step, xs["b"][0], xs["x"][0],
        None if dirs is None else xs["d"][0],
        None if image_indices is None else xs["i"][0],
        None if sigma_noise is None else xs["s"][0],
    )

    def body(step_xs):
        return lax.cond(
            jnp.all(step_xs["b"] == k),
            lambda: jnp.zeros(out_sd.shape, out_sd.dtype),
            lambda: eval_step(
                step_xs["b"], step_xs["x"],
                None if dirs is None else step_xs["d"],
                None if image_indices is None else step_xs["i"],
                None if sigma_noise is None else step_xs["s"],
            ),
        )

    outs = lax.map(body, xs).reshape(length, -1)  # (L, C)
    weighted = outs * slot_weight[:, None].astype(outs.dtype)
    acc = jnp.zeros((n + 1, outs.shape[-1]), outs.dtype)
    return acc.at[slot_point].add(weighted)[:n]
