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
parameters (see `mega_nerf_tpu.parallel`). A capacity-based sorted-gather
router is the planned optimization for large K.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


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
