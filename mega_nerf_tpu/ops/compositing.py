"""Alpha compositing for volume rendering.

Parity target: the compositing tail of the reference's `_inference`
(`mega_nerf/rendering.py:352-393`): deltas -> alphas -> transmittance ->
per-sample weights, with the NeRF++-style `bg_lambda` (transmittance past the
last sample) used to composite a background model behind the foreground.
"""

from __future__ import annotations

from typing import NamedTuple

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
