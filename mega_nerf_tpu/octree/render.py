"""Render images directly from a baked N3Tree octree.

The reference hands its baked octrees to the external Mega-NeRF-Dynamic
viewer and never renders from them itself — so a bad bake only shows up
in the viewer. This renderer closes that loop in-framework: fixed-step
ray-march through the tree, per-point leaf lookup, standard alpha
compositing (`ops.compositing.composite_weights`), SH evaluation for
view-dependent formats. It is a validation/preview path (host-side numpy
tree traversal + jnp compositing), not a TPU hot path: octree traversal
is pointer-chasing, which belongs on the viewer's rasterizing client, not
on an MXU.

Data layout per leaf: `[rgb(3) | sigma]` for RGBA trees (rgb already
sigmoid-activated — the bake writes model outputs through unchanged), or
`[SH coeffs (3*(deg+1)^2) | sigma]` for SH{n} trees, colors
sigmoid(eval_sh) like PlenOctree.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.octree.n3tree import N3Tree
from mega_nerf_tpu.ops.compositing import composite_weights
from mega_nerf_tpu.ops.sh import eval_sh


def query_tree(tree: N3Tree, world_pts: np.ndarray) -> np.ndarray:
    """(P, 3) world points -> (P, data_dim) leaf payloads (clamped lookup)."""
    t = tree.world_to_tree(world_pts.astype(np.float32))
    node, cell = tree._locate(t)
    return tree.data[node, cell[:, 0], cell[:, 1], cell[:, 2]]


def render_octree_rays(
    tree: N3Tree,
    rays: np.ndarray,  # (N, 8) [o, d, near, far]
    steps: int = 256,
    sh_deg: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Fixed-step march + composite. Returns {'rgb': (N, 3), 'depth': (N,)}.

    `sh_deg` defaults from the tree's data_format (SH{n} -> deg, RGBA -> no
    view dependence).
    """
    if sh_deg is None and tree.data_format.startswith("SH"):
        basis = int(tree.data_format[2:])
        sh_deg = int(np.sqrt(basis)) - 1

    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    n = rays.shape[0]
    frac = np.linspace(0.0, 1.0, steps, dtype=np.float32)
    z = near[:, None] + (far - near)[:, None] * frac[None, :]  # (N, S)
    pts = (o[:, None, :] + d[:, None, :] * z[..., None]).reshape(-1, 3)

    vals = query_tree(tree, pts).reshape(n, steps, -1)
    # Samples OUTSIDE the tree AABB would clamp to boundary leaves
    # (query_tree clips tree coords) and smear edge density along exiting
    # rays — treat them as empty space instead.
    tc = tree.world_to_tree(pts.astype(np.float32)).reshape(n, steps, 3)
    inside = ((tc >= 0.0) & (tc < 1.0)).all(axis=-1)
    sigma = np.where(inside, np.maximum(vals[..., -1], 0.0), 0.0)
    if sh_deg is not None and sh_deg >= 0 and tree.data_format != "RGBA":
        basis = (sh_deg + 1) ** 2
        coeffs = vals[..., : 3 * basis].reshape(n, steps, 3, basis)
        dirs = np.broadcast_to(d[:, None, :], (n, steps, 3))
        rgb = jnp.asarray(
            1.0 / (1.0 + np.exp(-np.asarray(
                eval_sh(sh_deg, jnp.asarray(coeffs), jnp.asarray(dirs))
            )))
        )
    else:
        rgb = jnp.asarray(vals[..., :3])

    cw = composite_weights(
        jnp.asarray(sigma), jnp.asarray(z), jnp.full((n,), 1e10)
    )
    rgb_out = jnp.sum(cw.weights[..., None] * rgb, axis=1)
    depth = jnp.sum(cw.weights * jnp.asarray(z), axis=1)
    return {
        "rgb": np.asarray(rgb_out),
        "depth": np.asarray(depth),
        "opacity": 1.0 - np.asarray(cw.bg_lambda),
    }
