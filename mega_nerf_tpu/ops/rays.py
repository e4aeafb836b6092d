"""Ray generation in the DRB (down-right-back) world convention.

Behavioral parity with the reference's `mega_nerf/ray_utils.py:6-84`, but
fully vectorized with static shapes: the altitude-plane truncation is a dense
`where` over all rays instead of a boolean gather, so it jits cleanly and
differentiates safely.

A "ray record" is 8 floats: [origin(3), unit direction(3), near, far]
(reference contract, `ray_utils.py:58-62`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def get_ray_directions(
    w: int,
    h: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    center_pixels: bool,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-pixel unit ray directions in the camera frame.

    Camera looks along -z with +x right / +y up in its own frame; the pixel
    grid maps through the pinhole intrinsics (fx, fy, cx, cy). Returns an
    (H, W, 3) array of unit vectors. Parity: reference `ray_utils.py:6-18`.
    """
    i = jnp.arange(w, dtype=dtype)[None, :].repeat(h, axis=0)  # (H, W) x-pixel
    j = jnp.arange(h, dtype=dtype)[:, None].repeat(w, axis=1)  # (H, W) y-pixel
    if center_pixels:
        i = i + 0.5
        j = j + 0.5

    directions = jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )  # (H, W, 3)
    return directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)


def _plane_bound(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    altitude: float,
    default: jnp.ndarray,
) -> jnp.ndarray:
    """Distance along each ray to the horizontal plane x == altitude.

    In DRB, x points down, so a ray "descends" when d_x > 0. Only rays that
    start above the plane (o_x < altitude) and descend get truncated; all
    others keep `default`. Dense-mask equivalent of the reference's gather
    at `ray_utils.py:65-84`.
    """
    o_x = rays_o[..., 0]
    d_x = rays_d[..., 0]
    eligible = (o_x < altitude) & (d_x > 0)
    safe_dx = jnp.where(d_x == 0, jnp.ones_like(d_x), d_x)
    t = (altitude - o_x) / safe_dx
    return jnp.where(eligible, t, default)


def get_rays(
    directions: jnp.ndarray,
    c2w: jnp.ndarray,
    near: float,
    far: float,
    ray_altitude_range: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """World-space ray records for one camera.

    directions: (..., 3) camera-frame unit directions; c2w: (3, 4) DRB pose.
    Returns (..., 8) records. When `ray_altitude_range` = [alt_hi, alt_lo]
    (both in the normalized [-1, 1] space; alt_hi < alt_lo since x points
    down), near is pushed forward to the high-altitude ceiling plane and far
    is pulled back to the low-altitude ground plane.
    Parity: reference `ray_utils.py:21-62`.
    """
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)

    near_b = jnp.full(rays_o.shape[:-1], near, dtype=rays_o.dtype)
    far_b = jnp.full(rays_o.shape[:-1], far, dtype=rays_o.dtype)

    if ray_altitude_range is not None:
        near_b = _plane_bound(rays_o, rays_d, ray_altitude_range[0], near_b)
        near_b = jnp.maximum(near_b, near)
        far_b = _plane_bound(rays_o, rays_d, ray_altitude_range[1], far_b)
        far_b = jnp.minimum(far_b, far)
        far_b = jnp.maximum(near_b, far_b)

    return jnp.concatenate(
        [rays_o, rays_d, near_b[..., None], far_b[..., None]], axis=-1
    )


def get_rays_flat(
    directions: jnp.ndarray,
    c2ws: jnp.ndarray,
    near: float,
    far: float,
    ray_altitude_range: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """Ray records for a flat list of (direction, pose) pairs.

    directions: (N, 3) camera-frame unit dirs; c2ws: (N, 3, 4) per-ray poses.
    Used by the chunk loader to regenerate rays from stored pixel indices
    (the reference's shared-intrinsics path, `filesystem_dataset.py:105-126`,
    but without the unique/inverse gather dance — one einsum per chunk).
    """
    rays_d = jnp.einsum("nij,nj->ni", c2ws[:, :, :3], directions)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = c2ws[:, :, 3]

    near_b = jnp.full(rays_o.shape[:-1], near, dtype=rays_o.dtype)
    far_b = jnp.full(rays_o.shape[:-1], far, dtype=rays_o.dtype)
    if ray_altitude_range is not None:
        near_b = _plane_bound(rays_o, rays_d, ray_altitude_range[0], near_b)
        near_b = jnp.maximum(near_b, near)
        far_b = _plane_bound(rays_o, rays_d, ray_altitude_range[1], far_b)
        far_b = jnp.minimum(far_b, far)
        far_b = jnp.maximum(near_b, far_b)

    return jnp.concatenate(
        [rays_o, rays_d, near_b[..., None], far_b[..., None]], axis=-1
    )
