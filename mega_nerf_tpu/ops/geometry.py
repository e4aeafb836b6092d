"""NeRF++-style inverted-sphere geometry for unbounded backgrounds.

Parity targets: reference `mega_nerf/rendering.py:396-469`
(`_intersect_sphere`, `_depth2pts_outside`). The scene's foreground lives
inside an axis-aligned ellipsoid (sphere after per-axis normalization by
`sphere_radius`); everything outside is parameterized by inverse distance in
[0, 1] on the unit sphere via a Rodrigues rotation.

The TPU-native difference: the reference raises if any camera leaves the unit
sphere (`rendering.py:412-414`, a data-dependent host check); here the check
is a separate host-callable validator (`validate_cameras_in_sphere`) so the
jitted path stays control-flow free, and the sqrt is clamped for safety.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def _normalize_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    sphere_center: Optional[jnp.ndarray],
    sphere_radius: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if sphere_radius is not None:
        rays_o = (rays_o - sphere_center) / sphere_radius
        rays_d = rays_d / sphere_radius
    return rays_o, rays_d


def intersect_sphere(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    sphere_center: Optional[jnp.ndarray] = None,
    sphere_radius: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Depth (in original ray units) at which each ray exits the unit sphere.

    rays_o/rays_d: (..., 3). The optional center/radius first map the
    ellipsoid onto the unit sphere. Parity: reference `rendering.py:396-417`.
    """
    rays_o, rays_d = _normalize_rays(rays_o, rays_d, sphere_center, sphere_radius)
    d1 = -jnp.sum(rays_d * rays_o, axis=-1) / jnp.sum(rays_d * rays_d, axis=-1)
    p = rays_o + d1[..., None] * rays_d
    ray_d_cos = 1.0 / jnp.linalg.norm(rays_d, axis=-1)
    p_norm_sq = jnp.sum(p * p, axis=-1)
    # Clamped rather than raising like the reference; use
    # validate_cameras_in_sphere() on the host to reproduce the hard check.
    d2 = jnp.sqrt(jnp.maximum(1.0 - p_norm_sq, 0.0)) * ray_d_cos
    return d1 + d2


def validate_cameras_in_sphere(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    sphere_center: Optional[jnp.ndarray] = None,
    sphere_radius: Optional[jnp.ndarray] = None,
) -> None:
    """Host-side equivalent of the reference's unit-sphere camera assertion
    (`rendering.py:412-414`)."""
    rays_o, rays_d = _normalize_rays(rays_o, rays_d, sphere_center, sphere_radius)
    d1 = -jnp.sum(rays_d * rays_o, axis=-1) / jnp.sum(rays_d * rays_d, axis=-1)
    p = rays_o + d1[..., None] * rays_d
    if bool(jnp.any(jnp.sum(p * p, axis=-1) >= 1.0)):
        raise ValueError(
            "Not all cameras are bounded by the unit sphere; normalize the "
            "scene (pose_scale_factor / ellipse bounds) so they are."
        )


def depth2pts_outside(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    depth: jnp.ndarray,
    sphere_center: Optional[jnp.ndarray] = None,
    sphere_radius: Optional[jnp.ndarray] = None,
    include_xyz_real: bool = False,
    cluster_2d: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map inverse-depth samples in [0, 1] to 4D background coordinates.

    rays_o/rays_d: (N, 1, 3); depth: (N, S) inverse distance to the sphere
    origin (0 = infinity, 1 = sphere surface). Returns (pts, depth_real):
    pts is (N, S, 4) [unit-sphere point, inverse depth] — or, when
    `include_xyz_real`, (N, S, 7/8) with real-world coordinates prepended for
    MegaNeRF spatial routing of background points (cluster_2d prepends the
    real sample point; otherwise the sphere boundary point). depth_real is the
    conventional metric depth along the ray. Parity: `rendering.py:420-469`.
    """
    rays_o_orig, rays_d_orig = rays_o, rays_d
    rays_o, rays_d = _normalize_rays(rays_o, rays_d, sphere_center, sphere_radius)

    d1 = -jnp.sum(rays_d * rays_o, axis=-1) / jnp.sum(rays_d * rays_d, axis=-1)
    p_mid = rays_o + d1[..., None] * rays_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1)
    ray_d_norm = jnp.linalg.norm(rays_d, axis=-1)
    ray_d_cos = 1.0 / ray_d_norm
    d2 = jnp.sqrt(jnp.maximum(1.0 - p_mid_norm * p_mid_norm, 0.0)) * ray_d_cos
    p_sphere = rays_o + (d1 + d2)[..., None] * rays_d  # (N, 1, 3)

    rot_axis = jnp.cross(rays_o, p_sphere)
    rot_axis = rot_axis / (jnp.linalg.norm(rot_axis, axis=-1, keepdims=True) + 1e-8)
    phi = jnp.arcsin(jnp.clip(p_mid_norm, -1.0, 1.0))  # (N, 1)
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth, -1.0, 1.0))  # (N, S)
    rot_angle = (phi - theta)[..., None]  # (N, S, 1)

    # Rodrigues rotation of the sphere exit point toward the ray direction.
    p_sphere_new = (
        p_sphere * jnp.cos(rot_angle)
        + jnp.cross(rot_axis, p_sphere) * jnp.sin(rot_angle)
        + rot_axis
        * jnp.sum(rot_axis * p_sphere, axis=-1, keepdims=True)
        * (1.0 - jnp.cos(rot_angle))
    )
    p_sphere_new = p_sphere_new / jnp.linalg.norm(
        p_sphere_new, axis=-1, keepdims=True
    )

    depth_real = 1.0 / (depth + 1e-8) * jnp.cos(theta) + d1  # (N, S)

    if include_xyz_real:
        if cluster_2d:
            real = rays_o_orig + rays_d_orig * depth_real[..., None]
        else:
            boundary = rays_o_orig + rays_d_orig * (d1 + d2)[..., None]
            real = jnp.broadcast_to(
                boundary, p_sphere_new.shape[:-1] + (boundary.shape[-1],)
            )
        pts = jnp.concatenate([real, p_sphere_new, depth[..., None]], axis=-1)
    else:
        pts = jnp.concatenate([p_sphere_new, depth[..., None]], axis=-1)

    return pts, depth_real
