"""Per-voxel maximum camera-weight rendering for octree culling.

TPU-native replacement for svox's CUDA `_C.grid_weight_render`
(reference `create_octree.py:108-136`): for each training camera, march a
ray through every pixel across a dense sigma grid, compute each sample's
compositing weight (alpha * transmittance), and scatter-MAX those weights
into the voxels the samples fall in. The final per-voxel value, maxed over
all cameras, measures how visible a voxel ever is — voxels below
`weight_thresh` are culled from the octree.

Implementation: one jitted program per camera chunk — ray generation,
cube entry/exit clipping, fixed-step marching (static shapes), nearest
voxel gather for sigma, cumulative-product transmittance, and a
`.at[voxel].max(weight)` scatter. All FLOPs are dense and MXU/VPU friendly;
no dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.ops.rays import get_ray_directions


def _ray_cube_span(o: jnp.ndarray, d: jnp.ndarray):
    """Entry/exit distances of rays (tree coords) with the unit cube."""
    safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t0 = (0.0 - o) / safe_d
    t1 = (1.0 - o) / safe_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    return t_near, jnp.maximum(t_far, t_near)


@partial(jax.jit, static_argnames=("reso", "n_steps"))
def _weights_one_camera(
    grid: jnp.ndarray,  # (reso, reso, reso) sigma
    rays_o: jnp.ndarray,  # (P, 3) tree coords
    rays_d: jnp.ndarray,  # (P, 3) tree coords, d_world * invradius UNnormalized
    reso: int,
    n_steps: int,
) -> jnp.ndarray:
    t_near, t_far = _ray_cube_span(rays_o, rays_d)
    ts = t_near[:, None] + (t_far - t_near)[:, None] * (
        (jnp.arange(n_steps) + 0.5) / n_steps
    )
    # `t` parameterizes BOTH the tree-space and world-space rays (the tree
    # map is affine and rays_d is the mapped — unnormalized — world dir),
    # and the world dir has unit length, so a step dt IS dt world units.
    # (svox normalizes its tree dirs and carries a 1/|d_tree| delta_scale;
    # with unnormalized dirs that factor must NOT be applied — doing both
    # inflated deltas by |invradius| and biased the culling weights
    # whenever the tree radius wasn't exactly 1.)
    delta_world = (t_far - t_near) / n_steps  # (P,)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * ts[..., None]  # (P,S,3)
    idx = jnp.clip((pts * reso).astype(jnp.int32), 0, reso - 1)
    sigma = grid[idx[..., 0], idx[..., 1], idx[..., 2]]  # (P, S)

    valid = (t_far > t_near)[:, None]
    alpha = jnp.where(valid, 1.0 - jnp.exp(-sigma * delta_world[:, None]), 0.0)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1
    )
    weights = alpha * trans  # (P, S)

    flat_idx = (idx[..., 0] * reso + idx[..., 1]) * reso + idx[..., 2]
    out = jnp.zeros(reso * reso * reso, weights.dtype)
    out = out.at[flat_idx.reshape(-1)].max(weights.reshape(-1))
    return out.reshape(reso, reso, reso)


def grid_weight_render_max(
    sigmas: np.ndarray,  # (reso^3,) or (reso, reso, reso)
    poses: np.ndarray,  # (M, 3, 4) c2w in world coords
    camera_params: Sequence[float],  # [W, H, fx, fy, cx, cy]
    tree_offset: np.ndarray,  # (3,)
    tree_invradius: np.ndarray,  # (3,)
    reso: int,
    n_steps: int | None = None,
    pixel_chunk: int = 65536,
) -> np.ndarray:
    """Max-over-cameras per-voxel weight grid (reso, reso, reso)."""
    w, h, fx, fy, cx, cy = [float(x) for x in camera_params]
    w, h = int(w), int(h)
    if n_steps is None:
        n_steps = 2 * reso

    grid = jnp.asarray(np.asarray(sigmas, np.float32).reshape(reso, reso, reso))
    offset = jnp.asarray(tree_offset, jnp.float32)
    invradius = jnp.asarray(tree_invradius, jnp.float32)
    directions = np.asarray(
        get_ray_directions(w, h, fx, fy, cx, cy, center_pixels=True)
    ).reshape(-1, 3)

    maximum = jnp.zeros((reso, reso, reso), jnp.float32)
    for pose in np.asarray(poses, np.float32):
        rays_d_world = directions @ pose[:, :3].T  # (P, 3)
        # Normalize in WORLD space so the shared ray parameter t is world
        # arc length (see _weights_one_camera).
        rays_d_world = rays_d_world / np.linalg.norm(
            rays_d_world, axis=-1, keepdims=True
        )
        rays_o_world = np.broadcast_to(pose[:, 3], rays_d_world.shape)
        rays_o = jnp.asarray(rays_o_world) * invradius + offset
        rays_d = jnp.asarray(rays_d_world) * invradius

        for start in range(0, directions.shape[0], pixel_chunk):
            sl = slice(start, start + pixel_chunk)
            cam_grid = _weights_one_camera(
                grid, rays_o[sl], rays_d[sl], reso, n_steps
            )
            maximum = jnp.maximum(maximum, cam_grid)

    return np.asarray(maximum)
