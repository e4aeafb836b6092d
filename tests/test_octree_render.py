"""The in-framework octree renderer (octree/render.py).

The reference validates bakes only through the external viewer. Here a
tree baked ANALYTICALLY from the synthetic scene must render back images
matching the analytic ray-marcher — this pins the renderer (lookup,
march, compositing, SH) independent of any trained model's quality.
"""

import numpy as np

import jax.numpy as jnp

from mega_nerf_tpu.octree.n3tree import N3Tree
from mega_nerf_tpu.octree.render import query_tree, render_octree_rays
from mega_nerf_tpu.ops.metrics import psnr
from mega_nerf_tpu.ops.rays import get_ray_directions, get_rays
from tests.synthetic import (
    BALL_RADIUS,
    look_at_drb,
    render_gt_image,
    scene_density_color,
)


def _analytic_tree(depth: int = 5) -> N3Tree:
    """Bake scene_density_color into an octree: refine around surfaces,
    then write each leaf's analytic (rgb, sigma) at its center."""
    tree = N3Tree(
        N=2, data_dim=4, data_format="RGBA",
        center=np.zeros(3), radius=np.full(3, 2.0), depth_limit=depth + 2,
    )
    # Refinement targets: the ball surfaces and a band of the shell.
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(20000, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    surf = np.concatenate([
        pts[:8000] * BALL_RADIUS,
        pts[8000:12000] * 0.18 + np.array([0.15, 0.3, 0.0], np.float32),
        pts[12000:] * 1.85,
    ])
    for _ in range(depth):
        tree.refine_at_points(surf)

    leaves = tree.leaf_indices()
    corner, side = tree.leaf_bounds(leaves)
    centers = tree.tree_to_world(corner + 0.5 * side[:, None])
    sigma, rgb = scene_density_color(jnp.asarray(centers))
    data = np.concatenate(
        [np.asarray(rgb), np.asarray(sigma)[:, None]], axis=-1
    ).astype(np.float32)
    tree.set_leaf_data(leaves, data)
    tree.fill_internal()
    return tree


def test_octree_render_matches_analytic_scene():
    tree = _analytic_tree()

    vals = query_tree(tree, np.zeros((4, 3), np.float32))
    assert vals.shape == (4, 4) and np.isfinite(vals).all()
    assert vals[0, 3] > 100.0  # inside the opaque ball

    w = h = 24
    focal = 0.9 * w
    intrinsics = np.array([focal, focal, w / 2, h / 2], np.float32)
    pos = 1.5 * np.array([-0.35, 0.0, 0.9])
    c2w = look_at_drb(pos)
    gt = render_gt_image(c2w, w, h, intrinsics, 0.5, 3.5)

    dirs = get_ray_directions(w, h, *[float(v) for v in intrinsics], True)
    rays = np.asarray(
        get_rays(dirs, jnp.asarray(c2w), 0.5, 3.5)
    ).reshape(-1, 8)
    res = render_octree_rays(tree, rays, steps=256)
    rgb = res["rgb"].reshape(h, w, 3)

    p = float(np.asarray(psnr(jnp.asarray(rgb), jnp.asarray(gt))))
    flat = float(np.asarray(psnr(
        jnp.broadcast_to(jnp.asarray(gt.mean((0, 1))), gt.shape),
        jnp.asarray(gt),
    )))
    # Discretized-bake render of the same analytic field: clearly better
    # than a flat frame, shell-enclosed rays all opaque, ball in front.
    assert p > max(flat + 4.0, 16.0), (p, flat)
    assert res["opacity"].mean() > 0.9
    center_depth = res["depth"].reshape(h, w)[h // 2, w // 2]
    assert 0.9 < center_depth < 1.4  # camera_dist 1.5 - ball_radius 0.35
