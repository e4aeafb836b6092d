"""Synthetic dataset builder for end-to-end tests.

Writes a tiny scene in the reference's on-disk dataset layout
(SURVEY.md §2.6): coordinates.pt, {train,val}/metadata/*.pt,
{train,val}/rgbs/*.png. The scene is an opaque colored ball at the origin,
rendered analytically with the same ray model the framework uses, so a NeRF
can overfit it quickly and PSNR is meaningful.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.data.torch_io import save_pt
from mega_nerf_tpu.ops.compositing import composite_weights
from mega_nerf_tpu.ops.rays import get_ray_directions, get_rays

BALL_RADIUS = 0.35
BALL_COLOR = np.array([0.85, 0.3, 0.1], np.float32)
BALL2_CENTER = np.array([0.15, 0.3, 0.0], np.float32)
BALL2_RADIUS = 0.18
BALL2_COLOR = np.array([0.2, 0.5, 0.9], np.float32)
# Enclosing opaque shell: every ray terminates on colored geometry, like a
# real photographed scene. (A mostly-black void makes tiny NeRFs collapse to
# zero density — the empty-scene local minimum.)
SHELL_RADIUS = 1.8


def look_at_drb(position: np.ndarray) -> np.ndarray:
    """c2w (3, 4) for a camera at `position` looking at the origin.

    DRB world: x down. Camera frame: x right, y up, z backward (-z forward).
    """
    forward = -position / np.linalg.norm(position)
    z_axis = -forward
    up = np.array([-1.0, 0.0, 0.0])  # "up" = negative x (x points down)
    x_axis = np.cross(up, z_axis)
    if np.linalg.norm(x_axis) < 1e-6:
        up = np.array([0.0, 1.0, 0.0])
        x_axis = np.cross(up, z_axis)
    x_axis = x_axis / np.linalg.norm(x_axis)
    y_axis = np.cross(z_axis, x_axis)
    return np.stack([x_axis, y_axis, z_axis, position], axis=1).astype(np.float32)


def scene_density_color(pts: jnp.ndarray):
    """Analytic scene (two balls inside a colored shell) -> (sigma, rgb)."""
    d1 = jnp.linalg.norm(pts, axis=-1)
    d2 = jnp.linalg.norm(pts - BALL2_CENTER, axis=-1)
    in1 = d1 < BALL_RADIUS
    in2 = d2 < BALL2_RADIUS
    in_shell = d1 > SHELL_RADIUS
    sigma = jnp.where(in1 | in2 | in_shell, 1e4, 0.0)
    # Smooth direction-dependent shell color so views are informative.
    shell_rgb = 0.55 + 0.35 * jnp.sin(
        pts * jnp.asarray([2.0, 3.0, 5.0]) + jnp.asarray([0.0, 1.0, 2.0])
    )
    rgb = jnp.where(
        in2[..., None],
        BALL2_COLOR,
        jnp.where(in1[..., None], BALL_COLOR, shell_rgb),
    )
    return sigma, rgb


def render_gt_image(c2w: np.ndarray, w: int, h: int, intrinsics, near, far,
                    samples: int = 256, scene_fn=None) -> np.ndarray:
    scene_fn = scene_fn or scene_density_color
    dirs = get_ray_directions(w, h, *[float(x) for x in intrinsics], True)
    rays = np.asarray(get_rays(dirs, jnp.asarray(c2w), near, far)).reshape(-1, 8)
    o, d = rays[:, :3], rays[:, 3:6]
    z = near + (far - near) * np.linspace(0, 1, samples, dtype=np.float32)
    pts = o[:, None] + d[:, None] * z[None, :, None]
    sigma, rgb = scene_fn(jnp.asarray(pts))
    cw = composite_weights(sigma, jnp.broadcast_to(z, sigma.shape),
                           jnp.full(sigma.shape[:1], 1e10))
    img = jnp.sum(cw.weights[..., None] * rgb, axis=1)
    return np.asarray(img).reshape(h, w, 3)


def make_synthetic_dataset(
    root: Path,
    n_train: int = 6,
    n_val: int = 1,
    hw=(24, 24),
    camera_distance: float = 1.5,
) -> Path:
    from PIL import Image

    root = Path(root)
    h, w = hw
    focal = 0.9 * w
    intrinsics = np.array([focal, focal, w / 2, h / 2], np.float32)
    near, far = 0.5, 3.5

    root.mkdir(parents=True, exist_ok=True)

    n_total = n_train + n_val
    for i in range(n_total):
        split = "val" if i >= n_train else "train"
        (root / split / "metadata").mkdir(parents=True, exist_ok=True)
        (root / split / "rgbs").mkdir(parents=True, exist_ok=True)

        theta = 2 * np.pi * i / n_total
        pos = camera_distance * np.array(
            [-0.35, np.sin(theta) * 0.9, np.cos(theta) * 0.9]
        )
        c2w = look_at_drb(pos)
        img = render_gt_image(c2w, w, h, intrinsics, near, far)

        stem = f"{i:06d}"
        save_pt(
            {
                "W": w,
                "H": h,
                "intrinsics": intrinsics,
                "c2w": c2w,
            },
            root / split / "metadata" / f"{stem}.pt",
        )
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            root / split / "rgbs" / f"{stem}.png"
        )
    # coordinates.pt is written LAST: callers treat it as the
    # built-dataset marker, so a killed mid-build run must not leave it.
    save_pt(
        {"origin_drb": np.zeros(3, np.float64), "pose_scale_factor": 1.0},
        root / "coordinates.pt",
    )
    return root


def tiny_train_hparams(dataset_path, exp_name, **overrides):
    """Small-but-real hparams for CPU end-to-end tests."""
    from mega_nerf_tpu.opts import get_opts_base, parse_opts

    parser = get_opts_base()
    parser.add_argument("--exp_name", type=str, default=str(exp_name))
    parser.add_argument("--dataset_path", type=str, default=str(dataset_path))
    args = [
        "--dataset_type", "memory",
        "--near", "0.5", "--far", "3.5",
        "--coarse_samples", "24", "--fine_samples", "24",
        "--pos_xyz_dim", "6", "--pos_dir_dim", "2",
        "--layers", "4", "--skip_layers", "2",
        "--layer_dim", "48", "--appearance_dim", "0",
        "--no_bg_nerf",
        "--batch_size", "128",
        "--lr", "5e-3",
        "--train_iterations", "200",
        "--ckpt_interval", "100",
        "--val_interval", "100000",
        "--compute_dtype", "float32",
    ]
    for k, v in overrides.items():
        if isinstance(v, bool):
            if v:
                args.append(f"--{k}")
        elif isinstance(v, (list, tuple)):
            args.extend([f"--{k}"] + [str(x) for x in v])
        else:
            args.extend([f"--{k}", str(v)])
    return parse_opts(parser, args)


# ---------------------------------------------------------------------------
# Drone-survey scene: the geometry Mega-NeRF actually targets (Mill 19 /
# UrbanScene3D — reference README.md:3-5): a textured ground plane with
# box "buildings", photographed by a lattice of oblique cameras ABOVE the
# scene. Unlike the orbiting-ball scene (cameras inside, every ray crossing
# the whole volume), a spatial grid split over the ground footprint gives
# each cell its own well-observed region — the honest setting for the 4x2
# cell-parallel workflow.
# ---------------------------------------------------------------------------

GROUND_X = 0.5  # DRB: x points DOWN; larger x = lower altitude
# (y, z, half_width, height, r, g, b) box "buildings" over the footprint
_BOXES = np.array([
    [-0.85, -0.45, 0.16, 0.55, 0.85, 0.25, 0.20],
    [-0.80,  0.50, 0.13, 0.35, 0.20, 0.55, 0.85],
    [-0.30, -0.55, 0.14, 0.45, 0.90, 0.75, 0.20],
    [-0.25,  0.35, 0.17, 0.60, 0.25, 0.80, 0.45],
    [ 0.25, -0.40, 0.15, 0.30, 0.70, 0.30, 0.75],
    [ 0.30,  0.55, 0.12, 0.50, 0.95, 0.55, 0.15],
    [ 0.80, -0.50, 0.16, 0.40, 0.35, 0.70, 0.80],
    [ 0.85,  0.40, 0.14, 0.65, 0.60, 0.90, 0.30],
    [ 0.00,  0.00, 0.20, 0.25, 0.80, 0.80, 0.80],
], np.float32)


def drone_density_color(pts: jnp.ndarray):
    """Analytic drone scene -> (sigma, rgb). Opaque ground + box buildings."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    below_ground = x > GROUND_X

    by, bz, hwd, hgt, br, bg_, bb = [jnp.asarray(c) for c in _BOXES.T]
    inside = (
        (jnp.abs(y[..., None] - by) < hwd)
        & (jnp.abs(z[..., None] - bz) < hwd)
        & (x[..., None] > GROUND_X - hgt)
        & (x[..., None] <= GROUND_X + 0.01)
    )  # (..., B)
    in_any = jnp.any(inside, axis=-1)
    sigma = jnp.where(below_ground | in_any, 1e4, 0.0)

    # ground: smooth color field + checker so every view is informative
    checker = (jnp.floor(y * 4.0) + jnp.floor(z * 4.0)) % 2.0
    ground_rgb = jnp.stack([
        0.35 + 0.25 * checker + 0.15 * jnp.sin(3.0 * y),
        0.45 + 0.20 * checker + 0.15 * jnp.cos(2.0 * z),
        0.30 + 0.15 * checker,
    ], axis=-1)
    box_rgb_tab = jnp.stack([br, bg_, bb], axis=-1)  # (B, 3)
    # first (arbitrary but deterministic) box wins overlaps; shade by height
    wsel = inside.astype(jnp.float32)
    wsel = wsel / jnp.maximum(wsel.sum(-1, keepdims=True), 1.0)
    shade = 0.7 + 0.3 * jnp.clip((GROUND_X - x) / 0.7, 0.0, 1.0)[..., None]
    box_rgb = (wsel @ box_rgb_tab) * shade
    rgb = jnp.where(in_any[..., None], box_rgb, ground_rgb)
    return sigma, rgb


def make_drone_dataset(
    root: Path,
    n_train: int = 24,
    n_val: int = 2,
    hw=(24, 24),
    altitude: float = -1.1,
    seed: int = 0,
) -> Path:
    """Drone-survey dataset: cameras on a jittered lattice at `altitude`
    (DRB x, negative = up), each looking obliquely at a point on the
    ground beneath it. Writes the reference dataset layout like
    `make_synthetic_dataset`."""
    from PIL import Image

    root = Path(root)
    h, w = hw
    focal = 0.9 * w
    intrinsics = np.array([focal, focal, w / 2, h / 2], np.float32)
    near, far = 0.5, 4.0
    rng = np.random.default_rng(seed)

    root.mkdir(parents=True, exist_ok=True)

    n_total = n_train + n_val
    # near-square lattice over the footprint, jittered; val cameras land
    # between train positions (they are the held-out viewpoints)
    gy = int(np.ceil(np.sqrt(n_total * 1.5)))
    gz = int(np.ceil(n_total / gy))
    ys = np.linspace(-1.1, 1.1, gy)
    zs = np.linspace(-0.85, 0.85, gz)
    lattice = [(yy, zz) for yy in ys for zz in zs][:n_total]
    # Evenly-spaced val viewpoints (the tail of the lattice would put every
    # held-out camera in one corner of the footprint).
    val_idx = set(
        int(round(j * (n_total - 1) / max(n_val, 1)))
        for j in range(1, n_val + 1)
    )
    backfill = (i for i in range(n_total) if i not in val_idx)
    while len(val_idx) < n_val:  # rounding collisions
        val_idx.add(next(backfill))

    for i, (yy, zz) in enumerate(lattice):
        split = "val" if i in val_idx else "train"
        (root / split / "metadata").mkdir(parents=True, exist_ok=True)
        (root / split / "rgbs").mkdir(parents=True, exist_ok=True)

        jy, jz = rng.uniform(-0.08, 0.08, 2)
        pos = np.array([altitude + rng.uniform(-0.05, 0.05), yy + jy, zz + jz])
        # oblique look-at: a ground point pulled toward the footprint
        # center so edge cameras see inward (nadir would make the
        # look_at up-vector degenerate)
        target = np.array([GROUND_X, 0.55 * (yy + jy), 0.55 * (zz + jz)])
        fwd = target - pos
        c2w = _look_at_drb_from(pos, fwd)
        img = render_gt_image(
            c2w, w, h, intrinsics, near, far, scene_fn=drone_density_color
        )

        stem = f"{i:06d}"
        save_pt(
            {"W": w, "H": h, "intrinsics": intrinsics, "c2w": c2w},
            root / split / "metadata" / f"{stem}.pt",
        )
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            root / split / "rgbs" / f"{stem}.png"
        )
    # coordinates.pt is written LAST: callers treat it as the
    # built-dataset marker, so a killed mid-build run must not leave it.
    save_pt(
        {"origin_drb": np.zeros(3, np.float64), "pose_scale_factor": 1.0},
        root / "coordinates.pt",
    )
    return root


def _look_at_drb_from(position: np.ndarray, forward: np.ndarray) -> np.ndarray:
    """c2w (3, 4) for a camera at `position` facing along `forward` (DRB)."""
    forward = forward / np.linalg.norm(forward)
    z_axis = -forward
    up = np.array([-1.0, 0.0, 0.0])  # world up = -x (x points down)
    x_axis = np.cross(up, z_axis)
    if np.linalg.norm(x_axis) < 1e-6:
        up = np.array([0.0, 1.0, 0.0])
        x_axis = np.cross(up, z_axis)
    x_axis = x_axis / np.linalg.norm(x_axis)
    y_axis = np.cross(z_axis, x_axis)
    return np.stack(
        [x_axis, y_axis, z_axis, position], axis=1
    ).astype(np.float32)
