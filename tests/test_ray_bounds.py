"""Occupancy-guided ray-bound tightening (render/ray_bounds.py).

Covers: octree-leaf rasterization into the dense occupancy grid, host-side
interval tightening against the grid (bracketing, misses, ellipsoid clamp),
`render_rays(..., fg_bounds=...)` semantics, and the Runner end-to-end path
(`--occupancy_path`): an all-occupied grid must reproduce the plain render.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mega_nerf_tpu.octree import N3Tree
from mega_nerf_tpu.render.ray_bounds import occupancy_grid, tighten_rays
from mega_nerf_tpu.render.rendering import RenderSettings, render_rays

from synthetic import make_synthetic_dataset, tiny_train_hparams
from test_rendering import _ball_bundle, _straight_rays


def test_occupancy_grid_rasterizes_only_occupied_leaves():
    tree = N3Tree(N=2, data_dim=4, radius=1.0, center=(0.0, 0.0, 0.0))
    pt = np.array([[0.25, 0.25, 0.25]], np.float32)
    for _ in range(3):
        tree.refine_at_points(pt)
    leaves = tree.leaf_indices()
    corner, side = tree.leaf_bounds(leaves)
    tc = np.asarray(tree.world_to_tree(pt))[0]
    holds = ((corner <= tc) & (tc < corner + side[:, None])).all(axis=1)
    data = np.zeros((leaves.shape[0], 4), np.float32)
    data[holds, 3] = 5.0
    tree.set_leaf_data(leaves, data)

    grid = occupancy_grid(tree, thresh=0.0, dilate=0)
    res = grid.shape[0]
    vox = tuple((tc * res).astype(int))
    assert grid[vox], "voxel containing the occupied leaf not marked"
    # Only the one finest leaf is occupied: its volume fraction is
    # (1/res)^3 of the domain (one voxel at the finest resolution).
    assert grid.sum() == 1, grid.sum()

    dilated = occupancy_grid(tree, thresh=0.0, dilate=1)
    assert dilated.sum() > 1 and dilated[vox]
    assert (dilated | ~grid).all(), "dilation lost an occupied voxel"
    # Thresholding above the leaf sigma empties the grid.
    assert occupancy_grid(tree, thresh=10.0, dilate=0).sum() == 0


def test_tighten_rays_brackets_occupied_slab():
    # Tree coords = world * 0.5 + 0.5 (radius 1, center 0). Occupied slab:
    # tree z in [0.4, 0.5) <=> world z in [-0.2, 0).
    res = 64
    grid = np.zeros((res, res, res), bool)
    grid[:, :, int(0.4 * res) : int(0.5 * res)] = True
    inv = np.full(3, 0.5, np.float32)
    off = np.full(3, 0.5, np.float32)

    # Rays from z=0.8 straight down (-z), inside the unit sphere, far 1e5.
    n = 8
    o = np.tile(np.array([0.0, 0.0, 0.8], np.float32), (n, 1))
    d = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (n, 1))
    rays = np.concatenate(
        [o, d, np.full((n, 1), 0.05, np.float32),
         np.full((n, 1), 1e5, np.float32)], axis=1)
    c = np.zeros(3, np.float64)
    r = np.ones(3, np.float64)
    bounds = tighten_rays(rays, grid, inv, off, probes=128,
                          sphere_center=c, sphere_radius=r, mode="both")
    # Slab crossing: world z -0.2..0 <=> t in [0.8, 1.0]; ellipsoid exit
    # t = 1.8. One probe step of slack each side (margin=1).
    step = (1.8 - 0.05) / 127 * 1.05
    assert (bounds[:, 0] > 0.8 - 2 * step).all(), bounds[:, 0]
    assert (bounds[:, 0] < 0.8 + step).all(), bounds[:, 0]
    assert (bounds[:, 1] > 1.0 - step).all() and (
        bounds[:, 1] < 1.0 + 2 * step).all(), bounds[:, 1]

    # Default "near" mode: same entry tightening, far end pinned to the
    # full fg interval (the measured quality-neutral mode).
    b_near = tighten_rays(rays, grid, inv, off, probes=128,
                          sphere_center=c, sphere_radius=r)
    np.testing.assert_allclose(b_near[:, 0], bounds[:, 0], rtol=0, atol=0)
    assert (b_near[:, 1] > 1.8 * 0.99).all(), b_near[:, 1]  # exit t=1.8

    # Rays pointing UP never meet the slab. mode="both": interval
    # collapses at the (clamped) fg end, which stays at or below the
    # ellipsoid exit. mode="near": the full interval is kept.
    rays_up = rays.copy()
    rays_up[:, 5] = 1.0
    b_up = tighten_rays(rays_up, grid, inv, off, probes=128,
                        sphere_center=c, sphere_radius=r, mode="both")
    assert (b_up[:, 0] == b_up[:, 1]).all()
    assert (b_up[:, 1] <= 0.2 * 1.01 + 1e-6).all(), b_up  # exit t=0.2
    b_up_near = tighten_rays(rays_up, grid, inv, off, probes=128,
                             sphere_center=c, sphere_radius=r)
    assert (b_up_near[:, 0] == 0.05).all()
    assert (b_up_near[:, 1] >= 0.2 * 0.99).all()


def test_occupancy_grid_non_divisible_resolutions():
    """A branch-3 tree capped at a non-multiple resolution (leaf sub=3
    into res=8, finer sub=9 > res=8) must rasterize by interval overlap —
    the old repeat-upsample raised a broadcast ValueError here. Every
    res-voxel overlapping an occupied leaf box is marked, none other."""
    tree = N3Tree(N=3, data_dim=4, radius=1.0, center=(0.0, 0.0, 0.0))
    pt = np.array([[0.5, 0.5, 0.5]], np.float32)  # tree coords (0.75,...)
    tree.refine_at_points(pt)  # depth-1 leaves side 1/3; refined side 1/9
    leaves = tree.leaf_indices()
    corner, side = tree.leaf_bounds(leaves)
    # Occupy one coarse (side 1/3) leaf and one fine (side 1/9) leaf.
    coarse_i = int(np.flatnonzero(np.isclose(side, 1 / 3))[0])
    fine_i = int(np.flatnonzero(np.isclose(side, 1 / 9))[0])
    data = np.zeros((leaves.shape[0], 4), np.float32)
    data[[coarse_i, fine_i], 3] = 5.0
    tree.set_leaf_data(leaves, data)

    grid = occupancy_grid(tree, thresh=0.0, dilate=0, max_res=8)
    res = grid.shape[0]
    assert res == 8
    expect = np.zeros((res, res, res), bool)
    for i, s in ((coarse_i, 1 / 3), (fine_i, 1 / 9)):
        c = corner[i]
        lo = np.floor(c * res).astype(int)
        hi = np.minimum(np.ceil((c + s) * res - 1e-6).astype(int), res)
        expect[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = True
    np.testing.assert_array_equal(grid, expect)


def test_load_occupancy_packed_format_roundtrip(tmp_path):
    """scripts/bake_occupancy.py's packed npz loads back bit-exact, with
    dilation applied at load time."""
    from mega_nerf_tpu.render.ray_bounds import load_occupancy

    rng = np.random.default_rng(3)
    res = 32
    grid = rng.random((res, res, res)) < 0.05
    inv = np.array([0.1, 0.2, 0.3], np.float32)
    off = np.array([0.5, 0.4, 0.6], np.float32)
    np.savez_compressed(
        tmp_path / "occ.npz",
        occupancy=np.packbits(grid.reshape(-1)),
        res=np.int64(res),
        invradius3=inv,
        offset=off,
        sigma_thresh=np.float32(0.35),
    )
    g0, i0, o0 = load_occupancy(tmp_path / "occ.npz", dilate=0)
    np.testing.assert_array_equal(g0, grid)
    np.testing.assert_array_equal(i0, inv)
    np.testing.assert_array_equal(o0, off)
    g1, _, _ = load_occupancy(tmp_path / "occ.npz", dilate=1)
    assert g1.sum() > grid.sum() and (g1 | ~grid).all()


def test_render_rays_fg_bounds_noop_and_tight():
    fg = _ball_bundle([0.8, 0.2, 0.4])
    settings = RenderSettings(coarse_samples=64, fine_samples=64,
                              get_depth=True)
    rays = _straight_rays(4)  # z=2 looking -z at an r=0.5 ball; t_hit=1.5
    base, _ = render_rays(fg, None, None, None, rays, None, settings)

    # Pass-through bounds reproduce the unbounded render exactly.
    noop = jnp.concatenate([rays[:, 6:7], rays[:, 7:8]], axis=1)
    same, _ = render_rays(fg, None, None, None, rays, None, settings,
                          fg_bounds=noop)
    for k in base:
        np.testing.assert_allclose(same[k], base[k], rtol=0, atol=1e-6,
                                   err_msg=k)

    # Bounds tight around the ball entry keep the surface (and spend the
    # whole budget there: depth resolves at least as accurately).
    tight = jnp.tile(jnp.array([[1.3, 1.8]]), (4, 1))
    t_res, _ = render_rays(fg, None, None, None, rays, None, settings,
                           fg_bounds=tight)
    np.testing.assert_allclose(t_res["rgb_fine"], base["rgb_fine"],
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(t_res["depth_fine"], 1.5, rtol=0, atol=0.02)

    # Collapsed bounds: zero fg weights -> black, depth 0 (no bg model).
    collapsed = jnp.tile(jnp.array([[4.0, 4.0]]), (4, 1))
    c_res, _ = render_rays(fg, None, None, None, rays, None, settings,
                           fg_bounds=collapsed)
    np.testing.assert_allclose(c_res["rgb_fine"], 0.0, rtol=0, atol=1e-6)


def test_fg_bounds_no_bg_keeps_catchall_residual_mass():
    """Regression for the `last_delta < INF_DELTA` gate in render_rays's
    fg_bounds cap (render/rendering.py): rays with NO background model end
    inside the scene with INF_DELTA catch-all semantics — their final
    sample absorbs ALL residual transmittance. Shrinking the fg interval
    must relocate that catch-all sample, never cap its trailing segment:
    capping drops the residual mass with nowhere to re-attribute it
    (measured -4 dB broad darkening on the 4x2 drone val views).

    Discriminating setup: a semi-transparent uniform medium (optical depth
    ~0.5 over the tightened interval, so ~61% of the mass rides the
    catch-all), no bg, far shrunk 4.0 -> 1.5. With the gate, rgb equals
    the unbounded render (= the medium color: total weight 1 under the
    catch-all) to sampling tolerance; with the cap applied to these
    INF-delta rays, rgb collapses to ~0.42x the color and this fails.
    """
    from test_rendering import _const_bundle

    color = jnp.array([0.8, 0.3, 0.6])
    fg = _const_bundle(color, density=0.5)
    settings = RenderSettings(coarse_samples=64, fine_samples=64)
    rays = _straight_rays_rb(4, near=0.5, far=4.0)

    base, _ = render_rays(fg, None, None, None, rays, None, settings)
    np.testing.assert_allclose(
        np.asarray(base["rgb_fine"]),
        np.broadcast_to(np.asarray(color), (4, 3)),
        atol=2e-3,
    )

    shrunk = jnp.tile(jnp.array([[0.5, 1.5]]), (4, 1))
    tight, _ = render_rays(fg, None, None, None, rays, None, settings,
                           fg_bounds=shrunk)
    np.testing.assert_allclose(
        np.asarray(tight["rgb_fine"]),
        np.asarray(base["rgb_fine"]),
        atol=5e-3,
        err_msg="residual transmittance lost when fg_bounds shrank a "
                "no-bg (INF last_delta) ray's interval",
    )


def _straight_rays_rb(n, near=0.5, far=4.0):
    o = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    return jnp.concatenate(
        [o, d, jnp.full((n, 1), near), jnp.full((n, 1), far)], axis=-1)


@pytest.mark.parametrize("with_cull", [False, True])
def test_render_image_occupancy_all_occupied_matches_plain(
        tmp_path, monkeypatch, with_cull):
    """End-to-end Runner.render_image with --occupancy_path (monkeypatched
    to an all-occupied grid): bounds degenerate to [near, far] and the
    render must match the plain one to f32 step-rounding; composes with
    submodule culling."""
    from mega_nerf_tpu.data.torch_io import save_pt
    from mega_nerf_tpu.parallel.train_step import (
        make_optimizer,
        make_train_state,
    )
    from mega_nerf_tpu.runtime.runner import Runner

    ds = make_synthetic_dataset(tmp_path / "ds", n_train=3, n_val=1,
                                hw=(16, 16))
    kw = {}
    if with_cull:
        centroid_meta = {
            "centroids": np.array(
                [[0, -0.7, 0], [0, 0.7, 0], [0, -50, 0]], np.float32),
            "cluster_2d": False,
            "grid_dim": [3, 1],
            "min_position": np.full(3, -60.0, np.float32),
            "max_position": np.full(3, 60.0, np.float32),
        }
        save_pt(centroid_meta, tmp_path / "params.pt")
        kw["train_mega_nerf"] = str(tmp_path / "params.pt")
    hp = tiny_train_hparams(ds, tmp_path / "exp", train_iterations=5,
                            ckpt_interval=100, **kw)
    runner = Runner(hp, set_experiment_path=False)
    opt = make_optimizer(hp.lr, hp.lr_decay_factor, hp.train_iterations)
    state = make_train_state(runner.fg, None, opt, runner.init_key)
    meta = runner.val_items[0]

    plain = runner.render_image(meta, state)

    grid = np.ones((4, 4, 4), bool)
    inv = np.full(3, 1.0 / 120.0, np.float32)  # world [-60,60] -> [0,1]
    off = np.full(3, 0.5, np.float32)
    monkeypatch.setattr(
        Runner, "_get_occupancy", lambda self: (grid, inv, off)
    )
    bounded = runner.render_image(meta, state)

    assert plain.keys() == bounded.keys()
    for k in plain:
        np.testing.assert_allclose(bounded[k], plain[k], rtol=0, atol=1e-4,
                                   err_msg=k)
