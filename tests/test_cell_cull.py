"""Exact per-chunk submodule culling (render/cell_cull.py).

The dense mega-mixture blend pays K x MLP FLOPs on every chunk; culling
drops submodules whose routing weight is PROVABLY zero everywhere in a
chunk's sample box. These tests pin (1) the interval bound is conservative
against brute-force sampling, (2) dropping provably-zero cells leaves the
blend bit-equal, and (3) `Runner.render_image` returns identical images
with culling on and off while actually evaluating fewer submodules.
Reference cost being avoided: `mega_nerf/models/mega_nerf.py:34-49`
evaluates every submodule that owns ANY point of the batch.
"""

from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mega_nerf_tpu.data.torch_io import save_pt
from mega_nerf_tpu.models.mega import cluster_weights, mega_apply
from mega_nerf_tpu.render.cell_cull import active_cells, chunk_point_box
from mega_nerf_tpu.runtime.runner import Runner
from tests.synthetic import make_synthetic_dataset, tiny_train_hparams


def _random_rays(rng, n, origin_scale=2.0):
    o = rng.uniform(-origin_scale, origin_scale, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = rng.uniform(0.1, 0.8, (n, 1))
    far = near + rng.uniform(0.5, 3.0, (n, 1))
    return np.concatenate([o, d, near, far], axis=1).astype(np.float32)


@pytest.mark.parametrize("margin", [1.0, 1.15, 2.0])
@pytest.mark.parametrize("cds", [0, 1])
def test_active_cells_conservative_vs_dense_sampling(margin, cds):
    """Any cell with nonzero weight at ANY sample position along the rays
    must be in the active mask (brute-force check over dense t-samples)."""
    rng = np.random.default_rng(0)
    for trial in range(8):
        rays = _random_rays(rng, 64)
        gx, gy = rng.integers(2, 5), rng.integers(1, 4)
        ys, zs = np.meshgrid(
            np.linspace(-3, 3, gx), np.linspace(-2, 2, gy), indexing="ij"
        )
        centroids = np.stack(
            [np.zeros(gx * gy), ys.reshape(-1), zs.reshape(-1)], axis=1
        ).astype(np.float32)

        mask = active_cells(rays, centroids, margin, cds)

        t = np.linspace(0.0, 1.0, 96, dtype=np.float32)[None, :, None]
        o, d = rays[:, None, :3], rays[:, None, 3:6]
        nf = rays[:, None, 6:7] * (1 - t) + rays[:, None, 7:8] * t
        pts = (o + nf * d).reshape(-1, 3)
        w = np.asarray(cluster_weights(pts, centroids, margin, cds))
        touched = (w > 0).any(axis=0)
        assert not (touched & ~mask).any(), (
            f"trial {trial}: culled a contributing cell "
            f"(touched={touched}, mask={mask})"
        )


def test_box_contains_all_segment_points():
    rng = np.random.default_rng(1)
    rays = _random_rays(rng, 32)
    lo, hi = chunk_point_box(rays, 0)
    t = rng.uniform(0, 1, (32, 50, 1))
    nf = rays[:, None, 6:7] * (1 - t) + rays[:, None, 7:8] * t
    pts = (rays[:, None, :3] + nf * rays[:, None, 3:6]).reshape(-1, 3)
    assert (pts >= lo - 1e-5).all() and (pts <= hi + 1e-5).all()


@pytest.mark.parametrize("margin", [1.0, 1.15])
def test_culled_blend_is_exact(margin):
    """Dropping the provably-zero cells from the stacked params + centroids
    leaves the dense blend's output unchanged: the surviving cells' weights
    are identical (the per-point min distance is attained by a survivor and
    the inverse-distance normalizer only sums within-margin entries)."""
    rng = np.random.default_rng(2)
    rays = _random_rays(rng, 48, origin_scale=1.0)
    # Two reachable cells + two "impossible" cells far outside any sample box.
    centroids = np.array(
        [[0, -0.7, 0], [0, 0.7, 0], [0, -50, 0], [0, 50, 0]], np.float32
    )
    k = len(centroids)
    params = {
        "w": rng.normal(size=(k, 3, 4)).astype(np.float32),
        "b": rng.normal(size=(k, 4)).astype(np.float32),
    }

    def apply_fn(p, xyz, dirs, image_indices, sigma_noise, sigma_only):
        return xyz @ p["w"] + p["b"]

    mask = active_cells(rays, centroids, margin, 0)
    assert mask[:2].all() and not mask[2:].any()

    t = rng.uniform(0, 1, (48, 24, 1)).astype(np.float32)
    nf = rays[:, None, 6:7] * (1 - t) + rays[:, None, 7:8] * t
    pts = (rays[:, None, :3] + nf * rays[:, None, 3:6]).reshape(-1, 3)

    w_full = cluster_weights(pts, centroids, margin, 0)
    full = mega_apply(apply_fn, params, w_full, pts)

    idx = np.flatnonzero(mask)
    sub_params = jax.tree.map(lambda x: x[idx], params)
    w_sub = cluster_weights(pts, centroids[idx], margin, 0)
    np.testing.assert_array_equal(
        np.asarray(w_full)[:, idx], np.asarray(w_sub)
    )
    culled = mega_apply(apply_fn, sub_params, w_sub, pts)
    np.testing.assert_allclose(
        np.asarray(culled), np.asarray(full), rtol=0, atol=1e-6
    )


@pytest.fixture(scope="module")
def mega_runner(tmp_path_factory):
    """Joint-mega Runner over K=4 cells, two of which are unreachable from
    any camera — the honest cull setting in miniature."""
    root = tmp_path_factory.mktemp("cull")
    ds = make_synthetic_dataset(root / "ds", n_train=3, n_val=1, hw=(16, 16))
    centroid_meta = {
        "centroids": np.array(
            [[0, -0.7, 0], [0, 0.7, 0], [0, -50, 0], [0, 50, 0]], np.float32
        ),
        "cluster_2d": False,
        "grid_dim": [4, 1],
        "min_position": np.full(3, -60.0, np.float32),
        "max_position": np.full(3, 60.0, np.float32),
    }
    save_pt(centroid_meta, root / "params.pt")
    hp = tiny_train_hparams(
        ds, root / "exp",
        train_mega_nerf=str(root / "params.pt"),
        train_iterations=10, ckpt_interval=100,
    )
    runner = Runner(hp, set_experiment_path=False)
    assert runner.fg.is_mega and runner.fg.centroids.shape == (4, 3)

    from mega_nerf_tpu.parallel.train_step import make_optimizer, make_train_state

    opt = make_optimizer(hp.lr, hp.lr_decay_factor, hp.train_iterations)
    state = make_train_state(runner.fg, None, opt, runner.init_key)
    return hp, runner, state


def test_render_image_cull_equivalence(mega_runner):
    """render_image with culling on must match culling off to float32
    rounding, while the jitted culled render only ever sees the 2 reachable
    submodules."""
    hp, runner, state = mega_runner
    meta = runner.val_items[0]

    # Force several chunks so the per-chunk path runs more than once.
    old_pix = hp.image_pixel_batch_size
    try:
        hp.image_pixel_batch_size = 96
        hp.cell_cull = True
        culled = runner.render_image(meta, state)
        # The cull actually engaged: every cached active set has 2 cells.
        assert runner._cull_cache is not None and len(runner._cull_cache), \
            "cull path never ran"
        masks = runner._cull_cache.masks()
        assert all(m.sum() == 2 for m in masks), masks
        hp.cell_cull = False
        plain = runner.render_image(meta, state)
    finally:
        hp.image_pixel_batch_size = old_pix
        hp.cell_cull = True

    assert culled.keys() == plain.keys()
    for k in culled:
        np.testing.assert_allclose(
            culled[k], plain[k], rtol=0, atol=1e-6, err_msg=k
        )


def test_render_image_cull_equivalence_with_bg(mega_runner, tmp_path):
    """Same equivalence with a NeRF++ background mixture in play: the bg
    submodules are never culled (unbounded-radius routing) and get their
    own chunk-cap bound."""
    hp, runner, state = mega_runner
    ds = hp.dataset_path

    hp2 = tiny_train_hparams(
        ds, tmp_path / "exp_bg",
        train_mega_nerf=hp.train_mega_nerf,
        train_iterations=10, ckpt_interval=100,
        ray_altitude_range=[-10.0, 10.0],
    )
    hp2.bg_nerf = True
    runner2 = Runner(hp2, set_experiment_path=False)
    assert runner2.bg is not None and runner2.bg.is_mega

    from mega_nerf_tpu.parallel.train_step import make_optimizer, make_train_state

    opt = make_optimizer(hp2.lr, hp2.lr_decay_factor, hp2.train_iterations)
    state2 = make_train_state(runner2.fg, runner2.bg, opt, runner2.init_key)

    meta = runner2.val_items[0]
    hp2.cell_cull = True
    culled = runner2.render_image(meta, state2)
    assert runner2._cull_cache
    hp2.cell_cull = False
    plain = runner2.render_image(meta, state2)

    assert culled.keys() == plain.keys()
    for k in culled:
        np.testing.assert_allclose(
            culled[k], plain[k], rtol=0, atol=1e-6, err_msg=k
        )


def test_octree_bake_cull_equivalence(tmp_path, monkeypatch):
    """The octree bake's point probes (scripts/create_octree.py) cull
    per-chunk too: the baked tree must be identical with culling on and
    off (structure and leaf data)."""
    from mega_nerf_tpu.octree import N3Tree
    import mega_nerf_tpu.runtime.runner as runner_mod
    import scripts.create_octree as co

    # Shrink the probe point budget so the bake runs several chunks per
    # grid pass (the real budget would cover the whole test grid in one).
    monkeypatch.setattr(runner_mod, "EVAL_POINT_BUDGET", 8 * 4096)

    ds = make_synthetic_dataset(tmp_path / "ds", n_train=3, n_val=1,
                                hw=(16, 16))
    centroid_meta = {
        "centroids": np.array(
            [[0, -0.7, 0], [0, 0.7, 0], [0, -50, 0], [0, 50, 0]], np.float32
        ),
        "cluster_2d": False,
        "grid_dim": [4, 1],
        "min_position": np.full(3, -60.0, np.float32),
        "max_position": np.full(3, 60.0, np.float32),
    }
    save_pt(centroid_meta, tmp_path / "params.pt")
    hp = tiny_train_hparams(
        ds, tmp_path / "exp",
        train_mega_nerf=str(tmp_path / "params.pt"),
        train_iterations=20, ckpt_interval=20,
    )
    Runner(hp).train()

    trees = {}
    for cull in (True, False):
        bake_hp = tiny_train_hparams(
            ds, tmp_path / "unused",
            train_mega_nerf=str(tmp_path / "params.pt"),
            ray_altitude_range=[-2.0, 2.0],
            ckpt_path=str(tmp_path / "exp" / "0" / "models" / "20.ckpt"),
        )
        bake_hp.cell_cull = cull
        bake_hp.dataset_path = str(ds)
        bake_hp.output = str(tmp_path / f"tree_{cull}.npz")
        bake_hp.alpha_thresh = 0.01
        bake_hp.scale_alpha_thresh = 0.01
        bake_hp.tree_branch_n = 2
        bake_hp.init_grid_depth = 4
        bake_hp.samples_per_cell = 4
        bake_hp.masking_mode = "sigma"
        bake_hp.weight_thresh = 0.001
        bake_hp.embedding_index = 0
        bake_hp.camera_params = [32, 32, 28, 28, 16, 16]
        # Small chunks force several probe dispatches per grid pass.
        bake_hp.model_chunk_size = 4096
        co.main(bake_hp)
        trees[cull] = N3Tree.load(tmp_path / f"tree_{cull}.npz")

    a, b = trees[True], trees[False]
    # Culling is exact in exact arithmetic, but the backend may pick a
    # different batched-matmul kernel for a K=2 vs K=4 leading vmap axis
    # (observed: oneDNN on CPU, 8/122924 elements off by <=2.4e-4 from
    # f32 reduction-order differences INSIDE the same cell's matmuls).
    # That epsilon can flip a sigma sitting ON the refine threshold, so
    # compare structure with a tolerance (>=99.5% common leaves) and leaf
    # data exactly on the common set.
    la = {tuple(x) for x in a.leaf_indices().reshape(a.leaf_indices().shape[0], -1)}
    lb = {tuple(x) for x in b.leaf_indices().reshape(b.leaf_indices().shape[0], -1)}
    common = np.asarray(sorted(la & lb))
    assert len(common) >= 0.995 * max(len(la), len(lb)), (
        len(la), len(lb), len(common)
    )
    shape = a.leaf_indices().shape[1:]
    common = common.reshape((len(common),) + shape).astype(
        a.leaf_indices().dtype
    )
    np.testing.assert_allclose(
        a.get_leaf_data(common), b.get_leaf_data(common), rtol=0, atol=1e-3
    )


def test_bucket_pads_to_power_of_two():
    """ParamSubsetCache buckets active counts to the next power of two
    (capped at K) so the downstream per-SIZE render jit compiles at most
    log2(K)+1 times per image/bake instead of up to K times."""
    from mega_nerf_tpu.render.cell_cull import ParamSubsetCache, bucket_mask

    k = 8
    params = {"w": np.arange(k * 2, dtype=np.float32).reshape(k, 2)}
    centroids = np.zeros((k, 3), np.float32)
    cache = ParamSubsetCache(
        params, centroids,
        gather=lambda p, idx: jax.tree.map(lambda x: x[np.asarray(idx)], p),
        put=np.asarray,
    )
    for n_active, expect in [(1, 1), (2, 2), (3, 4), (4, 4), (5, 8),
                             (7, 8), (8, 8)]:
        mask = np.zeros(k, bool)
        mask[np.random.default_rng(n_active).choice(k, n_active,
                                                    replace=False)] = True
        out = bucket_mask(mask)
        assert out.sum() == expect, (n_active, out)
        assert (out | ~mask).all(), "bucket dropped an active cell"

    # Cap at K when K is not a power of two.
    mask = np.array([1, 0, 1, 1, 1, 1], bool)
    assert bucket_mask(mask).sum() == 6

    # Bucketing to the full set takes the no-gather fast path.
    mask = np.zeros(k, bool)
    mask[:5] = True
    got_params, got_centroids = cache.get(mask)
    assert got_params is params
    # Distinct masks with the same bucketed set share one cache entry.
    mask2 = np.zeros(k, bool)
    mask2[3:] = True  # 5 active again -> bucketed to all 8
    cache.get(mask2)
    assert len(cache) == 1

    # A strict subset gathers the padded rows in index order.
    mask3 = np.zeros(k, bool)
    mask3[[1, 6, 7]] = True  # 3 active -> bucket pads cell 0 in
    sub, cen = cache.get(mask3)
    np.testing.assert_array_equal(sub["w"], params["w"][[0, 1, 6, 7]])
    assert cen.shape == (4, 3)


@pytest.mark.parametrize("margin", [1.0, 1.15])
def test_bucketed_blend_is_exact(margin):
    """Padding the active set with provably-zero cells keeps the blend
    bit-equal: the padded-in cells get zero weight over the subset too."""
    rng = np.random.default_rng(5)
    rays = _random_rays(rng, 32, origin_scale=1.0)
    # 3 reachable cells + 5 impossible ones: bucket pads 3 -> 4.
    centroids = np.concatenate([
        np.array([[0, -0.7, 0], [0, 0.0, 0], [0, 0.7, 0]], np.float32),
        np.stack([np.zeros(5), np.linspace(40, 80, 5),
                  np.zeros(5)], axis=1).astype(np.float32),
    ])
    k = len(centroids)
    mask = active_cells(rays, centroids, margin, 0)
    assert mask[:3].all() and not mask[3:].any()

    from mega_nerf_tpu.render.cell_cull import ParamSubsetCache

    params = {"w": rng.normal(size=(k, 3, 4)).astype(np.float32)}
    cache = ParamSubsetCache(
        params, centroids,
        gather=lambda p, idx: jax.tree.map(lambda x: x[np.asarray(idx)], p),
        put=np.asarray,
    )
    sub_params, sub_centroids = cache.get(mask)
    assert sub_centroids.shape == (4, 3)

    t = rng.uniform(0, 1, (32, 16, 1)).astype(np.float32)
    nf = rays[:, None, 6:7] * (1 - t) + rays[:, None, 7:8] * t
    pts = (rays[:, None, :3] + nf * rays[:, None, 3:6]).reshape(-1, 3)

    def apply_fn(p, xyz, dirs, image_indices, sigma_noise, sigma_only):
        return xyz @ p["w"]

    full = mega_apply(apply_fn, params,
                      cluster_weights(pts, centroids, margin, 0), pts)
    w_sub = cluster_weights(pts, np.asarray(sub_centroids), margin, 0)
    # The padded-in cell (index 3 of the original set) never gets weight.
    assert not np.asarray(w_sub)[:, -1].any()
    bucketed = mega_apply(apply_fn, sub_params, w_sub, pts)
    np.testing.assert_allclose(
        np.asarray(bucketed), np.asarray(full), rtol=0, atol=1e-6
    )


def test_clamp_rays_to_fg_matches_device_intersect():
    """Host fg-exit clamp (cell_cull.clamp_rays_to_fg) agrees with the
    device's ops.geometry.intersect_sphere and is conservative: the
    clamped far is never below the device's effective fg interval end."""
    import jax.numpy as jnp

    from mega_nerf_tpu.ops.geometry import intersect_sphere
    from mega_nerf_tpu.render.cell_cull import clamp_rays_to_fg

    rng = np.random.default_rng(11)
    c = np.array([0.4, -0.1, 0.05], np.float64)
    r = np.array([3.6, 2.7, 2.1], np.float64)
    o = c + rng.uniform(-0.5, 0.5, (64, 3)) * r  # strictly inside
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([
        o, d, np.full((64, 1), 0.05), np.full((64, 1), 1e5)
    ], axis=1).astype(np.float32)

    clamped = clamp_rays_to_fg(rays, c, r)
    dev = np.asarray(intersect_sphere(
        jnp.asarray(rays[:, :3]), jnp.asarray(rays[:, 3:6]),
        jnp.asarray(c, jnp.float32), jnp.asarray(r, jnp.float32),
    ))
    dev_end = np.minimum(rays[:, 7], np.maximum(dev, rays[:, 6]))
    assert (clamped[:, 7] >= dev_end).all(), "clamp below device fg end"
    np.testing.assert_allclose(clamped[:, 7], dev_end, rtol=1e-4)
    # Everything but far is untouched; the no-sphere path returns an
    # unclamped COPY (callers mutate the result in place).
    np.testing.assert_array_equal(clamped[:, :7], rays[:, :7].astype(np.float64))
    unclamped = clamp_rays_to_fg(rays)
    assert unclamped is not rays
    np.testing.assert_array_equal(unclamped, rays.astype(np.float64))


def test_cull_engages_on_unbounded_far_only_after_clamp():
    """bg scenes carry far ~ 1e5: the raw box spans every cell (nothing
    culls — the measured on-chip no-win), the clamped box culls."""
    from mega_nerf_tpu.render.cell_cull import clamp_rays_to_fg

    c = np.zeros(3, np.float64)
    r = np.ones(3, np.float64)
    # Camera near the -y edge looking further -y: only the -y cell is
    # reachable inside the unit sphere.
    o = np.tile(np.array([0.0, -0.5, 0.0], np.float32), (16, 1))
    d = np.tile(np.array([0.0, -1.0, 0.0], np.float32), (16, 1))
    d += np.random.default_rng(3).normal(scale=0.03, size=(16, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([
        o, d, np.full((16, 1), 0.05), np.full((16, 1), 1e5)
    ], axis=1).astype(np.float32)
    centroids = np.array([[0, -0.8, 0], [0, 0.8, 0], [0, 30, 0]], np.float32)

    raw = active_cells(rays, centroids, 1.15, 0)
    assert raw.all(), "raw far=1e5 box should reach every cell"
    clamped = active_cells(
        clamp_rays_to_fg(rays, c, r), centroids, 1.15, 0
    )
    assert clamped[0] and not clamped[2], clamped


def test_ray_support_masks_conservative():
    """The probed per-ray support set must contain every cell that
    cluster_weights gives nonzero weight ANYWHERE on the segment —
    checked against dense sampling far finer than the probe spacing."""
    from mega_nerf_tpu.models.mega import cluster_weights
    from mega_nerf_tpu.render.cell_cull import ray_support_masks

    rng = np.random.default_rng(7)
    k = 8
    centroids = np.concatenate([
        np.zeros((k, 1), np.float32),
        rng.uniform(-1, 1, (k, 2)).astype(np.float32),
    ], axis=1)
    n = 64
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = rng.uniform(0.05, 0.3, (n, 1)).astype(np.float32)
    far = near + rng.uniform(0.0, 1.5, (n, 1)).astype(np.float32)
    far[: n // 8] = near[: n // 8]  # some collapsed rays
    rays = np.concatenate([o, d, near, far], axis=1)

    for margin, cds in [(1.0, 0), (1.15, 0), (1.15, 1)]:
        masks = ray_support_masks(rays, centroids, margin, cds, probes=16)
        assert not masks[: n // 8].any(), "collapsed rays must be all-False"
        t = np.linspace(0, 1, 301, dtype=np.float32)[None, :, None]
        pts = o[:, None] + d[:, None] * (
            near[:, None] * (1 - t) + far[:, None] * t
        )
        w = np.asarray(cluster_weights(
            jnp.asarray(pts.reshape(-1, 3)), jnp.asarray(centroids),
            margin, cds,
        )).reshape(n, -1, k)
        true_support = (w > 0).any(1)
        live = (rays[:, 7] > rays[:, 6])[:, None]
        missed = true_support & live & ~masks
        assert not missed.any(), (margin, cds, np.argwhere(missed)[:5])
        # And not vacuously loose: strictly fewer than all cells active.
        assert masks.sum() < live.sum() * k * 0.9


def test_support_order_groups_identical_sets():
    from mega_nerf_tpu.render.cell_cull import support_order

    rng = np.random.default_rng(0)
    masks = rng.random((1000, 8)) < 0.25
    order = support_order(masks)
    keys = (masks[order] @ (1 << np.arange(8))).astype(int)
    assert (np.diff(keys) >= 0).all(), "identical sets must be contiguous"
    assert sorted(order) == list(range(1000))


def test_render_image_occupancy_plus_cull_matches_occupancy_only(
        tmp_path, monkeypatch):
    """With a real (partial) occupancy grid, the culled render must equal
    the uncculled render under the SAME bounds — culling stays exact when
    composed with occupancy tightening (support-order path), including
    collapsed rays."""
    from mega_nerf_tpu.data.torch_io import save_pt
    from mega_nerf_tpu.parallel.train_step import (
        make_optimizer,
        make_train_state,
    )
    from mega_nerf_tpu.runtime.runner import Runner
    ds = make_synthetic_dataset(tmp_path / "ds", n_train=3, n_val=1,
                                hw=(16, 16))
    centroid_meta = {
        "centroids": np.array(
            [[0, -0.7, 0], [0, 0.7, 0], [0, -50, 0], [0, 50, 0]], np.float32),
        "cluster_2d": False,
        "grid_dim": [4, 1],
        "min_position": np.full(3, -60.0, np.float32),
        "max_position": np.full(3, 60.0, np.float32),
    }
    save_pt(centroid_meta, tmp_path / "params.pt")
    hp = tiny_train_hparams(ds, tmp_path / "exp",
                            train_mega_nerf=str(tmp_path / "params.pt"),
                            train_iterations=5, ckpt_interval=100)
    hp.image_pixel_batch_size = 96  # several chunks
    runner = Runner(hp, set_experiment_path=False)
    opt = make_optimizer(hp.lr, hp.lr_decay_factor, hp.train_iterations)
    state = make_train_state(runner.fg, None, opt, runner.init_key)
    meta = runner.val_items[0]

    # Occupied only near the scene content (|p| < ~2): rays pointing away
    # collapse, others tighten. World [-4, 4] -> tree [0, 1].
    grid = np.zeros((16, 16, 16), bool)
    grid[5:11, 5:11, 5:11] = True
    inv = np.full(3, 1.0 / 8.0, np.float32)
    off = np.full(3, 0.5, np.float32)
    monkeypatch.setattr(
        Runner, "_get_occupancy", lambda self: (grid, inv, off)
    )

    hp.cell_cull = True
    culled = runner.render_image(meta, state)
    assert runner._cull_cache is not None and len(runner._cull_cache)
    masks = runner._cull_cache.masks()
    assert all(m.sum() <= 2 for m in masks), masks

    hp.cell_cull = False
    runner2 = Runner(hp, set_experiment_path=False)
    plain = runner2.render_image(meta, state)

    assert culled.keys() == plain.keys()
    for k in culled:
        np.testing.assert_allclose(
            culled[k], plain[k], rtol=0, atol=2e-6, err_msg=k
        )


def test_cull_gated_off_when_image_set_full(tmp_path):
    """When every cell is active at the image level and no occupancy
    bounds exist, the culled path is skipped outright (measured on-chip:
    per-chunk boxes never shrink then — the variant only added per-size
    compiles, PERF.md round 4)."""
    from mega_nerf_tpu.parallel.train_step import (
        make_optimizer,
        make_train_state,
    )

    ds = make_synthetic_dataset(tmp_path / "ds", n_train=3, n_val=1,
                                hw=(16, 16))
    # Both cells inside every view's sample box -> full image-level set.
    centroid_meta = {
        "centroids": np.array([[0, -0.5, 0], [0, 0.5, 0]], np.float32),
        "cluster_2d": False,
        "grid_dim": [2, 1],
        "min_position": np.full(3, -60.0, np.float32),
        "max_position": np.full(3, 60.0, np.float32),
    }
    save_pt(centroid_meta, tmp_path / "params.pt")
    hp = tiny_train_hparams(ds, tmp_path / "exp",
                            train_mega_nerf=str(tmp_path / "params.pt"),
                            train_iterations=5, ckpt_interval=100)
    runner = Runner(hp, set_experiment_path=False)
    opt = make_optimizer(hp.lr, hp.lr_decay_factor, hp.train_iterations)
    state = make_train_state(runner.fg, None, opt, runner.init_key)

    from mega_nerf_tpu.render.cell_cull import active_cells as ac
    from mega_nerf_tpu.data.memory_dataset import generate_image_rays

    meta = runner.val_items[0]
    rays = generate_image_rays(meta, runner.near, runner.far,
                               runner.ray_altitude_range, hp.center_pixels)
    assert ac(rays, centroid_meta["centroids"], runner.fg.boundary_margin,
              runner.fg.cluster_dim_start).all(), "scene must be full-set"

    hp.cell_cull = True
    runner.render_image(meta, state)
    assert getattr(runner, "_cull_cache", None) is None or \
        len(runner._cull_cache) == 0, "culled path ran despite the gate"


def test_tile_order_is_local_permutation():
    from mega_nerf_tpu.render.cell_cull import tile_order

    w, h, chunk = 20, 12, 70  # tile side -> 8
    order = tile_order(w, h, chunk)
    assert sorted(order) == list(range(w * h))
    # First 64 entries are exactly the top-left 8x8 tile (row-major).
    ys, xs = np.divmod(order[:64], w)
    assert ys.max() < 8 and xs.max() < 8
    assert (np.diff(ys) >= 0).all()
