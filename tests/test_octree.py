import dataclasses

import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.octree import N3Tree, grid_weight_render_max
from tests.synthetic import look_at_drb


def test_tree_transforms_roundtrip():
    tree = N3Tree(radius=[2.0, 1.0, 4.0], center=[0.5, -0.5, 1.0])
    pts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    np.testing.assert_allclose(
        tree.tree_to_world(tree.world_to_tree(pts)), pts, atol=1e-5
    )
    # Volume corners map to [0,1]^3.
    lo = np.array([0.5 - 2.0, -0.5 - 1.0, 1.0 - 4.0])
    hi = np.array([0.5 + 2.0, -0.5 + 1.0, 1.0 + 4.0])
    np.testing.assert_allclose(tree.world_to_tree(lo), 0.0, atol=1e-6)
    np.testing.assert_allclose(tree.world_to_tree(hi), 1.0, atol=1e-6)


def test_refine_and_locate():
    tree = N3Tree(N=2, data_dim=4, depth_limit=4)
    assert tree.n_leaves == 8  # root's 2^3 cells
    # Refine the cell containing a specific point, 3 levels deep.
    target = np.array([[0.6, 0.6, 0.6]])  # world == tree coords (default r=.5,c=.5)
    for depth in range(1, 4):
        created = tree.refine_at_points(target)
        assert created == 1
    # 8 + 3 nodes allocated; each refine converts 1 leaf into 8.
    assert tree.n_internal == 4
    assert tree.n_leaves == 8 + 3 * 7
    # Leaf containing the target is now at depth 3 -> cell side 1/16.
    node, cell = tree._locate(tree.world_to_tree(target))
    assert tree._depth[node[0]] == 3


def test_leaf_sampling_within_bounds():
    tree = N3Tree(N=2, data_dim=4, depth_limit=5)
    tree.refine_at_points(np.array([[0.3, 0.7, 0.2]]))
    leaves = tree.leaf_indices()
    rng = np.random.default_rng(1)
    pts = tree.sample_leaves(leaves, 32, rng)
    corner, side = tree.leaf_bounds(leaves)
    t = tree.world_to_tree(pts)
    lo = corner[:, None, :]
    hi = (corner + side[:, None])[:, None, :]
    assert (t >= lo - 1e-6).all() and (t <= hi + 1e-6).all()


def test_leaf_data_and_fill_internal():
    tree = N3Tree(N=2, data_dim=2, depth_limit=3)
    tree.refine_at_points(np.array([[0.1, 0.1, 0.1]]))
    leaves = tree.leaf_indices()
    values = np.arange(leaves.shape[0] * 2, dtype=np.float32).reshape(-1, 2)
    tree.set_leaf_data(leaves, values)
    np.testing.assert_array_equal(tree.get_leaf_data(leaves), values)
    tree.fill_internal()
    # Parent cell of the refined node holds the mean of its 8 child cells.
    child_node = 1
    t = int(tree.parent_depth[child_node, 0])
    pn, rem = t // 8, t % 8
    ci, cj, ck = rem // 4, (rem // 2) % 2, rem % 2
    np.testing.assert_allclose(
        tree.data[pn, ci, cj, ck],
        tree.data[child_node].reshape(-1, 2).mean(axis=0),
        rtol=1e-6,
    )


def test_save_load_roundtrip(tmp_path):
    tree = N3Tree(N=2, data_dim=4, depth_limit=4, radius=[1.0, 2.0, 3.0],
                  center=[0.1, 0.2, 0.3], data_format="RGBA")
    tree.refine_at_points(np.random.default_rng(0).random((20, 3)) * 2 - 1)
    tree.refine_at_points(np.random.default_rng(1).random((20, 3)) * 2 - 1)
    leaves = tree.leaf_indices()
    tree.set_leaf_data(
        leaves, np.random.default_rng(2).random((leaves.shape[0], 4)).astype(np.float32)
    )
    tree.shrink_to_fit()
    tree.save(tmp_path / "tree.npz")

    z = np.load(tmp_path / "tree.npz", allow_pickle=True)
    # svox layout keys present.
    for key in ("data", "child", "parent_depth", "invradius3", "offset",
                "data_dim", "depth_limit", "data_format", "n_internal"):
        assert key in z, key
    assert z["data"].dtype == np.float16

    back = N3Tree.load(tmp_path / "tree.npz")
    assert back.n_internal == tree.n_internal
    assert back.n_leaves == tree.n_leaves
    np.testing.assert_array_equal(back.child, tree.child)
    np.testing.assert_allclose(back._corner, tree._corner, atol=1e-6)
    np.testing.assert_array_equal(back._depth, tree._depth)
    np.testing.assert_allclose(
        back.get_leaf_data(back.leaf_indices()),
        tree.get_leaf_data(leaves).astype(np.float16).astype(np.float32),
    )


def test_grid_weight_render_occlusion():
    """A camera looking at an opaque wall: front voxels get weight ~1,
    voxels behind the wall get ~0 (the culling signal)."""
    reso = 16
    sigma = np.zeros((reso, reso, reso), np.float32)
    sigma[:, :, 8] = 1e4  # opaque wall at z-slab 8 (tree coords z ~ 0.53)

    # Camera on the -z side of the volume looking toward +z (in world
    # coords the tree spans [-0.5, 0.5] with default radius/center 0.5...
    # use explicit transform: tree = world * invradius + offset.
    invradius = np.full(3, 1.0, np.float32)  # world [-0.?]: tree=world+0
    offset = np.full(3, 0.5, np.float32)  # world [-0.5,0.5] -> tree [0,1]

    c2w = look_at_drb(np.array([0.0, 0.0, -2.0]))  # looks toward origin (+z)
    weights = grid_weight_render_max(
        sigma, c2w[None], [24, 24, 20.0, 20.0, 12.0, 12.0],
        offset, invradius, reso, n_steps=64,
    )
    # The wall itself is hit with near-full weight somewhere.
    assert weights[:, :, 8].max() > 0.5
    # Space behind the wall (z-slabs > 8, farther from the camera) is
    # occluded.
    assert weights[:, :, 10:].max() < 0.05
    # Empty space before the wall accumulates no weight either.
    assert weights[:, :, :7].max() < 0.05


def test_grid_weight_max_over_cameras():
    reso = 8
    sigma = np.full((reso, reso, reso), 5.0, np.float32)
    offset = np.full(3, 0.5, np.float32)
    invradius = np.full(3, 1.0, np.float32)
    cam1 = look_at_drb(np.array([0.0, 0.0, -2.0]))
    cam2 = look_at_drb(np.array([0.0, 0.0, 2.0]))
    w1 = grid_weight_render_max(sigma, cam1[None], [8, 8, 8.0, 8.0, 4.0, 4.0],
                                offset, invradius, reso, n_steps=32)
    w12 = grid_weight_render_max(sigma, np.stack([cam1, cam2]),
                                 [8, 8, 8.0, 8.0, 4.0, 4.0],
                                 offset, invradius, reso, n_steps=32)
    assert (w12 >= w1 - 1e-6).all()
    assert w12.sum() > w1.sum()  # the second camera sees the far side


def test_create_octree_end_to_end(tmp_path):
    """Full bake: train a tiny NeRF, extract the octree, check structure."""
    from mega_nerf_tpu.runtime.runner import Runner
    from tests.synthetic import make_synthetic_dataset, tiny_train_hparams
    import scripts.create_octree as co

    ds = make_synthetic_dataset(tmp_path / "ds", n_train=3, n_val=1, hw=(16, 16))
    hp = tiny_train_hparams(
        ds, tmp_path / "exp", train_iterations=80, ckpt_interval=80,
        ray_altitude_range=[-2.0, 2.0],
    )
    Runner(hp).train()

    bake_hp = tiny_train_hparams(
        ds, tmp_path / "unused",
        ray_altitude_range=[-2.0, 2.0],
        ckpt_path=str(tmp_path / "exp" / "0" / "models" / "80.ckpt"),
    )
    bake_hp.dataset_path = str(ds)
    bake_hp.output = str(tmp_path / "tree.npz")
    bake_hp.alpha_thresh = 0.01
    bake_hp.scale_alpha_thresh = 0.01
    bake_hp.tree_branch_n = 2
    bake_hp.init_grid_depth = 5
    bake_hp.samples_per_cell = 8
    bake_hp.masking_mode = "weight"
    bake_hp.weight_thresh = 0.001
    bake_hp.embedding_index = 0
    bake_hp.camera_params = [32, 32, 28, 28, 16, 16]
    co.main(bake_hp)

    tree = N3Tree.load(tmp_path / "tree.npz")
    assert tree.data_format == "RGBA" and tree.data_dim == 4
    assert tree.n_internal > 1  # something was refined
    leaves = tree.leaf_indices()
    data = tree.get_leaf_data(leaves)
    assert np.isfinite(data).all()
    assert data[:, 3].max() > 0  # some density baked in
    assert (data[:, :3] >= 0).all() and (data[:, :3] <= 1).all()


def test_grid_weight_world_units_with_nonunit_radius():
    """Per-sample deltas must be WORLD lengths: with a uniform sigma field
    and a tree radius R != 1, the entry-voxel weight along the central ray
    is alpha_0 = 1 - exp(-sigma * span_world / n_steps). A tree-arc-length
    confusion (the svox delta_scale applied to unnormalized dirs) would be
    off by 1/R here."""
    reso = 8
    n_steps = 64
    sigma_val = 0.7
    radius = 2.0  # world cube [-2, 2], invradius 0.25
    sigma = np.full((reso, reso, reso), sigma_val, np.float32)
    invradius = np.full(3, 0.5 / radius, np.float32)
    offset = np.full(3, 0.5, np.float32)

    c2w = look_at_drb(np.array([0.0, 0.0, -6.0]))
    weights = grid_weight_render_max(
        sigma, c2w[None], [9, 9, 40.0, 40.0, 4.5, 4.5],
        offset, invradius, reso, n_steps=n_steps,
    )
    span_world = 2 * radius  # central ray crosses the full cube
    expected_alpha0 = 1.0 - np.exp(-sigma_val * span_world / n_steps)
    got = weights.max()  # uniform field: the entry sample dominates
    np.testing.assert_allclose(got, expected_alpha0, rtol=0.15)


def test_create_octree_from_bg_training_checkpoint(tmp_path):
    """Checkpoints from runs WITH a background NeRF serialize bg params +
    bg opt state; the bake's load template must match that TrainState
    shape even though only the foreground weights are consumed."""
    from mega_nerf_tpu.runtime.runner import Runner
    from tests.synthetic import make_synthetic_dataset, tiny_train_hparams
    import scripts.create_octree as co

    ds = make_synthetic_dataset(tmp_path / "ds", n_train=2, n_val=1,
                                hw=(12, 12))
    hp = tiny_train_hparams(
        ds, tmp_path / "exp", train_iterations=10, ckpt_interval=10,
        ray_altitude_range=[-2.0, 2.0],
    )
    hp.bg_nerf = True
    Runner(hp).train()

    bake_hp = tiny_train_hparams(
        ds, tmp_path / "unused",
        ray_altitude_range=[-2.0, 2.0],
        ckpt_path=str(tmp_path / "exp" / "0" / "models" / "10.ckpt"),
    )
    bake_hp.bg_nerf = True
    bake_hp.dataset_path = str(ds)
    bake_hp.output = str(tmp_path / "tree.npz")
    bake_hp.alpha_thresh = 0.01
    bake_hp.scale_alpha_thresh = 0.01
    bake_hp.tree_branch_n = 2
    bake_hp.init_grid_depth = 3
    bake_hp.samples_per_cell = 4
    bake_hp.masking_mode = "sigma"
    bake_hp.weight_thresh = 0.001
    bake_hp.embedding_index = 0
    bake_hp.camera_params = [16, 16, 14, 14, 8, 8]
    co.main(bake_hp)
    assert (tmp_path / "tree.npz").exists()


def test_bake_cell_cull_gate():
    # The bake's probe culler is gated by --bake_cell_cull, not the
    # serving cull flag: the bake A/Bs measured cull-on slower at BOTH
    # K=8 (1.39x warm) and K=25 (cold) — PERF.md round 5 — so 'auto' is
    # off at every K and 'on' is the opt-in.
    from argparse import Namespace

    import scripts.create_octree as co
    from tests.test_mega_routing import tiny_mega_hparams
    from mega_nerf_tpu.models.factory import _make_bundle

    def bundle_of(k_side):
        b = _make_bundle(tiny_mega_hparams(k_side, "dense"), 1, 16, 3)
        return b, b.init(__import__("jax").random.key(0))

    b8, p8 = bundle_of(2)  # 4 cells
    b9, p9 = bundle_of(3)  # 9 cells
    auto = Namespace(bake_cell_cull="auto", cell_cull=True)
    assert co._make_point_culler(auto, b8, p8) is None
    assert co._make_point_culler(auto, b9, p9) is None
    off = Namespace(bake_cell_cull="off", cell_cull=True)
    assert co._make_point_culler(off, b9, p9) is None
    on = Namespace(bake_cell_cull="on", cell_cull=True)
    assert co._make_point_culler(on, b8, p8) is not None
    assert co._make_point_culler(on, b9, p9) is not None
