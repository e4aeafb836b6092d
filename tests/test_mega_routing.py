"""Sorted-gather mixture routing vs the dense blend.

`mega_apply_routed` must reproduce `mega_apply` exactly (same nonzero
routing weights, same blend) while evaluating each point only under its
winning submodules — the large-K query-time plan for the reference's
25-submodule models (`/root/reference/README.md:46`,
`/root/reference/mega_nerf/models/mega_nerf.py:19-49`).
"""

from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mega_nerf_tpu.models import (
    cluster_weights,
    mega_apply,
    mega_apply_routed,
)
from mega_nerf_tpu.models.factory import _make_bundle


def grid_centroids(gx: int, gy: int, spacing: float = 2.0) -> jnp.ndarray:
    ys, zs = np.meshgrid(np.arange(gx), np.arange(gy), indexing="ij")
    c = np.stack(
        [np.zeros(gx * gy), ys.reshape(-1) * spacing, zs.reshape(-1) * spacing],
        axis=1,
    )
    return jnp.asarray(c, jnp.float32)


def toy_params(key, k: int, d: int = 3, c: int = 4):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (k, d, c)),
        "b": jax.random.normal(kb, (k, c)),
    }


def toy_apply(p, xyz, dirs, image_indices, sigma_noise, sigma_only):
    out = xyz @ p["w"] + p["b"]
    if dirs is not None:
        out = out + jnp.sum(dirs, axis=-1, keepdims=True)
    if image_indices is not None:
        out = out + 0.01 * image_indices.astype(out.dtype)[:, None]
    if sigma_noise is not None:
        out = out + sigma_noise.reshape(out.shape[0], -1)[:, :1]
    return out


@pytest.mark.parametrize("margin,max_experts", [(1.0, 1), (1.15, 4)])
def test_routed_matches_dense_k25(margin, max_experts):
    # cluster_dim_start=1 (the reference's cluster_2d) keeps the
    # within-margin set ≤ 4 on a regular grid, so routed == dense exactly.
    k = 25
    centroids = grid_centroids(5, 5)
    params = toy_params(jax.random.key(0), k)
    pts = jax.random.uniform(
        jax.random.key(1), (777, 3), minval=-1.0, maxval=9.0
    )
    w = cluster_weights(pts, centroids, margin, cluster_dim_start=1)
    dense = mega_apply(toy_apply, params, w, pts)
    routed = mega_apply_routed(
        toy_apply, params, w, pts, max_experts=max_experts,
        block=64, blocks_per_step=4,
    )
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(dense), atol=1e-5
    )


def test_routed_truncation_is_renormalized_topm():
    # 3D distances high above a 2D centroid grid put MANY cells within the
    # margin (>max_experts nonzero weights). The routed result must equal a
    # dense blend over the renormalized top-M weights — truncated, never
    # dropped mass.
    k = 25
    m = 4
    centroids = grid_centroids(5, 5)
    params = toy_params(jax.random.key(7), k)
    pts = jax.random.uniform(
        jax.random.key(8), (311, 3), minval=-1.0, maxval=9.0
    )
    pts = pts.at[:, 0].set(30.0)  # altitude >> grid extent
    w = cluster_weights(pts, centroids, 1.15)
    assert int(jnp.max(jnp.sum(w > 0, axis=-1))) > m  # premise: truncation
    topw, topk = jax.lax.top_k(w, m)
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    w_full = jnp.zeros_like(w)
    for j in range(m):
        w_full = w_full.at[jnp.arange(w.shape[0]), topk[:, j]].add(topw[:, j])
    dense_trunc = mega_apply(toy_apply, params, w_full, pts)
    routed = mega_apply_routed(
        toy_apply, params, w, pts, max_experts=m, block=64, blocks_per_step=4
    )
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(dense_trunc), atol=1e-5
    )


def test_routed_skewed_points_and_odd_sizes():
    # Every point lands in ONE cell (maximum bucket skew) and N is neither
    # a block nor a step multiple — exercises segment padding, the dead
    # tail, and empty buckets.
    k = 25
    centroids = grid_centroids(5, 5)
    params = toy_params(jax.random.key(2), k)
    pts = (
        jax.random.normal(jax.random.key(3), (37, 3)) * 0.05
        + jnp.array([0.0, 4.0, 6.0])
    )
    w = cluster_weights(pts, centroids, 1.0)
    dense = mega_apply(toy_apply, params, w, pts)
    routed = mega_apply_routed(
        toy_apply, params, w, pts, max_experts=1, block=8, blocks_per_step=2
    )
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(dense), atol=1e-5
    )


def test_routed_with_optional_inputs_and_jit():
    k = 9
    centroids = grid_centroids(3, 3)
    params = toy_params(jax.random.key(4), k)
    n = 130
    keys = jax.random.split(jax.random.key(5), 3)
    pts = jax.random.uniform(keys[0], (n, 3), minval=-1.0, maxval=5.0)
    dirs = jax.random.normal(keys[1], (n, 3))
    idx = jax.random.randint(keys[2], (n,), 0, 7)
    noise = jax.random.uniform(jax.random.key(6), (n, 1))
    w = cluster_weights(pts, centroids, 1.15, cluster_dim_start=1)
    dense = mega_apply(toy_apply, params, w, pts, dirs, idx, noise)
    routed = jax.jit(
        lambda *a: mega_apply_routed(
            toy_apply, *a, max_experts=4, block=32, blocks_per_step=2
        )
    )(params, w, pts, dirs, idx, noise)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(dense), atol=1e-5
    )


def tiny_mega_hparams(k_side: int, routing: str) -> Namespace:
    centroids = np.asarray(grid_centroids(k_side, k_side))
    return Namespace(
        pos_xyz_dim=4, pos_dir_dim=2, layers=3, skip_layers=[1],
        layer_dim=16, bg_layer_dim=16, appearance_dim=0,
        affine_appearance=False, use_cascade=False, sh_deg=None,
        shifted_softplus=True, compute_dtype="float32",
        mega_routing=routing, routing_max_experts=4,
        _mega_centroid_metadata={"centroids": centroids, "cluster_2d": False},
    )


def test_bundle_auto_routing_gate_and_cost():
    dense_b = _make_bundle(tiny_mega_hparams(2, "auto"), 1, 16, 3)
    k25_b = _make_bundle(tiny_mega_hparams(5, "auto"), 1, 16, 3)
    routed_b = _make_bundle(tiny_mega_hparams(6, "auto"), 1, 16, 3)
    assert not dense_b.use_routed  # K=4 stays dense under auto
    # On-chip measurement (PERF.md round 4): dense is MLP-throughput-bound
    # and beats routed through K=25, so every shipped config stays dense.
    assert not k25_b.use_routed
    assert routed_b.use_routed  # K=36 crosses the auto threshold
    assert dense_b.eval_submodule_cost == 4
    assert k25_b.eval_submodule_cost == 25
    # hard assignment (margin 1) -> one expert per point
    assert routed_b.eval_submodule_cost == 1
    forced = _make_bundle(tiny_mega_hparams(3, "dense"), 1, 16, 3)
    assert not forced.use_routed and forced.eval_submodule_cost == 9
    forced_r = _make_bundle(tiny_mega_hparams(3, "routed"), 1, 16, 3)
    assert forced_r.use_routed


def test_bundle_apply_routed_matches_dense_real_nerf():
    hp_d = tiny_mega_hparams(3, "dense")
    hp_r = tiny_mega_hparams(3, "routed")
    bd = _make_bundle(hp_d, 1, 16, 3)
    br = _make_bundle(hp_r, 1, 16, 3)
    params = bd.init(jax.random.key(0))
    n = 97
    pts = jax.random.uniform(
        jax.random.key(1), (n, 3), minval=-0.5, maxval=4.5
    )
    dirs = jax.random.normal(jax.random.key(2), (n, 3))
    dense = bd.apply(params, "coarse", pts, dirs)
    routed = br.apply(params, "coarse", pts, dirs)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(dense), atol=1e-5
    )
