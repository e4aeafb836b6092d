"""torch interop + containers: the interchange surface with the reference
ecosystem (checkpoints, merged containers, TorchScript viewer format)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mega_nerf_tpu.models import make_nerf
from mega_nerf_tpu.models.container import (
    ContainerData,
    container_to_bundles,
    load_container,
    save_native_container,
    save_torchscript_container,
)
from mega_nerf_tpu.models.torch_interop import (
    appearance_count_from_state,
    flax_params_from_torch_state,
    strip_module_prefix,
    torch_state_from_flax_params,
)
from tests.test_models import tiny_hparams


def _bundle_and_params(hp_kw=None, appearance_count=5):
    hp = tiny_hparams(**(hp_kw or {}))
    bundle = make_nerf(hp, appearance_count)
    params = bundle.init(jax.random.key(0))
    return hp, bundle, params


def test_flax_torch_roundtrip_identity():
    _, bundle, params = _bundle_and_params({"appearance_dim": 4})
    state = torch_state_from_flax_params(bundle.config, params)
    back = flax_params_from_torch_state(bundle.config, state)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(back), key=str),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_state_names_match_reference_contract():
    _, bundle, params = _bundle_and_params({"appearance_dim": 4})
    state = torch_state_from_flax_params(bundle.config, params)
    names = set(state)
    assert "xyz_encodings.0.0.weight" in names
    assert "sigma.weight" in names and "sigma.bias" in names
    assert "xyz_encoding_final.weight" in names
    assert "dir_a_encoding.0.weight" in names
    assert "rgb.weight" in names
    assert "embedding_a.weight" in names
    # torch Linear convention: weight is (out, in).
    assert state["sigma.weight"].shape == (1, bundle.config.layer_dim)
    assert appearance_count_from_state(state) == 5


def test_torch_mirror_matches_flax_forward():
    """TorchNeRF(packed input) == Flax NeRF(unpacked) — validates both the
    name mapping and the packed-input contract semantics."""
    import torch

    from mega_nerf_tpu.models.torch_nerf import torch_nerf_from_state

    _, bundle, params = _bundle_and_params({"appearance_dim": 4})
    state = torch_state_from_flax_params(bundle.config, params)
    mirror = torch_nerf_from_state(bundle.config, state)

    n = 16
    xyz = np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)
    dirs = np.random.default_rng(1).normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    idx = np.random.default_rng(2).integers(0, 5, size=n)

    flax_out = np.asarray(
        bundle.apply(
            params, "fine", jnp.asarray(xyz), jnp.asarray(dirs),
            jnp.asarray(idx, jnp.int32),
        )
    )
    packed = np.concatenate([xyz, dirs, idx[:, None].astype(np.float32)], -1)
    with torch.no_grad():
        torch_out = mirror(torch.from_numpy(packed)).numpy()
    np.testing.assert_allclose(flax_out, torch_out, atol=2e-5)


def test_strip_module_prefix():
    s = {"module.a.weight": 1, "b.bias": 2}
    assert strip_module_prefix(s) == {"a.weight": 1, "b.bias": 2}


def _make_container_data(k=2, hp_kw=None):
    hp, bundle, _ = _bundle_and_params(hp_kw)
    states = []
    for i in range(k):
        p = bundle.init(jax.random.key(i))
        states.append(torch_state_from_flax_params(bundle.config, p))
    return hp, ContainerData(
        centroids=np.array([[0, 0, 0], [0, 5, 0]], np.float32)[:k],
        grid_dim=(k, 1),
        min_position=np.zeros(3, np.float32),
        max_position=np.ones(3, np.float32),
        need_viewdir=True,
        need_appearance_embedding=False,
        cluster_2d=False,
        fg_states=states,
        bg_states=[],
    )


def test_native_container_roundtrip(tmp_path):
    hp, data = _make_container_data()
    save_native_container(tmp_path / "c.pt", data)
    back = load_container(tmp_path / "c.pt")
    assert back.grid_dim == (2, 1)
    np.testing.assert_array_equal(back.centroids, data.centroids)
    assert len(back.fg_states) == 2 and not back.bg_states
    np.testing.assert_array_equal(
        back.fg_states[0]["sigma.weight"], data.fg_states[0]["sigma.weight"]
    )

    fg, bg = container_to_bundles(back, hp)
    assert bg is None and fg.is_mega
    out = fg.apply(fg.pretrained_params, "fine", jnp.ones((3, 3)), jnp.ones((3, 3)))
    assert out.shape == (3, 4)


def test_torchscript_container_roundtrip(tmp_path):
    import torch

    hp, data = _make_container_data()
    save_torchscript_container(tmp_path / "c.ts", data, hp)
    loaded = torch.jit.load(str(tmp_path / "c.ts"))
    # Viewer-style usage: call a submodule on a packed ones input.
    out = loaded.sub_module_0(torch.ones(1, 6))
    assert out.shape == (1, 4)

    # And our loader round-trips it back into bundles.
    back = load_container(tmp_path / "c.ts")
    assert len(back.fg_states) == 2
    fg, _ = container_to_bundles(back, hp)
    flax_out = np.asarray(
        fg.apply(
            fg.pretrained_params, "fine",
            jnp.ones((1, 3)), jnp.ones((1, 3)) / np.sqrt(3.0),
        )
    )
    # Hard assignment at (1,1,1): nearest centroid is 0 -> compare against
    # the TorchScript submodule directly.
    with torch.no_grad():
        packed = torch.cat(
            [torch.ones(1, 3), torch.ones(1, 3) / np.sqrt(3.0)], -1
        )
        ts_out = loaded.sub_module_0(packed).numpy()
    np.testing.assert_allclose(flax_out, ts_out, atol=2e-5)
