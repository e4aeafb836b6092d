"""svox `.npz` serialization contract for N3Tree.

No svox install or svox-written file exists in this zero-egress image, so
the golden is HAND-CONSTRUCTED from svox 0.2.32's save()/load() semantics
(sxyu/svox `svox/svox.py`: the exact key set, dtypes, and array layout its
`np.savez` emits after `shrink_to_fit`) — the same format the reference
ships to the Mega-NeRF-Dynamic viewer (`create_octree.py:291`). The tests
pin:

1. the key/dtype/shape contract of our `N3Tree.save` output;
2. field-for-field round-trip of the hand-constructed svox-style file
   through our load -> save;
3. the pointer semantics the format encodes (relative child pointers,
   parent_depth packing, world->tree transform).

Provenance caveat (also in PARITY.md): until a file written by a real svox
install is diffed, byte-level compatibility is asserted against this
documented reconstruction, not the package itself.
"""

from pathlib import Path

import numpy as np
import pytest

from mega_nerf_tpu.octree.n3tree import N3Tree

# The exact np.savez payload svox 0.2.32 writes (key -> (dtype, shape fn)).
SVOX_CONTRACT = {
    "data_dim": np.int64,
    "child": np.int32,
    "parent_depth": np.int32,
    "n_internal": np.int64,
    "n_free": np.int64,
    "invradius3": np.float32,
    "offset": np.float32,
    "depth_limit": np.int64,
    "geom_resize_fact": np.float64,
    "data": np.float16,
    "data_format": None,  # unicode string scalar
}


def hand_constructed_svox_npz(path: Path) -> dict:
    """A 2-node tree exactly as svox 0.2.32's save() would emit it:
    root + cell (0,1,1) refined once; N=2, data_dim=4, RGBA."""
    child = np.zeros((2, 2, 2, 2), np.int32)
    child[0, 0, 1, 1] = 1  # RELATIVE pointer: child_index - node_index
    parent_depth = np.zeros((2, 2), np.int32)
    # packed parent cell: node*N^3 + (ci*N + cj)*N + ck = 0*8 + 3; depth 1.
    parent_depth[1] = (3, 1)
    rng = np.random.default_rng(0)
    data = rng.uniform(0, 1, (2, 2, 2, 2, 4)).astype(np.float16)
    payload = {
        "data_dim": np.int64(4),
        "child": child,
        "parent_depth": parent_depth,
        "n_internal": np.int64(2),
        "n_free": np.int64(0),
        "invradius3": np.array([1.0, 1.0, 1.0], np.float32),
        "offset": np.array([0.0, 0.0, 0.0], np.float32),
        "depth_limit": np.int64(10),
        "geom_resize_fact": np.float64(1.0),
        "data": data,
        "data_format": "RGBA",
    }
    np.savez(path, **payload)
    return payload


def test_save_matches_svox_contract(tmp_path):
    tree = N3Tree(N=2, data_dim=4, depth_limit=10, radius=0.5,
                  center=(0.5, 0.5, 0.5), data_format="RGBA")
    tree.refine_at_points(np.array([[0.1, 0.6, 0.6]], np.float32))
    out = tmp_path / "tree.npz"
    tree.save(out)

    with np.load(out, allow_pickle=False) as z:
        assert set(z.files) == set(SVOX_CONTRACT), (
            sorted(z.files), sorted(SVOX_CONTRACT)
        )
        for key, dtype in SVOX_CONTRACT.items():
            if key == "data_format":
                assert z[key].dtype.kind == "U", z[key].dtype
                assert str(z[key]) == "RGBA"
            else:
                assert z[key].dtype == dtype, (key, z[key].dtype, dtype)
        n = int(z["n_internal"])
        assert z["child"].shape == (n, 2, 2, 2)
        assert z["parent_depth"].shape == (n, 2)
        assert z["data"].shape == (n, 2, 2, 2, 4)
        assert z["invradius3"].shape == (3,) and z["offset"].shape == (3,)


def test_hand_constructed_svox_file_roundtrips(tmp_path):
    golden_path = tmp_path / "svox_golden.npz"
    golden = hand_constructed_svox_npz(golden_path)

    tree = N3Tree.load(golden_path)
    assert tree.N == 2 and tree.data_dim == 4
    assert tree.n_internal == 2

    resaved = tmp_path / "resaved.npz"
    tree.save(resaved)
    with np.load(resaved, allow_pickle=False) as z:
        assert set(z.files) == set(golden)
        for key, val in golden.items():
            if key == "data_format":
                assert str(z[key]) == val
            else:
                got = z[key]
                assert got.dtype == np.asarray(val).dtype, (
                    key, got.dtype, np.asarray(val).dtype
                )
                np.testing.assert_array_equal(got, val, err_msg=key)


def test_pointer_semantics_match_svox(tmp_path):
    """The refined tree encodes exactly the golden's pointers: relative
    child offsets, parent_depth packing t = node*N^3 + ci*N^2 + cj*N + ck."""
    tree = N3Tree(N=2, data_dim=4, radius=0.5, center=(0.5, 0.5, 0.5))
    # Point in the root cell (ci,cj,ck) = (0,1,1): tree coords in [0,1]^3,
    # cell side 0.5 at depth 1 -> (0.1, 0.6, 0.6) lands in (0,1,1).
    tree.refine_at_points(np.array([[0.1, 0.6, 0.6]], np.float32))
    assert tree.n_internal == 2
    assert tree.child[0, 0, 1, 1] == 1
    assert (tree.child[0].sum() == 1), "exactly one refined cell"
    np.testing.assert_array_equal(tree.parent_depth[1], (3, 1))

    # world->tree transform: world == tree coords for radius .5 center .5.
    np.testing.assert_allclose(
        tree.world_to_tree(np.array([[0.25, 0.75, 0.5]], np.float32)),
        [[0.25, 0.75, 0.5]], atol=1e-6,
    )
