import jax.numpy as jnp
import numpy as np
import pytest

from mega_nerf_tpu.ops import depth2pts_outside, intersect_sphere
from mega_nerf_tpu.ops.geometry import validate_cameras_in_sphere


def test_intersect_sphere_from_center():
    o = jnp.zeros((4, 3))
    d = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0.6, 0.8, 0.0]])
    t = intersect_sphere(o, d)
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-6)


def test_intersect_sphere_offset_origin():
    # From (0.5, 0, 0) along +x: exit at x=1 -> t = 0.5.
    o = jnp.array([[0.5, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(intersect_sphere(o, d)[0]), 0.5, atol=1e-6)
    # Along -x: exit at x=-1 -> t = 1.5.
    np.testing.assert_allclose(float(intersect_sphere(o, -d)[0]), 1.5, atol=1e-6)


def test_intersect_ellipsoid_normalization():
    center = jnp.array([1.0, 2.0, 3.0])
    radius = jnp.array([2.0, 4.0, 6.0])
    o = center[None, :]
    d = jnp.array([[1.0, 0.0, 0.0]])
    # Normalized: origin at 0, direction (0.5,0,0) -> t such that |t*0.5| = 1
    # -> t=2 in original units (the ellipsoid x-semiaxis).
    np.testing.assert_allclose(
        float(intersect_sphere(o, d, center, radius)[0]), 2.0, atol=1e-5
    )


def test_validate_cameras_raises_outside():
    o = jnp.array([[1.5, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    with pytest.raises(ValueError):
        validate_cameras_in_sphere(o, d)


def test_depth2pts_outside_on_sphere_surface():
    # depth=1 (sphere surface): the rotated point equals the ray's sphere exit,
    # and depth_real ~ distance to that exit point.
    o = jnp.zeros((2, 1, 3))
    d = jnp.array([[[1.0, 0.0, 0.0]], [[0.0, 0.6, 0.8]]])
    depth = jnp.full((2, 1), 1.0)
    pts, depth_real = depth2pts_outside(o, d, depth)
    assert pts.shape == (2, 1, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pts[..., :3]), axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(pts[0, 0, :3]), [1.0, 0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth_real), 1.0, atol=1e-4)


def test_depth2pts_outside_depth_decreases_with_inverse_depth():
    o = jnp.array([[[0.1, 0.2, 0.0]]])
    d = jnp.array([[[0.0, 0.0, 1.0]]])
    depth = jnp.array([[0.9, 0.5, 0.25, 0.1]])
    pts, depth_real = depth2pts_outside(o, d, depth)
    dr = np.asarray(depth_real[0])
    assert (np.diff(dr) > 0).all()  # smaller inverse depth = farther away
    # All mapped points stay on the unit sphere.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pts[0, :, :3]), axis=-1), 1.0, atol=1e-5
    )


def test_depth2pts_outside_include_xyz_real_shapes():
    o = jnp.array([[[0.1, 0.2, 0.0]]])
    d = jnp.array([[[0.0, 0.0, 1.0]]])
    depth = jnp.array([[0.9, 0.5]])
    pts, _ = depth2pts_outside(o, d, depth, include_xyz_real=True, cluster_2d=False)
    assert pts.shape == (1, 2, 7)
    pts2, _ = depth2pts_outside(o, d, depth, include_xyz_real=True, cluster_2d=True)
    assert pts2.shape == (1, 2, 7)
