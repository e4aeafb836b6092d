import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.ops import get_ray_directions, get_rays


def test_ray_directions_unit_norm_and_center():
    dirs = get_ray_directions(8, 6, fx=4.0, fy=4.0, cx=4.0, cy=3.0, center_pixels=False)
    assert dirs.shape == (6, 8, 3)
    norms = jnp.linalg.norm(dirs, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-6)
    # The principal-point pixel looks straight down the camera's -z axis.
    np.testing.assert_allclose(np.asarray(dirs[3, 4]), [0.0, 0.0, -1.0], atol=1e-6)


def test_ray_directions_center_pixels_shifts_half():
    d0 = get_ray_directions(4, 4, 2.0, 2.0, 2.0, 2.0, center_pixels=False)
    d1 = get_ray_directions(4, 4, 2.0, 2.0, 2.0, 2.0, center_pixels=True)
    # With centering, pixel (2,2) no longer points exactly along -z.
    assert not np.allclose(np.asarray(d0[2, 2]), np.asarray(d1[2, 2]))
    v = np.asarray(d1[2, 2])
    np.testing.assert_allclose(v[:2] / -v[2], [0.25, -0.25], atol=1e-6)


def test_get_rays_identity_pose():
    dirs = get_ray_directions(4, 4, 2.0, 2.0, 2.0, 2.0, center_pixels=True)
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[1.0], [2.0], [3.0]])], axis=1)
    rays = get_rays(dirs, c2w, near=0.5, far=10.0)
    assert rays.shape == (4, 4, 8)
    np.testing.assert_allclose(
        np.asarray(rays[..., 0:3]),
        np.broadcast_to([1.0, 2.0, 3.0], (4, 4, 3)),
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(rays[..., 3:6]), np.asarray(dirs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays[..., 6]), 0.5)
    np.testing.assert_allclose(np.asarray(rays[..., 7]), 10.0)


def test_get_rays_rotated_pose_unit_dirs():
    dirs = get_ray_directions(5, 3, 2.5, 2.5, 2.5, 1.5, center_pixels=True)
    theta = 0.7
    rot = jnp.array(
        [
            [np.cos(theta), -np.sin(theta), 0.0],
            [np.sin(theta), np.cos(theta), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    c2w = jnp.concatenate([rot, jnp.zeros((3, 1))], axis=1)
    rays = get_rays(dirs, c2w, 1.0, 5.0)
    norms = np.linalg.norm(np.asarray(rays[..., 3:6]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_altitude_truncation_far_plane():
    # DRB: x points down. A ray starting at x=0 descending with d_x=0.5
    # hits the ground plane at altitude x=1 after t = (1-0)/0.5 = 2.
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.5, jnp.sqrt(0.75), 0.0]])
    dirs = d  # already unit-ish; get_rays renormalizes
    c2w = jnp.concatenate([jnp.eye(3), o.T], axis=1)
    # identity rotation: world dir == camera dir
    rays = get_rays(dirs, c2w, near=0.1, far=100.0, ray_altitude_range=[-1.0, 1.0])
    np.testing.assert_allclose(float(rays[0, 7]), 2.0, atol=1e-5)
    # Near stays at its default: the ray starts below the ceiling (-1) plane?
    # o_x=0 > -1 so not eligible -> near unchanged.
    np.testing.assert_allclose(float(rays[0, 6]), 0.1, atol=1e-6)


def test_altitude_truncation_near_plane():
    # Ray starts above the ceiling plane (o_x=-2 < -1) and descends:
    # near is pushed to the ceiling intersection t = (-1 - -2)/d_x.
    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[0.8, 0.6, 0.0]])
    c2w = jnp.concatenate([jnp.eye(3), o.T], axis=1)
    rays = get_rays(d, c2w, near=0.1, far=100.0, ray_altitude_range=[-1.0, 1.0])
    np.testing.assert_allclose(float(rays[0, 6]), 1.0 / 0.8, atol=1e-5)
    np.testing.assert_allclose(float(rays[0, 7]), 3.0 / 0.8, atol=1e-5)


def test_altitude_truncation_ascending_ray_unbounded():
    # An ascending ray (d_x < 0) is never truncated.
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[-0.5, jnp.sqrt(0.75), 0.0]])
    c2w = jnp.concatenate([jnp.eye(3), o.T], axis=1)
    rays = get_rays(d, c2w, near=0.1, far=100.0, ray_altitude_range=[-1.0, 1.0])
    np.testing.assert_allclose(float(rays[0, 7]), 100.0, atol=1e-5)


def test_far_never_below_near():
    # Degenerate geometry must still satisfy far >= near.
    o = jnp.array([[0.9, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    c2w = jnp.concatenate([jnp.eye(3), o.T], axis=1)
    rays = get_rays(d, c2w, near=1.0, far=100.0, ray_altitude_range=[-1.0, 1.0])
    assert float(rays[0, 7]) >= float(rays[0, 6])
