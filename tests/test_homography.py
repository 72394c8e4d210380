"""Plane-induced homography warping tests."""

import numpy as np
import jax.numpy as jnp

from lsi_tpu.geometry import homography, transforms


def make_K(fx=50.0, fy=50.0, cx=15.5, cy=11.5):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)


def test_identity_homography_identity_warp(rng):
    img = jnp.asarray(rng.uniform(size=(1, 8, 10, 3)), jnp.float32)
    h = jnp.eye(3, dtype=jnp.float32)[None]
    out, valid = homography.homography_warp(img, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(valid), 1.0)


def test_identity_pose_plane_homography_is_identity():
    K = jnp.asarray(make_K()[None])
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    d = jnp.asarray([5.0], jnp.float32)
    h = homography.plane_homography(K, K, transforms.identity_pose((1,)), n, d)
    np.testing.assert_allclose(np.asarray(h)[0], np.eye(3), atol=1e-5)


def test_plane_homography_matches_pointwise_projection(rng):
    """For points ON the plane, the homography must equal full projection."""
    from lsi_tpu.geometry import projection
    K = make_K()
    pose = np.asarray(transforms.pose_from_euler(
        np.array([0.03, -0.01, 0.02], np.float32),
        np.array([0.2, -0.1, 0.1], np.float32)))
    depth = 4.0  # fronto-parallel plane z = 4 in source frame

    h_t2s = homography.plane_homography(
        jnp.asarray(K)[None], jnp.asarray(K)[None], jnp.asarray(pose)[None],
        jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        jnp.asarray([depth], jnp.float32))

    # Pick source pixels, push them through full geometry to target pixels,
    # then check H maps those target pixels back to the source pixels.
    src_px = np.array([[5.0, 3.0], [20.0, 14.0], [11.0, 8.0]], np.float32)
    for x, y in src_px:
        p_cam = depth * (np.linalg.inv(K) @ np.array([x, y, 1.0]))
        p_t = pose[:3, :3] @ p_cam + pose[:3, 3]
        uvw = K @ p_t
        trg = uvw[:2] / uvw[2]
        mapped = np.asarray(h_t2s)[0] @ np.array([trg[0], trg[1], 1.0])
        back = mapped[:2] / mapped[2]
        np.testing.assert_allclose(back, [x, y], atol=1e-3)


def test_plane_sweep_volume_shapes(rng):
    img = jnp.asarray(rng.uniform(size=(2, 8, 10, 3)), jnp.float32)
    K = jnp.asarray(np.tile(make_K()[None], (2, 1, 1)))
    pose = transforms.identity_pose((2,))
    depths = jnp.asarray([1.0, 2.0, 4.0, 8.0], jnp.float32)
    vol, valid = homography.plane_sweep_volume(img, K, K, pose, depths)
    assert vol.shape == (2, 4, 8, 10, 3)
    assert valid.shape == (2, 4, 8, 10, 1)
    # identity pose: every plane warp is identity
    for i in range(4):
        np.testing.assert_allclose(np.asarray(vol)[:, i], np.asarray(img),
                                   atol=1e-4)
