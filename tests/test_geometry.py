"""Golden-value and oracle tests for the projective geometry core."""

import numpy as np
import jax.numpy as jnp

from lsi_tpu.geometry import projection, transforms
import reference_np


def make_K(fx=100.0, fy=110.0, cx=31.5, cy=23.5):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)


def test_pixel_grid_values():
    g = np.asarray(projection.pixel_grid(3, 4))
    assert g.shape == (3, 4, 2)
    assert g[0, 0].tolist() == [0.0, 0.0]
    assert g[2, 3].tolist() == [3.0, 2.0]  # [x, y]
    assert g[1, 2].tolist() == [2.0, 1.0]


def test_invert_intrinsics():
    K = make_K()
    K_inv = np.asarray(projection.invert_intrinsics(K[None]))[0]
    np.testing.assert_allclose(K_inv @ K, np.eye(3), atol=1e-5)


def test_unproject_project_roundtrip(rng):
    K = make_K()[None]
    coords = jnp.asarray(rng.uniform(0, 60, (1, 8, 9, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1.0, 50.0, (1, 8, 9, 1)), jnp.float32)
    pts = projection.unproject(coords, depth, jnp.asarray(K))
    coords2, depth2 = projection.project(pts, jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(coords2), np.asarray(coords),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth2), np.asarray(depth),
                               rtol=1e-5)


def test_identity_pose_identity_coords():
    K = jnp.asarray(make_K()[None])
    disp = jnp.full((1, 6, 7, 1), 0.25, jnp.float32)
    coords, tdisp, valid = projection.forward_project(
        disp, K, K, transforms.identity_pose((1,)))
    grid = projection.pixel_grid(6, 7)[None]
    np.testing.assert_allclose(np.asarray(coords), np.asarray(grid), atol=1e-3)
    np.testing.assert_allclose(np.asarray(tdisp), 0.25, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(valid), 1.0)


def test_pure_translation_stereo_disparity_shift():
    """Rectified stereo: shift in x = fx * baseline * disparity."""
    fx, baseline, d = 100.0, 0.5, 0.2
    K = jnp.asarray(make_K(fx=fx)[None])
    disp = jnp.full((1, 4, 5, 1), d, jnp.float32)
    T = transforms.translation_pose(np.array([[-baseline, 0.0, 0.0]],
                                             np.float32))
    coords, tdisp, _ = projection.forward_project(disp, K, K, T)
    grid = np.asarray(projection.pixel_grid(4, 5))[None]
    expected_shift = -fx * baseline * d
    np.testing.assert_allclose(np.asarray(coords[..., 0]),
                               grid[..., 0] + expected_shift, atol=1e-3)
    np.testing.assert_allclose(np.asarray(coords[..., 1]), grid[..., 1],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(tdisp), d, rtol=1e-5)


def test_forward_project_matches_np_oracle(rng):
    K_src = make_K()
    K_trg = make_K(fx=90.0, fy=95.0, cx=30.0, cy=20.0)
    T = np.asarray(transforms.pose_from_euler(
        np.array([0.02, -0.03, 0.01], np.float32),
        np.array([0.3, -0.1, 0.2], np.float32)))
    disp = rng.uniform(0.05, 0.8, (6, 8)).astype(np.float32)

    coords, tdisp, valid = projection.forward_project(
        jnp.asarray(disp)[None, ..., None], jnp.asarray(K_src)[None],
        jnp.asarray(K_trg)[None], jnp.asarray(T)[None])
    coords_np, tdisp_np, valid_np = reference_np.unproject_project_np(
        disp, K_src, K_trg, T)

    np.testing.assert_allclose(np.asarray(coords)[0], coords_np,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tdisp)[0, ..., 0], tdisp_np,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(valid)[0, ..., 0], valid_np)


def test_pose_inverse_compose():
    T = np.asarray(transforms.pose_from_euler(
        np.array([0.1, 0.2, -0.3], np.float32),
        np.array([1.0, -2.0, 0.5], np.float32)))
    T_inv = np.asarray(transforms.invert_pose(jnp.asarray(T)))
    np.testing.assert_allclose(T_inv @ T, np.eye(4), atol=1e-5)
    comp = np.asarray(transforms.compose_poses(jnp.asarray(T),
                                               transforms.invert_pose(
                                                   jnp.asarray(T))))
    np.testing.assert_allclose(comp, np.eye(4), atol=1e-5)


def test_scale_intrinsics_center_convention():
    K = jnp.asarray(make_K(cx=31.5, cy=23.5)[None])
    K2 = np.asarray(projection.scale_intrinsics(K, 0.5, 0.5))[0]
    # 64x48 -> 32x24: center (31.5, 23.5) -> (15.5, 11.5)
    assert abs(K2[0, 2] - 15.5) < 1e-5
    assert abs(K2[1, 2] - 11.5) < 1e-5
    assert abs(K2[0, 0] - 50.0) < 1e-5


def test_camera_trajectory_shape():
    traj = np.asarray(transforms.camera_trajectory(60, (0.2, 0, 0)))
    assert traj.shape == (60, 4, 4)
    np.testing.assert_allclose(traj[0], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(traj[:, 3, :], np.tile([0, 0, 0, 1], (60, 1)),
                               atol=1e-6)
