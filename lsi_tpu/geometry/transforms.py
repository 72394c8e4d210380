"""SE(3) pose utilities.

Conventions (normative for the whole framework — see docs/parity.md):
  * Camera frame: x right, y down, z forward (into the scene). Depth == z.
  * A pose ``T`` is a (..., 4, 4) float32 homogeneous matrix mapping points
    from the *source* camera frame to the *target* camera frame:
    ``X_t = R @ X_s + t``.
  * Intrinsics ``K`` are (..., 3, 3): ``[u, v, 1]^T ~ K @ [X/Z, Y/Z, 1]^T``.

Capability parity: the rigid-transform helpers of the reference's
``lsi/geometry/projection.py`` (empty mount; path per canonical layout).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_pose(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) pose from (..., 3, 3) R and (..., 3) t."""
    rotation = jnp.asarray(rotation, jnp.float32)
    translation = jnp.asarray(translation, jnp.float32)
    batch = jnp.broadcast_shapes(rotation.shape[:-2], translation.shape[:-1])
    rotation = jnp.broadcast_to(rotation, batch + (3, 3))
    translation = jnp.broadcast_to(translation, batch + (3,))
    top = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), jnp.float32).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def identity_pose(batch_shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), tuple(batch_shape) + (4, 4))


def translation_pose(translation) -> jnp.ndarray:
    """Pure-translation pose; e.g. a rectified stereo baseline is
    ``translation_pose([-baseline, 0, 0])`` (left -> right camera)."""
    translation = jnp.asarray(translation, jnp.float32)
    batch = translation.shape[:-1]
    return make_pose(jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), batch + (3, 3)),
                     translation)


def invert_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse: (R, t) -> (R^T, -R^T t)."""
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    rot_inv = jnp.swapaxes(rot, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", rot_inv, t, precision="highest")
    return make_pose(rot_inv, t_inv)


def compose_poses(pose_ab: jnp.ndarray, pose_bc: jnp.ndarray) -> jnp.ndarray:
    """Pose mapping frame a -> c given a -> b and b -> c: ``T_bc @ T_ab``."""
    return jnp.einsum("...ij,...jk->...ik", pose_bc, pose_ab, precision="highest")


def relative_pose(world_from_a: jnp.ndarray, world_from_b: jnp.ndarray) -> jnp.ndarray:
    """T mapping a-frame points to b-frame given both camera-to-world poses."""
    return compose_poses(world_from_a, invert_pose(world_from_b))


def euler_to_rotation(angles: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) XYZ-intrinsic Euler angles (radians) -> (..., 3, 3) R.

    R = Rz @ Ry @ Rx (x applied first)."""
    angles = jnp.asarray(angles, jnp.float32)
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    rx = jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, cx, -sx], -1),
        jnp.stack([zero, sx, cx], -1),
    ], -2)
    ry = jnp.stack([
        jnp.stack([cy, zero, sy], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-sy, zero, cy], -1),
    ], -2)
    rz = jnp.stack([
        jnp.stack([cz, -sz, zero], -1),
        jnp.stack([sz, cz, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    return jnp.einsum("...ij,...jk,...kl->...il", rz, ry, rx, precision="highest")


def pose_from_euler(angles, translation) -> jnp.ndarray:
    return make_pose(euler_to_rotation(jnp.asarray(angles, jnp.float32)),
                     jnp.asarray(translation, jnp.float32))


def camera_trajectory(num_views: int,
                      max_translation=(0.15, 0.0, 0.0),
                      max_rotation=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """(num_views, 4, 4) smooth camera sweep for video synthesis.

    Sinusoidal sweep in [-1, 1] of the given max translation (meters) and
    rotation (radians) — the "render one LDI to 60 novel views" eval path
    (BASELINE.json config 5).
    """
    phase = jnp.linspace(0.0, 2.0 * jnp.pi, num_views, dtype=jnp.float32)
    alpha = jnp.sin(phase)[:, None]
    trans = alpha * jnp.asarray(max_translation, jnp.float32)[None, :]
    rots = alpha * jnp.asarray(max_rotation, jnp.float32)[None, :]
    return pose_from_euler(rots, trans)
