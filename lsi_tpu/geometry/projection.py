"""Projective camera geometry: pixel grids, (un)projection, disparity<->depth.

Capability parity with the reference's ``lsi/geometry/projection.py``
(pixel-coordinate meshgrids, K / K^-1 application, unprojection of
pixel+disparity to camera-frame 3D, rigid transform, forward projection to
target pixel coordinates + transformed depth). Pure ``jax.numpy``; all
functions are shape-polymorphic over leading batch dims and jit-safe.

Conventions (docs/parity.md): pixel centers at integer coordinates,
``coords[..., 0] = x`` (column), ``coords[..., 1] = y`` (row); depth = z > 0
in front of the camera; disparity = 1 / depth.
"""

from __future__ import annotations

import jax.numpy as jnp

# Guard for depth==0 / disparity==0 inversions; render code masks z<=MIN_DEPTH.
MIN_DEPTH = 1e-6


def pixel_grid(height: int, width: int) -> jnp.ndarray:
    """(H, W, 2) float32 grid of pixel-center coordinates [x, y]."""
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    x, y = jnp.meshgrid(xs, ys)  # both (H, W)
    return jnp.stack([x, y], axis=-1)


def intrinsics_matrix(fx, fy, cx, cy) -> jnp.ndarray:
    """Assemble (..., 3, 3) K from (broadcastable) focal lengths / centers."""
    fx, fy, cx, cy = (jnp.asarray(v, jnp.float32) for v in (fx, fy, cx, cy))
    batch = jnp.broadcast_shapes(fx.shape, fy.shape, cx.shape, cy.shape)
    fx, fy, cx, cy = (jnp.broadcast_to(v, batch) for v in (fx, fy, cx, cy))
    zero = jnp.zeros(batch, jnp.float32)
    one = jnp.ones(batch, jnp.float32)
    rows = [
        jnp.stack([fx, zero, cx], -1),
        jnp.stack([zero, fy, cy], -1),
        jnp.stack([zero, zero, one], -1),
    ]
    return jnp.stack(rows, -2)


def scale_intrinsics(K: jnp.ndarray, scale_x: float, scale_y: float) -> jnp.ndarray:
    """Rescale K for an image resized by (scale_x, scale_y).

    With the pixel-center-at-integer convention, resizing maps
    x -> x * s + (s - 1) / 2 (align-corners=False), so both the focal and
    the principal point transform affinely.
    """
    sx = jnp.asarray(scale_x, jnp.float32)
    sy = jnp.asarray(scale_y, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    fx = K[..., 0, 0] * sx
    fy = K[..., 1, 1] * sy
    cx = K[..., 0, 2] * sx + (sx - 1.0) / 2.0
    cy = K[..., 1, 2] * sy + (sy - 1.0) / 2.0
    return intrinsics_matrix(fx, fy, cx, cy)


def invert_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form K^-1 for an axis-aligned pinhole K (no skew)."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    return intrinsics_matrix(1.0 / fx, 1.0 / fy, -cx / fx, -cy / fy)


def disparity_to_depth(disparity: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.maximum(disparity, MIN_DEPTH)


def depth_to_disparity(depth: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.maximum(depth, MIN_DEPTH)


def unproject(coords: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords + depth -> camera-frame 3D points.

    Args:
      coords: (B, ..., 2) pixel [x, y].
      depth:  (B, ..., 1) or (B, ...,) positive z.
      K:      (B, 3, 3) intrinsics.
    Returns:
      (B, ..., 3) points ``X = z * K^-1 [x, y, 1]``.
    """
    if depth.shape == coords.shape[:-1]:
        depth = depth[..., None]
    k_inv = invert_intrinsics(K)
    # Broadcast K^-1 over the spatial dims: rays = K^-1 @ [x, y, 1].
    ones = jnp.ones_like(coords[..., :1])
    homo = jnp.concatenate([coords, ones], axis=-1)  # (B, ..., 3)
    extra = homo.ndim - k_inv.ndim + 1
    k_inv_b = k_inv.reshape(k_inv.shape[:1] + (1,) * extra + (3, 3))
    rays = jnp.einsum("...ij,...j->...i", k_inv_b, homo, precision="highest")
    return rays * depth


def transform_points(pose: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (B, 4, 4) rigid transform to (B, ..., 3) points."""
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    extra = points.ndim - rot.ndim + 1
    rot_b = rot.reshape(rot.shape[:1] + (1,) * extra + (3, 3))
    t_b = t.reshape(t.shape[:1] + (1,) * extra + (3,))
    return jnp.einsum("...ij,...j->...i", rot_b, points, precision="highest") + t_b


def project(points: jnp.ndarray, K: jnp.ndarray):
    """Camera-frame 3D points -> (pixel coords, depth).

    Returns:
      coords: (B, ..., 2) pixel [x, y] (valid only where depth > 0).
      depth:  (B, ..., 1) z in the camera frame (signed; callers mask z<=0).
    """
    extra = points.ndim - K.ndim + 1
    k_b = K.reshape(K.shape[:1] + (1,) * extra + (3, 3))
    uvw = jnp.einsum("...ij,...j->...i", k_b, points, precision="highest")
    z = points[..., 2:3]
    coords = uvw[..., :2] / jnp.maximum(uvw[..., 2:3], MIN_DEPTH)
    return coords, z


def forward_project(disparity: jnp.ndarray, K_src: jnp.ndarray,
                    K_trg: jnp.ndarray, pose_src2trg: jnp.ndarray,
                    row_offset: int = 0):
    """Per-pixel source->target correspondence for a disparity map.

    The fused pipeline at the heart of both inverse warping and forward
    splatting: pixel grid -> unproject at 1/disparity -> rigid transform ->
    project with target intrinsics.

    TPU-first formulation: the whole chain collapses algebraically to
        uvw = A @ [x, y, 1] + b * d,   A = K_t R K_s^-1,  b = K_t t
    (homogeneous coords scaled by 1/z), so per pixel it is 9 fused
    multiply-adds on broadcast rows of A — no per-pixel matmuls, no 5-D
    broadcast materialization, one XLA fusion. The tiny 3x3 algebra for A
    runs once per batch element at highest precision.

    Args:
      disparity: (B, H, W, 1) source-frame inverse depth.
      K_src, K_trg: (B, 3, 3).
      pose_src2trg: (B, 4, 4).
      row_offset: global row index of this tensor's first row — spatial
        H-sharded callers pass their shard offset so the pixel grid (and
        the produced target coordinates) stay in GLOBAL image coordinates.
    Returns:
      trg_coords: (B, H, W, 2) target pixel [x, y].
      trg_disparity: (B, H, W, 1) inverse depth in the target frame.
      valid: (B, H, W, 1) float32 mask — 1 where the transformed point is in
        front of the target camera.
    """
    _, h, w, _ = disparity.shape
    d = disparity[..., 0]  # (B, H, W)

    rot = pose_src2trg[..., :3, :3]
    t = pose_src2trg[..., :3, 3]
    A = jnp.einsum("bij,bjk,bkl->bil", K_trg, rot, invert_intrinsics(K_src),
                   precision="highest")  # (B, 3, 3)
    bvec = jnp.einsum("bij,bj->bi", K_trg, t, precision="highest")  # (B, 3)

    x = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # (1, 1, W)
    y = (jnp.arange(h, dtype=jnp.float32)
         + row_offset)[None, :, None]                    # (1, H, 1)

    def row(i):
        a = A[:, i, :]  # (B, 3)
        return (a[:, 0, None, None] * x + a[:, 1, None, None] * y
                + a[:, 2, None, None] + bvec[:, i, None, None] * d)

    u = row(0)
    v = row(1)
    zscale = row(2)  # = z_trg * d  (z_trg / z_src)

    denom = jnp.where(jnp.abs(zscale) > MIN_DEPTH, zscale,
                      jnp.full_like(zscale, MIN_DEPTH))
    trg_coords = jnp.stack([u / denom, v / denom], axis=-1)
    valid = (zscale > MIN_DEPTH).astype(jnp.float32)
    # z_trg = zscale / d  =>  1/z_trg = d / zscale.
    trg_disparity = (d / denom) * valid
    return trg_coords, trg_disparity[..., None], valid[..., None]
