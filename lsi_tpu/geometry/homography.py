"""Plane-induced homography warping (layered-plane / plane-sweep baselines).

Capability parity with the reference's ``lsi/geometry/homography.py``: warp
images between views via the homography induced by a fronto-parallel (or
arbitrary) 3D plane, H = K_t (R - t n^T / d) K_s^-1 — the geometry behind the
layered-plane (MPI-style) baseline experiments.

Pure jax.numpy; differentiable in plane depth/normal and pose.
"""

from __future__ import annotations

import jax.numpy as jnp

from lsi_tpu.geometry import projection
from lsi_tpu.ops.gather import bilinear_sample


def plane_homography(K_src: jnp.ndarray, K_trg: jnp.ndarray,
                     pose_src2trg: jnp.ndarray,
                     normal_src: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Homography mapping *target* pixels to *source* pixels for a plane.

    The plane is {X : n^T X = d} in the source frame (``normal_src``:
    (B, 3) unit normal, ``depth``: (B,) plane offset d > 0; a fronto-
    parallel plane at depth z0 is n = (0, 0, 1), d = z0).

    Returns (B, 3, 3) H with [x_s, y_s, 1]^T ~ H [x_t, y_t, 1]^T — the
    inverse-warp direction used to gather source texture into the target.
    """
    rot = pose_src2trg[..., :3, :3]
    t = pose_src2trg[..., :3, 3]
    # For X_s on the plane, n^T X_s / d == 1, so
    #   X_t = R X_s + t (n^T X_s / d) = (R + t n^T / d) X_s
    # giving the source->target homography H_st = K_t (R + t n^T/d) K_s^-1;
    # the returned target->source map is its inverse.
    n = normal_src[..., None, :]  # (B, 1, 3)
    d = depth[..., None, None]
    h_st = jnp.einsum("...ij,...jk,...kl->...il",
                      K_trg, rot + t[..., :, None] * n / d,
                      projection.invert_intrinsics(K_src),
                      precision="highest")
    return jnp.linalg.inv(h_st)


def homography_warp(image_src: jnp.ndarray, homography_t2s: jnp.ndarray,
                    out_hw=None, use_pallas="off", pallas_max_dy: int = 2):
    """Warp a source image into the target view through a homography.

    Args:
      image_src: (B, H, W, C).
      homography_t2s: (B, 3, 3) mapping target pixels -> source pixels.
      out_hw: (Ho, Wo); defaults to source size.
      use_pallas: resolved per geometry.ldi.resolve_use_pallas — on TPU the
        4-corner XLA gather becomes the tent-matmul MXU kernel
        (kernels/gather_pallas.py). Requires Ho to be a multiple of H and
        the homography's VERTICAL displacement within ``pallas_max_dy``
        rows (stereo/planar warps: ~0); out-of-window samples are dropped
        with zero valid mass, same windowed semantics as the splat.
    Returns:
      warped (B, Ho, Wo, C), valid (B, Ho, Wo, 1).
    """
    b, h, w, _ = image_src.shape
    if out_hw is None:
        out_hw = (h, w)
    oh, ow = out_hw
    grid = projection.pixel_grid(oh, ow)  # (Ho, Wo, 2)
    ones = jnp.ones(grid.shape[:-1] + (1,), jnp.float32)
    homo = jnp.concatenate([grid, ones], axis=-1)  # (Ho, Wo, 3)
    mapped = jnp.einsum("bij,hwj->bhwi", homography_t2s, homo, precision="highest")
    denom = jnp.where(jnp.abs(mapped[..., 2:3]) < 1e-8,
                      jnp.full_like(mapped[..., 2:3], 1e-8), mapped[..., 2:3])
    coords = mapped[..., :2] / denom

    from lsi_tpu.geometry.ldi import resolve_use_pallas
    if resolve_use_pallas(use_pallas) and oh % h == 0:
        from lsi_tpu.kernels.gather_pallas import gather_pallas_diff
        from lsi_tpu.kernels.splat_pallas import DEFAULT_MAX_DX
        return gather_pallas_diff(image_src.astype(jnp.float32), coords,
                                  DEFAULT_MAX_DX, pallas_max_dy, 32)
    return bilinear_sample(image_src, coords)


def plane_sweep_volume(image_src: jnp.ndarray, K_src: jnp.ndarray,
                       K_trg: jnp.ndarray, pose_trg2src: jnp.ndarray,
                       depths: jnp.ndarray, out_hw=None):
    """Classic plane-sweep volume: warp the source image to the target view
    through D fronto-parallel planes of the *target* camera.

    Args:
      depths: (D,) plane depths in the target frame.
    Returns:
      volume (B, D, Ho, Wo, C), valid (B, D, Ho, Wo, 1).
    """
    b = image_src.shape[0]
    d = depths.shape[0]
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (b, 3))

    outs, valids = [], []
    for i in range(d):  # static, small D — unrolled under jit
        dep = jnp.broadcast_to(depths[i], (b,))
        # Plane lives in the target frame; warp direction source->target uses
        # pose target->source with roles swapped in plane_homography.
        h_t2s = jnp.linalg.inv(plane_homography(
            K_trg, K_src, pose_trg2src, normal, dep))
        warped, valid = homography_warp(image_src, h_t2s, out_hw)
        outs.append(warped)
        valids.append(valid)
    return jnp.stack(outs, axis=1), jnp.stack(valids, axis=1)
