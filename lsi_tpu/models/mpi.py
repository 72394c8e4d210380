"""Layered-planes (MPI-style) baseline: alpha-composited fronto-parallel
planes.

Capability parity with the reference's plane-based baseline experiments
(layered plane sweep / LDI-vs-planes comparisons in ``lsi/experiments``,
geometry in ``lsi/geometry/homography.py``): the model predicts, for D fixed
fronto-parallel planes in the source camera, per-plane RGB + alpha; novel
views are rendered by warping every plane through its exact plane-induced
homography and over-compositing back-to-front.

TPU-first notes: rendering is pure gather (no scatter) — D homography warps
(batched bilinear samples) + an associative over-composite; the D-plane loop
is unrolled at trace time (D is static and small), everything fuses into one
XLA program.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import flax.struct
import jax.numpy as jnp


from lsi_tpu.geometry import homography
from lsi_tpu.models.unet import UNet


@flax.struct.dataclass
class MPI:
    """Multi-plane image in a source camera.

    Attributes:
      colors: (B, D, H, W, 3) per-plane RGB in [0, 1].
      alphas: (B, D, H, W, 1) per-plane opacity in [0, 1]; plane 0 nearest.
      depths: (D,) plane depths (meters), increasing.
      intrinsics: (B, 3, 3).
    """
    colors: jnp.ndarray
    alphas: jnp.ndarray
    depths: jnp.ndarray
    intrinsics: jnp.ndarray

    @property
    def num_planes(self) -> int:
        return self.colors.shape[1]


def plane_depths(num_planes: int, min_depth: float = 1.0,
                 max_depth: float = 100.0) -> jnp.ndarray:
    """Depths uniform in disparity (the standard MPI spacing), near->far."""
    disps = jnp.linspace(1.0 / min_depth, 1.0 / max_depth, num_planes,
                         dtype=jnp.float32)
    return 1.0 / disps


class MPIPredictor(nn.Module):
    """image -> MPI (per-plane alpha + blend of input/predicted color)."""
    num_planes: int = 8
    base_filters: int = 32
    num_scales: int = 5
    min_depth: float = 1.0
    max_depth: float = 100.0
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, image: jnp.ndarray, intrinsics: jnp.ndarray) -> MPI:
        dtype = jnp.dtype(self.compute_dtype)
        b, h, w, _ = image.shape
        d = self.num_planes

        feats = UNet(base_filters=self.base_filters,
                     num_scales=self.num_scales, dtype=dtype)(image)

        # Heads: D alphas + D blend weights + one background RGB; plane
        # color = blend * input + (1 - blend) * background (the classic
        # compact MPI parametrization — avoids predicting D full textures).
        raw = nn.Conv(2 * d + 3, (3, 3), padding="SAME", dtype=dtype,
                      name="mpi_head")(feats)
        raw = raw.astype(jnp.float32)
        alphas = nn.sigmoid(raw[..., :d])            # (B, H, W, D)
        blend = nn.sigmoid(raw[..., d:2 * d])        # (B, H, W, D)
        bg = nn.sigmoid(raw[..., 2 * d:])            # (B, H, W, 3)

        img32 = image.astype(jnp.float32)
        colors = (blend[..., None] * img32[..., None, :]
                  + (1.0 - blend[..., None]) * bg[..., None, :])
        colors = jnp.moveaxis(colors, 3, 1)          # (B, D, H, W, 3)
        alphas = jnp.moveaxis(alphas[..., None], 3, 1)  # (B, D, H, W, 1)
        # Nearest plane fully opaque backstop is NOT forced; training decides.
        return MPI(colors=colors, alphas=alphas,
                   depths=plane_depths(d, self.min_depth, self.max_depth),
                   intrinsics=intrinsics.astype(jnp.float32))


def build_mpi_predictor(model_cfg) -> "MPIPredictor":
    """Construct the MPI baseline predictor from a ModelConfig
    (family="mpi" — the trainable plane-based baseline experiment)."""
    return MPIPredictor(
        num_planes=model_cfg.num_planes,
        base_filters=model_cfg.base_filters,
        num_scales=model_cfg.num_scales,
        min_depth=model_cfg.min_depth,
        max_depth=model_cfg.max_depth,
        compute_dtype=model_cfg.compute_dtype)


def mpi_source_disparity(mpi: MPI) -> jnp.ndarray:
    """Expected source-view disparity of an MPI: (B, H, W, 1).

    No warping needed — in the source camera every plane is aligned, so the
    over-composite reduces to per-pixel weights w_d = a_d * prod_{d'<d}
    (1 - a_{d'}) and E[disparity] = sum_d w_d / depth_d. Used for the
    smoothness regularizer, depth supervision, and depth evaluation of the
    plane-based baseline.
    """
    a = jnp.clip(mpi.alphas[..., 0], 0.0, 1.0)      # (B, D, H, W)
    trans = jnp.cumprod(1.0 - a, axis=1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1)  # exclusive
    w = a * trans
    disp = jnp.sum(w / mpi.depths[None, :, None, None], axis=1)
    return disp[..., None]


def render_mpi(mpi: MPI, pose_src2trg: jnp.ndarray,
               K_trg: Optional[jnp.ndarray] = None,
               out_hw=None, use_pallas="off", pallas_max_dy: int = 2):
    """Render an MPI into a novel view (gather-only, fully differentiable).

    Warps every plane into the target camera through its exact
    plane-induced homography, then over-composites front-to-back:
        C = sum_d c_d a_d prod_{d' < d} (1 - a_{d'}).
    Returns dict(rgb, alpha (accumulated opacity), disparity).

    ``use_pallas``/``pallas_max_dy`` route the D per-plane warps through
    the tent-matmul gather kernel on TPU (the D x 4 XLA gathers serialize
    there — docs/perf.md §1); warps whose vertical displacement exceeds
    the window lose those samples (valid mass 0), like every windowed path.
    """
    b, d, h, w, _ = mpi.colors.shape
    if K_trg is None:
        K_trg = mpi.intrinsics
    if out_hw is None:
        out_hw = (h, w)

    normal = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (b, 3))

    rgb = jnp.zeros((b,) + tuple(out_hw) + (3,), jnp.float32)
    acc_alpha = jnp.zeros((b,) + tuple(out_hw) + (1,), jnp.float32)
    acc_disp = jnp.zeros((b,) + tuple(out_hw) + (1,), jnp.float32)
    transmittance = jnp.ones((b,) + tuple(out_hw) + (1,), jnp.float32)

    for i in range(d):  # static unroll, near -> far
        depth_i = jnp.broadcast_to(mpi.depths[i], (b,))
        h_t2s = homography.plane_homography(
            mpi.intrinsics, K_trg, pose_src2trg, normal, depth_i)
        plane = jnp.concatenate([mpi.colors[:, i], mpi.alphas[:, i]], -1)
        warped, valid = homography.homography_warp(
            plane, h_t2s, out_hw, use_pallas=use_pallas,
            pallas_max_dy=pallas_max_dy)
        c_i = warped[..., :3]
        a_i = jnp.clip(warped[..., 3:4], 0.0, 1.0) * valid
        rgb = rgb + transmittance * a_i * c_i
        acc_alpha = acc_alpha + transmittance * a_i
        acc_disp = acc_disp + transmittance * a_i / mpi.depths[i]
        transmittance = transmittance * (1.0 - a_i)

    return {"rgb": rgb, "alpha": acc_alpha, "disparity": acc_disp}
