"""Synthetic two-plane stereo dataset — the sanity/overfit setting.

Mirrors the paper's synthetic experiment capability (textured fronto-parallel
planes at distinct depths observed by a stereo pair): generates scenes with a
textured background plane and one or more textured foreground rectangles,
analytically renders the pair of views (with correct occlusion and
disocclusion), and yields (src, trg, K, pose) samples plus ground-truth
layered disparities for eval.

Everything is generated in numpy on the host (cheap; images are small) and
streamed like a real dataset, so the training harness exercises the same
pipeline code paths that KITTI/SYNTHIA use.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SyntheticScene:
    src_image: np.ndarray      # (H, W, 3) float32
    trg_image: np.ndarray      # (H, W, 3) float32
    intrinsics: np.ndarray     # (3, 3) float32
    pose_src2trg: np.ndarray   # (4, 4) float32
    gt_disparity_layers: np.ndarray  # (2, H, W) float32 (fg-visible, bg)
    gt_visible_disparity: np.ndarray  # (H, W) float32 (layer-0 / nearest)
    gt_trg_disparity: np.ndarray  # (H, W) float32 — visible disparity IN
                                  # THE TARGET VIEW (occluded-region eval)


def _texture(rng: np.random.Generator, h: int, w: int, cells: int = 8):
    """Smooth random color texture (upsampled low-res noise)."""
    low = rng.uniform(0.05, 0.95, (cells, cells, 3)).astype(np.float32)
    ys = np.linspace(0, cells - 1, h)
    xs = np.linspace(0, cells - 1, w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    y1 = np.minimum(y0 + 1, cells - 1)
    x1 = np.minimum(x0 + 1, cells - 1)
    out = ((1 - fy) * (1 - fx) * low[y0][:, x0]
           + (1 - fy) * fx * low[y0][:, x1]
           + fy * (1 - fx) * low[y1][:, x0]
           + fy * fx * low[y1][:, x1])
    return out.astype(np.float32)


def _render_view(bg_tex, fg_tex, fg_box, bg_depth, fg_depth, K, tx, h, w):
    """Analytic view of a 2-plane scene from a camera translated by tx.

    Planes are fronto-parallel; a camera at x-offset tx sees plane content
    shifted by fx * tx / depth. Foreground occludes background.
    """
    fx = K[0, 0]
    xs = np.arange(w, dtype=np.float32)

    def sample_plane(tex, depth):
        # pixel x in this camera sees plane texture at x + fx*tx/depth of
        # the canonical (tx=0) frame.
        shift = fx * tx / depth
        src_x = xs + shift
        x0 = np.floor(src_x).astype(int)
        f = src_x - x0
        x0c = np.clip(x0, 0, w - 1)
        x1c = np.clip(x0 + 1, 0, w - 1)
        return ((1 - f)[None, :, None] * tex[:, x0c]
                + f[None, :, None] * tex[:, x1c]), src_x

    img, _ = sample_plane(bg_tex, bg_depth)
    disp = np.full((h, w), 1.0 / bg_depth, np.float32)

    fg_img, src_x = sample_plane(fg_tex, fg_depth)
    y0, y1, x0b, x1b = fg_box
    # Foreground rectangle is defined in canonical-frame coords; a pixel
    # shows foreground iff its fg-plane lookup lands inside the box.
    in_box = np.broadcast_to((src_x >= x0b) & (src_x < x1b), (h, w)).copy()
    in_box[:y0] = False
    in_box[y1:] = False
    img = np.where(in_box[..., None], fg_img, img)
    disp = np.where(in_box, 1.0 / fg_depth, disp)
    return img.astype(np.float32), disp


def make_scene(rng: np.random.Generator, height: int, width: int,
               baseline: float = 0.3) -> SyntheticScene:
    """Sample one two-plane stereo scene."""
    h, w = height, width
    fx = 0.95 * w
    K = np.array([[fx, 0, (w - 1) / 2], [0, fx, (h - 1) / 2], [0, 0, 1]],
                 np.float32)

    bg_depth = float(rng.uniform(8.0, 14.0))
    fg_depth = float(rng.uniform(2.5, 5.0))
    bg_tex = _texture(rng, h, w)
    fg_tex = _texture(rng, h, w, cells=5)

    y0 = int(rng.integers(0, h // 3))
    y1 = int(rng.integers(2 * h // 3, h))
    x0 = int(rng.integers(0, w // 3))
    x1 = int(rng.integers(2 * w // 3, w))
    box = (y0, y1, x0, x1)

    src_img, src_disp = _render_view(bg_tex, fg_tex, box, bg_depth, fg_depth,
                                     K, 0.0, h, w)
    trg_img, trg_disp = _render_view(bg_tex, fg_tex, box, bg_depth, fg_depth,
                                     K, baseline, h, w)

    # src -> trg pose: target camera at +baseline along x means points move
    # by -baseline in the target frame.
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = -baseline

    gt_layers = np.stack([src_disp,
                          np.full((h, w), 1.0 / bg_depth, np.float32)])
    return SyntheticScene(
        src_image=src_img, trg_image=trg_img, intrinsics=K,
        pose_src2trg=pose, gt_disparity_layers=gt_layers,
        gt_visible_disparity=src_disp, gt_trg_disparity=trg_disp)


def generate(seed: int, height: int, width: int, count: int):
    """Yield `count` scenes deterministically from `seed`."""
    rng = np.random.default_rng(seed)
    for _ in range(count):
        yield make_scene(rng, height, width)
