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


# ---------------------------------------------------------------------------
# Multi-object scenes: 2-4 textured boxes at varying depths over a slanted
# background plane, observed under full SE(3) pose jitter (incl. rotation).
# Rendering is exact: per view pixel, cast the ray, intersect every plane
# analytically, keep the nearest in-region hit. This is the scene family a
# two-fronto-parallel-plane world cannot falsify the layered representation
# on (layer specialization, disocclusion inpainting, rotation robustness).
# ---------------------------------------------------------------------------


def _euler_rotation(rx: float, ry: float, rz: float) -> np.ndarray:
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float64)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float64)
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], np.float64)
    return (Rz @ Ry @ Rx).astype(np.float32)


def _bilinear_np(tex: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Sample (H, W, 3) texture at float pixel coords (clamped)."""
    h, w = tex.shape[:2]
    u = np.clip(u, 0.0, w - 1.0)
    v = np.clip(v, 0.0, h - 1.0)
    u0 = np.floor(u).astype(int)
    v0 = np.floor(v).astype(int)
    u1 = np.minimum(u0 + 1, w - 1)
    v1 = np.minimum(v0 + 1, h - 1)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    return ((1 - fv) * ((1 - fu) * tex[v0, u0] + fu * tex[v0, u1])
            + fv * ((1 - fu) * tex[v1, u0] + fu * tex[v1, u1]))


def _render_planes(planes, K, pose_c2v, h, w, num_hit_layers=2):
    """Exact analytic render of plane set from the camera at pose_c2v.

    Each plane dict: {normal (3,), offset d (n.p = d), tex (H, W, 3),
    box (y0, y1, x0, x1) or None (infinite)}. Regions are defined in the
    CANONICAL camera's image (pixel rect of the plane's canonical
    projection). Returns (rgb, disparity of nearest hit, disparity of k-th
    hit for k < num_hit_layers).
    """
    R = pose_c2v[:3, :3]
    t = pose_c2v[:3, 3]
    Kinv = np.linalg.inv(K).astype(np.float32)

    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T  # view frame
    # canonical-frame ray: p_c = R^T (s * ray - t)
    rays_c = rays @ R  # == R^T applied to each ray
    t_c = R.T @ t

    hits = []  # (depth_view, rgb, valid) per plane
    for pl in planes:
        n = pl["normal"]
        denom = rays_c @ n
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        s = (pl["offset"] + n @ t_c) / denom  # distance along view ray
        z_view = s * rays[..., 2]
        p_c = s[..., None] * rays_c - t_c          # canonical-frame point
        uc = p_c @ K.T
        with np.errstate(divide="ignore", invalid="ignore"):
            u = uc[..., 0] / uc[..., 2]
            v = uc[..., 1] / uc[..., 2]
        valid = (z_view > 0.1) & (uc[..., 2] > 1e-6)
        if pl["box"] is not None:
            y0, y1, x0, x1 = pl["box"]
            valid &= (u >= x0) & (u < x1) & (v >= y0) & (v < y1)
        rgb = _bilinear_np(pl["tex"], np.nan_to_num(u), np.nan_to_num(v))
        hits.append((np.where(valid, z_view, np.inf), rgb))

    depth_stack = np.stack([d for d, _ in hits])        # (P, H, W)
    order = np.argsort(depth_stack, axis=0)             # near -> far
    nearest = np.take_along_axis(depth_stack, order[:1], axis=0)[0]
    rgb_stack = np.stack([c for _, c in hits])          # (P, H, W, 3)
    idx = order[0][None, ..., None]
    img = np.take_along_axis(rgb_stack, idx, axis=0)[0]

    layers = []
    for k in range(num_hit_layers):
        kk = min(k, depth_stack.shape[0] - 1)
        dk = np.take_along_axis(depth_stack, order[kk:kk + 1], axis=0)[0]
        layers.append(np.where(np.isfinite(dk), 1.0 / dk, 0.0))
    disp = np.where(np.isfinite(nearest), 1.0 / nearest, 0.0)
    return (img.astype(np.float32), disp.astype(np.float32),
            np.stack(layers).astype(np.float32))


def make_scene_multi(rng: np.random.Generator, height: int, width: int,
                     baseline: float = 0.3,
                     max_extra_translation: float = 0.03,
                     max_rotation: float = 0.008,
                     num_boxes=None) -> SyntheticScene:
    """Sample a multi-object scene + SE(3)-jittered stereo-ish pair.

    2-4 textured boxes at depths 2.5-6 m over a slanted background plane
    (normal tilted up to ~12 deg), target camera at x-baseline plus small
    y/z translation and rotation jitter. Rotation stays within the default
    Pallas dy window for the training resolutions (fy * rx ~ a few rows);
    the multi-scene presets raise pallas_max_dy anyway.
    """
    h, w = height, width
    fx = 0.95 * w
    K = np.array([[fx, 0, (w - 1) / 2], [0, fx, (h - 1) / 2], [0, 0, 1]],
                 np.float32)

    # slanted background: n = Rsmall @ (0,0,1); n.p = d_bg along the tilt
    bg_depth = float(rng.uniform(8.0, 14.0))
    tilt = _euler_rotation(float(rng.uniform(-0.2, 0.2)),
                           float(rng.uniform(-0.2, 0.2)), 0.0)
    n_bg = (tilt @ np.array([0.0, 0.0, 1.0], np.float32)).astype(np.float32)
    planes = [{
        "normal": n_bg, "offset": bg_depth * 1.0,
        "tex": _texture(rng, h, w), "box": None,
    }]

    nb = int(rng.integers(2, 5)) if num_boxes is None else int(num_boxes)
    for _ in range(nb):
        d = float(rng.uniform(2.5, 6.0))
        bw = int(rng.integers(w // 8, w // 3))
        bh = int(rng.integers(h // 6, h // 2))
        x0 = int(rng.integers(0, max(1, w - bw)))
        y0 = int(rng.integers(0, max(1, h - bh)))
        planes.append({
            "normal": np.array([0.0, 0.0, 1.0], np.float32), "offset": d,
            "tex": _texture(rng, h, w, cells=int(rng.integers(4, 9))),
            "box": (y0, y0 + bh, x0, x0 + bw),
        })

    # src = canonical camera; trg = jittered pose. pose_src2trg maps
    # src-frame points into the trg frame: p_t = R p_s + t.
    rx, ry, rz = rng.uniform(-max_rotation, max_rotation, 3)
    R = _euler_rotation(float(rx), float(ry), float(rz))
    cam_t = np.array([
        baseline * float(rng.uniform(0.7, 1.3)),
        float(rng.uniform(-max_extra_translation, max_extra_translation)),
        float(rng.uniform(-max_extra_translation, max_extra_translation)),
    ], np.float32)  # trg camera center in src coords
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R
    pose[:3, 3] = -R @ cam_t

    ident = np.eye(4, dtype=np.float32)
    src_img, src_disp, src_layers = _render_planes(planes, K, ident, h, w)
    trg_img, trg_disp, _ = _render_planes(planes, K, pose, h, w)

    return SyntheticScene(
        src_image=src_img, trg_image=trg_img, intrinsics=K,
        pose_src2trg=pose, gt_disparity_layers=src_layers,
        gt_visible_disparity=src_disp, gt_trg_disparity=trg_disp)


def generate_multi(seed: int, height: int, width: int, count: int, **kw):
    rng = np.random.default_rng(seed)
    for _ in range(count):
        yield make_scene_multi(rng, height, width, **kw)
