"""Pure-numpy oracle implementations of the geometry/render semantics.

These stand in for the unrunnable TF1 reference (the mounted reference tree
was empty — SURVEY.md §0): simple, loop-based, obviously-correct
implementations of unprojection/projection, bilinear sampling, forward
splatting and soft z-buffer compositing, against which the vectorized JAX /
Pallas implementations are checked.
"""

from __future__ import annotations

import numpy as np

MIN_DEPTH = 1e-6


def unproject_project_np(disparity, K_src, K_trg, T):
    """Loop oracle for projection.forward_project on ONE image.

    disparity (H, W); K (3, 3); T (4, 4). Returns coords (H, W, 2),
    trg_disparity (H, W), valid (H, W).
    """
    h, w = disparity.shape
    coords = np.zeros((h, w, 2), np.float64)
    out_disp = np.zeros((h, w), np.float64)
    valid = np.zeros((h, w), np.float64)
    K_inv = np.linalg.inv(K_src)
    for y in range(h):
        for x in range(w):
            z = 1.0 / max(disparity[y, x], MIN_DEPTH)
            p_cam = z * (K_inv @ np.array([x, y, 1.0]))
            p_t = T[:3, :3] @ p_cam + T[:3, 3]
            uvw = K_trg @ p_t
            zz = p_t[2]
            coords[y, x] = uvw[:2] / max(uvw[2], MIN_DEPTH)
            if zz > MIN_DEPTH:
                valid[y, x] = 1.0
                out_disp[y, x] = 1.0 / max(zz, MIN_DEPTH)
    return coords, out_disp, valid


def bilinear_sample_np(image, coords):
    """Loop oracle for ops.gather.bilinear_sample on ONE image.

    image (H, W, C); coords (Ho, Wo, 2) as [x, y]. Zeros outside. Returns
    (sampled (Ho, Wo, C), valid (Ho, Wo)).
    """
    h, w, c = image.shape
    ho, wo, _ = coords.shape
    out = np.zeros((ho, wo, c), np.float64)
    valid = np.zeros((ho, wo), np.float64)
    for i in range(ho):
        for j in range(wo):
            x, y = coords[i, j]
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            fx, fy = x - x0, y - y0
            vsum = 0.0
            acc = np.zeros(c)
            for dy, dx, wgt in ((0, 0, (1 - fx) * (1 - fy)),
                                (0, 1, fx * (1 - fy)),
                                (1, 0, (1 - fx) * fy),
                                (1, 1, fx * fy)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xx < w:
                    acc += wgt * image[yy, xx]
                    vsum += wgt
            out[i, j] = acc
            valid[i, j] = vsum
    return out, valid


def splat_np(values, coords, weights, out_hw):
    """Loop oracle for ops.splat.splat_bilinear on ONE image.

    values (H, W, C); coords (H, W, 2); weights (H, W). Returns
    (accum (Ho, Wo, C), wsum (Ho, Wo)).
    """
    h, w, c = values.shape
    oh, ow = out_hw
    accum = np.zeros((oh, ow, c), np.float64)
    wsum = np.zeros((oh, ow), np.float64)

    def snap(f):
        # Same per-axis fraction snap as ops/splat.snap_fraction.
        if f < 1e-4:
            return 0.0
        if f > 1.0 - 1e-4:
            return 1.0
        return f

    for y in range(h):
        for x in range(w):
            xt, yt = coords[y, x]
            x0, y0 = int(np.floor(xt)), int(np.floor(yt))
            fx, fy = snap(np.float32(xt) - x0), snap(np.float32(yt) - y0)
            for dy, dx, frac in ((0, 0, (1 - fx) * (1 - fy)),
                                 (0, 1, fx * (1 - fy)),
                                 (1, 0, (1 - fx) * fy),
                                 (1, 1, fx * fy)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < oh and 0 <= xx < ow and frac > 0:
                    wgt = frac * weights[y, x]
                    accum[yy, xx] += wgt * values[y, x]
                    wsum[yy, xx] += wgt
    return accum, wsum


def render_ldi_np(textures, disparities, K, T, zbuffer_scale,
                  max_disparity=1.0):
    """Loop oracle for geometry.ldi.render_forward on ONE LDI.

    textures (L, H, W, 3); disparities (L, H, W); K (3, 3); T (4, 4).
    Returns dict(rgb (H, W, 3), disparity (H, W), coverage (H, W)).
    """
    l, h, w, _ = textures.shape
    accum = np.zeros((h, w, 4), np.float64)
    wsum = np.zeros((h, w), np.float64)
    # Same per-image max-disparity weight shift as the JAX implementation
    # (cancels in the composite; makes `coverage` directly comparable).
    per_layer = [unproject_project_np(disparities[li], K, K, T)
                 for li in range(l)]
    d_shift = max(0.0, max(np.max(np.where(v > 0, td, -np.inf))
                           for _, td, v in per_layer))
    for li in range(l):
        coords, tdisp, valid = per_layer[li]
        zw = np.exp(zbuffer_scale * (tdisp - d_shift)) * valid
        payload = np.concatenate([textures[li], tdisp[..., None]], axis=-1)
        a, s = splat_np(payload, coords, zw, (h, w))
        accum += a
        wsum += s
    rgb = np.where(wsum[..., None] > 0, accum[..., :3]
                   / np.maximum(wsum[..., None], 1e-30), 0.0)
    disp = np.where(wsum > 0, accum[..., 3]
                    / np.maximum(wsum, 1e-30), 0.0)
    return {"rgb": rgb, "disparity": disp, "coverage": wsum}
