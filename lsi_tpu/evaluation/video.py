"""Video-synthesis export: trajectory frames -> PNG sequence / GIF.

Completes the camera-trajectory sweep path (BASELINE config 5): after
``render_trajectory`` produces (T, B, H, W, 3) frames, export them for
inspection. GIF uses PIL (no ffmpeg dependency in this environment).
"""

from __future__ import annotations

import os


import numpy as np


def save_frames(frames, out_dir: str, batch_index: int = 0,
                prefix: str = "view") -> list:
    """Write each trajectory frame as a PNG; returns the file paths."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    arr = np.clip(np.asarray(frames), 0.0, 1.0)
    paths = []
    for t in range(arr.shape[0]):
        img = (arr[t, batch_index] * 255).astype(np.uint8)
        path = os.path.join(out_dir, f"{prefix}_{t:04d}.png")
        Image.fromarray(img).save(path)
        paths.append(path)
    return paths


def save_gif(frames, path: str, batch_index: int = 0,
             fps: int = 15, loop: int = 0) -> str:
    """Write the trajectory as an animated GIF."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.clip(np.asarray(frames), 0.0, 1.0)
    imgs = [Image.fromarray((arr[t, batch_index] * 255).astype(np.uint8))
            for t in range(arr.shape[0])]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(1, 1000 // fps), loop=loop)
    return path
