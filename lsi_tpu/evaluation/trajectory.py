"""Camera-trajectory sweep: one LDI -> many novel views (video synthesis).

BASELINE.json config 5: predict once, render 60 poses. TPU-first shape: the
LDI stays resident in HBM and a single jitted ``lax.map``/``vmap`` program
renders the whole pose batch — prediction cost is amortized and throughput
is bounded by the splat render (the path the Pallas kernel accelerates).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lsi_tpu.config import RenderConfig
from lsi_tpu.geometry.ldi import LDI, render_forward
from lsi_tpu.geometry.transforms import camera_trajectory


@partial(jax.jit, static_argnames=("render_cfg", "chunk"))
def _render_poses(ldi: LDI, poses: jnp.ndarray,
                  render_cfg: RenderConfig, chunk: int = 8):
    def one(pose):
        out = render_forward(
            ldi, jnp.broadcast_to(pose[None], (ldi.batch, 4, 4)),
            zbuffer_scale=render_cfg.zbuffer_scale,
            splat_method=render_cfg.splat_method,
            use_pallas=render_cfg.use_pallas,
            pallas_max_dy=render_cfg.pallas_max_dy,
            check_window=render_cfg.window_check)
        return out["rgb"], out["window_dropped_frac"]

    # lax.map with batching: static HBM footprint (chunk renders in flight)
    # regardless of trajectory length — 60 or 600 poses both fit.
    rgbs, dropped = jax.lax.map(one, poses, batch_size=chunk)
    return rgbs, jnp.max(dropped)


def render_trajectory(ldi: LDI, num_views: int = 60,
                      max_translation=(0.15, 0.0, 0.0),
                      max_rotation=(0.0, 0.0, 0.02),
                      render_cfg: RenderConfig = RenderConfig(),
                      poses: jnp.ndarray = None) -> jnp.ndarray:
    """Render a smooth sweep; returns (num_views, B, H, W, 3).

    Rotation sweeps are exactly the poses that overflow a too-small
    ``pallas_max_dy``: the worst per-view dy-window drop is checked on the
    host and warns loudly (see geometry.ldi.warn_window_drop).
    """
    if poses is None:
        poses = camera_trajectory(num_views, max_translation, max_rotation)
    frames, dropped = _render_poses(ldi, poses, render_cfg)
    if render_cfg.window_check:
        from lsi_tpu.geometry.ldi import warn_window_drop
        warn_window_drop(dropped, render_cfg.pallas_max_dy)
    return frames
