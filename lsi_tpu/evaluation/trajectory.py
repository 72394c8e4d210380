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
from lsi_tpu.geometry.transforms import camera_trajectory, pose_from_euler


@partial(jax.jit, static_argnames=("render_cfg", "chunk", "check_each"))
def _render_poses(ldi: LDI, poses: jnp.ndarray,
                  render_cfg: RenderConfig, chunk: int = 8,
                  check_each: bool = True):
    def one(pose):
        out = render_forward(
            ldi, jnp.broadcast_to(pose[None], (ldi.batch, 4, 4)),
            zbuffer_scale=render_cfg.zbuffer_scale,
            splat_method=render_cfg.splat_method,
            use_pallas=render_cfg.use_pallas,
            pallas_max_dy=render_cfg.pallas_max_dy,
            check_window=check_each and render_cfg.window_check)
        return out["rgb"], out["window_dropped_frac"]

    # lax.map with batching: static HBM footprint (chunk renders in flight)
    # regardless of trajectory length — 60 or 600 poses both fit.
    rgbs, dropped = jax.lax.map(one, poses, batch_size=chunk)
    return rgbs, jnp.max(dropped)


@partial(jax.jit, static_argnames=("max_dy",))
def _extreme_pose_drop(ldi: LDI, max_translation: jnp.ndarray,
                       max_rotation: jnp.ndarray, max_dy: int):
    """Window-drop fraction at the sweep's ±extreme poses, via projection
    only (no splat) — one jitted program, poses built inside."""
    from lsi_tpu.geometry.ldi import (_window_dropped_fraction,
                                      project_layers_folded)

    b, l, h, w = ldi.textures.shape[:4]
    amp = jnp.asarray([[1.0], [-1.0]], jnp.float32)
    poses = pose_from_euler(amp * max_rotation[None],
                            amp * max_translation[None])

    def one(pose):
        tc, _, valid = project_layers_folded(
            ldi, jnp.broadcast_to(pose[None], (b, 4, 4)))
        return _window_dropped_fraction(
            tc.reshape(b, l * h, w, 2), valid.reshape(b, l * h, w, 1),
            (h, w), max_dy)

    return jnp.max(jax.lax.map(one, poses))


def render_trajectory(ldi: LDI, num_views: int = 60,
                      max_translation=(0.15, 0.0, 0.0),
                      max_rotation=(0.0, 0.0, 0.02),
                      render_cfg: RenderConfig = RenderConfig(),
                      poses: jnp.ndarray = None) -> jnp.ndarray:
    """Render a smooth sweep; returns (num_views, B, H, W, 3).

    Rotation sweeps are exactly the poses that overflow a too-small
    ``pallas_max_dy``: the worst per-view dy-window drop is checked on the
    host and warns loudly (see geometry.ldi.warn_window_drop). For the
    canonical sinusoidal sweep the check runs once on the two EXTREME poses
    (±max amplitude, which bound the sweep's displacement) instead of per
    view — the per-view diagnostic cost ~20% of cfg-5 throughput; arbitrary
    user-supplied ``poses`` keep the exact per-view check.
    """
    canonical = poses is None
    if canonical:
        # One jitted program for the pose ramp: eagerly, its ~20 small ops
        # each pay the axon tunnel's per-op RTT (measurable per sweep).
        poses = jax.jit(camera_trajectory, static_argnums=0)(
            num_views, jnp.asarray(max_translation, jnp.float32),
            jnp.asarray(max_rotation, jnp.float32))
    frames, dropped = _render_poses(ldi, poses, render_cfg,
                                    check_each=not canonical)
    if render_cfg.window_check:
        from lsi_tpu.geometry.ldi import warn_window_drop
        if canonical:
            dropped = _extreme_pose_drop(
                ldi, jnp.asarray(max_translation, jnp.float32),
                jnp.asarray(max_rotation, jnp.float32),
                render_cfg.pallas_max_dy)
        warn_window_drop(dropped, render_cfg.pallas_max_dy)
    return frames
