"""Camera-trajectory sweep: one LDI -> many novel views (video synthesis).

BASELINE.json config 5: predict once, render 60 poses. TPU-first shape: the
LDI stays resident in HBM and a single jitted ``lax.map``/``vmap`` program
renders the whole pose batch — prediction cost is amortized and throughput
is bounded by the splat render (the path the Pallas kernel accelerates).

Perf note (r3): the canonical sinusoidal sweep runs as ONE jitted program —
pose ramp, all renders, and the extreme-pose window-drop check fused — so a
sweep costs a single dispatch on the axon tunnel instead of three (pose
ramp + renders + check). The split version measured 207 views/s; each extra
dispatch + device->host read costs ~10-20 ms of tunnel RTT per sweep
(docs/perf.md §5), which the fusion recovers.
"""

from __future__ import annotations

import atexit
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp

from lsi_tpu.config import RenderConfig
from lsi_tpu.geometry.ldi import LDI, render_forward
from lsi_tpu.geometry.transforms import camera_trajectory, pose_from_euler

# The dy-window warning needs the `dropped` scalar on the host, but a
# synchronous pull would serialize back-to-back sweeps: each call blocks a
# full tunnel RTT (~10-20 ms, docs/perf.md §5) before the next can
# dispatch, which measured as the residual 207-209 vs 227 views/s on
# BASELINE cfg-5. The diagnostic instead rides a single worker thread —
# np.asarray blocks THERE while the main thread keeps dispatching — and is
# guaranteed delivered by flush_window_warnings() (atexit-registered, and
# callable for deterministic tests).
_WARN_POOL = ThreadPoolExecutor(max_workers=1)
_PENDING_WARNS: list = []


def flush_window_warnings() -> None:
    """Block until every pending async dy-window check has been pulled to
    the host and (if triggered) warned."""
    while _PENDING_WARNS:
        _PENDING_WARNS.pop(0).result()


atexit.register(flush_window_warnings)


def _one_render(ldi: LDI, pose, render_cfg: RenderConfig, check: bool):
    out = render_forward(
        ldi, jnp.broadcast_to(pose[None], (ldi.batch, 4, 4)),
        zbuffer_scale=render_cfg.zbuffer_scale,
        splat_method=render_cfg.splat_method,
        use_pallas=render_cfg.use_pallas,
        pallas_max_dy=render_cfg.pallas_max_dy,
        check_window=check)
    return out["rgb"], out["window_dropped_frac"]


@partial(jax.jit, static_argnames=("render_cfg", "chunk", "check_each"))
def _render_poses(ldi: LDI, poses: jnp.ndarray,
                  render_cfg: RenderConfig, chunk: int = 8,
                  check_each: bool = True):
    """Arbitrary-pose path: per-view window diagnostic (nothing bounds
    user-supplied poses, so every view is checked)."""
    def one(pose):
        return _one_render(ldi, pose, render_cfg,
                           check_each and render_cfg.window_check)

    # lax.map with batching: static HBM footprint (chunk renders in flight)
    # regardless of trajectory length — 60 or 600 poses both fit.
    rgbs, dropped = jax.lax.map(one, poses, batch_size=chunk)
    return rgbs, jnp.max(dropped)


@partial(jax.jit,
         static_argnames=("num_views", "render_cfg", "chunk", "check"))
def _render_canonical_sweep(ldi: LDI, max_translation: jnp.ndarray,
                            max_rotation: jnp.ndarray, num_views: int,
                            render_cfg: RenderConfig, chunk: int = 8,
                            check: bool = True):
    """Canonical sinusoidal sweep, fully fused: pose ramp + renders +
    extreme-pose window check in one XLA program (single dispatch)."""
    poses = camera_trajectory(num_views, max_translation, max_rotation)

    def one(pose):
        return _one_render(ldi, pose, render_cfg, False)[0]

    rgbs = jax.lax.map(one, poses, batch_size=chunk)

    dropped = jnp.zeros((), jnp.float32)
    if check:
        # The sinusoidal sweep's displacement is bounded by the two extreme
        # poses (±max amplitude): checking only those costs 2 projections
        # (no splat) instead of a per-view diagnostic (~20% of throughput).
        from lsi_tpu.geometry.ldi import (_window_dropped_fraction,
                                          project_layers_folded)
        b, l, h, w = ldi.textures.shape[:4]
        amp = jnp.asarray([[1.0], [-1.0]], jnp.float32)
        eposes = pose_from_euler(amp * max_rotation[None],
                                 amp * max_translation[None])

        def drop_one(pose):
            tc, _, valid = project_layers_folded(
                ldi, jnp.broadcast_to(pose[None], (b, 4, 4)))
            return _window_dropped_fraction(
                tc.reshape(b, l * h, w, 2), valid.reshape(b, l * h, w, 1),
                (h, w), render_cfg.pallas_max_dy)

        dropped = jnp.max(jax.lax.map(drop_one, eposes))
    return rgbs, dropped


def render_trajectory(ldi: LDI, num_views: int = 60,
                      max_translation=(0.15, 0.0, 0.0),
                      max_rotation=(0.0, 0.0, 0.02),
                      render_cfg: RenderConfig = RenderConfig(),
                      poses: jnp.ndarray = None) -> jnp.ndarray:
    """Render a smooth sweep; returns (num_views, B, H, W, 3).

    Rotation sweeps are exactly the poses that overflow a too-small
    ``pallas_max_dy``: the worst dy-window drop is checked and warns loudly
    (see geometry.ldi.warn_window_drop). For the canonical sinusoidal sweep
    the whole computation — pose ramp, renders, and the ±extreme-pose
    window check (which bounds the sweep's displacement) — is one jitted
    program; arbitrary user-supplied ``poses`` keep the exact per-view
    check.
    """
    if poses is None:
        frames, dropped = _render_canonical_sweep(
            ldi, jnp.asarray(max_translation, jnp.float32),
            jnp.asarray(max_rotation, jnp.float32), num_views,
            render_cfg, check=render_cfg.window_check)
    else:
        frames, dropped = _render_poses(ldi, poses, render_cfg,
                                        check_each=True)
    if render_cfg.window_check:
        from lsi_tpu.geometry.ldi import warn_window_drop

        # Drop completed checks from the queue without blocking, then
        # enqueue this sweep's — consecutive sweeps pipeline on-device.
        while _PENDING_WARNS and _PENDING_WARNS[0].done():
            _PENDING_WARNS.pop(0).result()
        _PENDING_WARNS.append(
            _WARN_POOL.submit(warn_window_drop, dropped,
                              render_cfg.pallas_max_dy))
    return frames
