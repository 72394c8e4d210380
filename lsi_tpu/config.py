"""Frozen configuration tree for models, rendering, data, training and eval.

Replaces the reference's scattered ``tf.app.flags`` (gflags) definitions
(``lsi/nnutils/train_utils.py`` + per-experiment flags) with one hashable
frozen-dataclass tree, so configs can ride as jit static arguments, and the
five BASELINE.json benchmark configurations ship as named presets.
"""

from __future__ import annotations

import dataclasses



@dataclasses.dataclass(frozen=True)
class ModelConfig:
    family: str = "ldi"             # "ldi" | "mpi" (layered-planes baseline).
    num_layers: int = 2             # L: LDI layers predicted.
    base_filters: int = 32          # encoder width at full resolution.
    num_scales: int = 5             # encoder downsamplings (UNet depth).
    min_disparity: float = 0.01     # head output range (inverse depth).
    max_disparity: float = 1.0
    layer0_texture_from_input: bool = True  # layer-0 RGB = input passthrough.
    deep_heads_stopgrad_trunk: bool = False  # deep-layer heads read the UNet
                                     # trunk through stop_gradient via their
                                     # own small branch: hidden-layer
                                     # training cannot perturb layer-0's
                                     # representation. Anti-drift candidate
                                     # #1 from the r3 toy testbed, whose
                                     # Pareto frontier showed the layer-0
                                     # drift is transmitted through the
                                     # shared trunk (BASELINE.md).
    compute_dtype: str = "bfloat16"  # conv compute dtype (params stay f32).
    ordering_floor: float = 0.2     # deeper-layer disparity ratio floor r:
                                    # d_i = d_{i-1} * (r + (cap-r)*sigmoid).
    ordering_cap: float = 1.0       # ratio cap; < 1.0 forces strict depth
                                    # separation between consecutive layers
                                    # (collapse guard for disocclusions).
    # MPI-family knobs (ignored for family="ldi"):
    num_planes: int = 16            # D fronto-parallel planes.
    min_depth: float = 1.0          # nearest plane depth (m).
    max_depth: float = 100.0        # farthest plane depth (m).


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    zbuffer_scale: float = 50.0     # soft z-buffer sharpness (1/temperature).
    splat_method: str = "scatter"   # "scatter" | "sort" (lax paths).
    use_pallas: str = "auto"        # "auto" (MXU Pallas splat kernel on TPU,
                                    # lax elsewhere) | "on" | "off".
    pallas_max_dy: int = 2          # vertical splat window (rows); rectified
                                    # stereo needs <=1; raise (e.g. 16) for
                                    # trajectory sweeps with rotation.
    window_check: bool = True       # warn loudly if the dy window drops
                                    # content (geometry.ldi._warn_window_drop)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    photo_mode: str = "inverse_warp"  # "inverse_warp" | "splat" | "both"
    min_over_layers: bool = True      # per-pixel min over L (layer specializ.)
    min_layer0_margin: float = 0.0    # >0: deep layers win the per-pixel min
                                      # only when they beat layer-0's error
                                      # by this margin (their error is
                                      # handicapped by +margin before the
                                      # min). Anti-offloading lever from the
                                      # r3 toy testbed (BASELINE.md): with a
                                      # plain min, trained hidden layers can
                                      # take over pixels where they are only
                                      # EQUALLY good, releasing layer-0's
                                      # photometric constraint there and
                                      # letting its depth drift; genuinely
                                      # occluded pixels (layer-0 error >>
                                      # margin) still route to deep layers.
    candidate_radius: int = 0         # r>0: min over (2r+1)^2 candidate
                                      # target samples around each projected
                                      # location (min-over-src-candidates).
    ssim_weight: float = 0.0          # alpha in alpha*SSIM + (1-alpha)*L1 on
                                      # the splat composite (0 = pure L1).
    smoothness_weight: float = 0.05
    edge_aware_smoothness: bool = True
    smoothness_edge_gate_deep: bool = True  # False: only layer 0 is gated by
                                      # image edges; hidden layers (>=1) get
                                      # PLAIN smoothness — their surfaces have
                                      # no observed texture edges, and the
                                      # occluder boundary (where the image has
                                      # an edge) is exactly where a hidden
                                      # surface must stay smooth.
    splat_weight: float = 1.0
    inverse_warp_weight: float = 1.0
    depth_supervision_weight: float = 0.0  # >0 only when GT depth (SYNTHIA).
    consistency_weight: float = 0.0   # >0: cross-view depth consistency —
                                      # predict an LDI from the TARGET image
                                      # too, and tie the source LDI's rendered
                                      # target-frame disparity to the target
                                      # LDI's layer-0 (both directions). The
                                      # SURVEY §2 depth-consistency term; the
                                      # lever against photometric depth drift.
    symmetric: bool = False           # with the second (target) prediction,
                                      # also apply the photometric loss in the
                                      # trg->src direction (monodepth-style
                                      # symmetric training).
    consistency_stop_target: bool = False  # treat the other prediction as a
                                      # stop-gradient pseudo-label (prevents
                                      # the mutual-agreement collusion the r3
                                      # sweep measured with the plain term).
    consistency_disocc_only: bool = False  # apply the consistency penalty
                                      # only on disoccluded target pixels
                                      # (source layer-0 coverage == 0) — aim
                                      # the term at hidden-surface geometry.
    consistency_anchor_weight: float = 0.0  # >0: a SECOND consistency term
                                      # on the complementary (visible)
                                      # support — negotiated (no stop-
                                      # target), all layers, always on.
                                      # r3c measured the split: the
                                      # negotiated term anchors layer-0
                                      # (cons_sym abs_rel 0.201 vs base
                                      # 0.229) while the stop-target
                                      # pseudo-label term owns disoccluded
                                      # geometry; giving them disjoint
                                      # supports composes both without the
                                      # anchor renegotiating hidden
                                      # surfaces.
    consistency_deep_only: bool = False  # stop-gradient the SOURCE layer-0
                                      # disparity inside the consistency term
                                      # so its gradient trains only the deep
                                      # (hidden) layers — the r3 sweep
                                      # measured the disocc-only term still
                                      # perturbing layer-0 geometry (abs_rel
                                      # 0.23 -> 0.29 once enabled) even
                                      # though its *mask* is disoccluded
                                      # pixels: layer-0's splat footprint and
                                      # soft-z weight leak into every target
                                      # pixel's normalization.
    consistency_ema_teacher: bool = False  # consistency/anchor targets come
                                      # from an EMA (mean-teacher) copy of
                                      # the params instead of the live
                                      # second prediction. The r3 10k run
                                      # measured live-target collusion the
                                      # 2.5k sweeps could not see: both
                                      # predictions come from ONE network,
                                      # so coherent drift satisfies any
                                      # mutual-agreement term — abs_rel
                                      # slid 0.18 -> 0.36 after step 5k at
                                      # flat PSNR. A teacher averaged over
                                      # the last ~1/(1-decay) steps cannot
                                      # follow the slide, so the terms pull
                                      # the student back instead.
    consistency_ema_decay: float = 0.999  # teacher horizon ~1000 steps: the
                                      # measured slide is ~4e-5 abs_rel per
                                      # step, so a short-horizon teacher
                                      # trails close enough to follow it;
                                      # ~1000 steps both resists the slide
                                      # and tracks genuine improvement.
    photo_layer0_weight: float = 0.0  # >0: an ADDITIONAL inverse-warp
                                     # photometric term on the layer-0-only
                                     # truncated LDI. Anti-drift mechanism
                                     # (BASELINE.md r3 toy testbed): with
                                     # min-over-layers, trained hidden
                                     # layers can absorb layer-0's
                                     # photometric job and let it drift —
                                     # this term makes that offloading
                                     # unprofitable (layer 0 must explain
                                     # the visible scene by itself). Costs
                                     # charbonnier error on the few % of
                                     # pixels occluded in the other view
                                     # (no deeper layer to forgive them).
    consistency_stop_step: int = 0   # >0: DROP the disocc pseudo-label term
                                     # (consistency_weight) after this step,
                                     # keeping the anchor. The toy testbed
                                     # (BASELINE.md r3) shows the pseudo-label
                                     # both trains hidden-layer geometry (occ
                                     # abs_rel 10 -> 0.06 vs anchor-only) AND
                                     # drives the late layer-0 drift through
                                     # the shared trunk (0.275->0.454 vs flat
                                     # 0.24 without it) — a mid-training
                                     # window takes the first without the
                                     # second.
    consistency_start_step: int = 0   # >0: enable the consistency term only
                                      # from this step on (a second compiled
                                      # step, same mechanism as staged
                                      # training) — pseudo-labels from a
                                      # freshly-initialized network are
                                      # noise, and the r3 sweep measured the
                                      # from-step-0 arms paying ~2 dB PSNR
                                      # for it (BASELINE.md r3 experiments).


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"       # "synthetic" | "kitti" | "synthia"
    root: str = ""                   # dataset root directory on disk.
    height: int = 256
    width: int = 768
    batch_size: int = 8              # global batch (split across data mesh).
    augment: bool = True
    split: str = "all"               # "train" | "val" | "all"; the val split
                                     # holds out whole drives/sequences (or a
                                     # disjoint seed range for synthetic).
    val_fraction: float = 0.1        # fraction of groups held out as val.
    shuffle_buffer: int = 512
    prefetch: int = 2                # device-side double buffering depth.
    kitti_pairs: str = "stereo"      # "stereo" | "temporal" (OXTS ego-motion)
    temporal_stride: int = 1         # frame gap for temporal pairs.
    synthetic_scene: str = "two_plane"  # "two_plane" | "multi" (2-4 boxes,
                                        # slanted bg, SE(3) pose jitter).


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    max_steps: int = 100_000
    warmup_steps: int = 500
    lr_end_factor: float = 0.1       # cosine end LR = learning_rate * this.
                                     # Lower (e.g. 0.005) freezes late
                                     # training — one candidate lever against
                                     # the late depth drift (BASELINE.md toy
                                     # testbed).
    decay_steps: int = 0             # cosine-decay horizon; 0 => max_steps.
                                     # Must be pinned to the TRUE run length
                                     # when a long run is split into segments
                                     # (scripts/train_chunked.py does this
                                     # automatically) — otherwise each
                                     # segment would rebuild the schedule
                                     # from its clamped max_steps and the LR
                                     # would sawtooth across segments.
    grad_clip_norm: float = 10.0
    checkpoint_dir: str = "/tmp/lsi_tpu_ckpt"
    checkpoint_every: int = 2000
    max_to_keep: int = 5
    log_every: int = 100
    eval_every: int = 0              # >0: run a held-out eval every N steps
                                     # (metrics to jsonl + image grid dump).
    eval_batches: int = 4            # batches averaged per in-training eval.
    drift_warn_threshold: float = 0.15  # in-training failure detection for
                                     # the r3 finding that layer-0 depth can
                                     # drift while PSNR stays flat: each eval
                                     # logs eval_abs_rel_drift (= abs_rel
                                     # above the run's best so far, tracked
                                     # across chunked segments via the
                                     # train.jsonl history) and warns when
                                     # it exceeds this. 0 disables.
    seed: int = 0
    remat_decoder: bool = False      # jax.checkpoint on decoder (512x1536).
    profile_dir: str = ""            # non-empty => jax.profiler traces.
    stage_layer0_steps: int = 0      # >0: staged layer training (SURVEY §7
                                     # hard-part 5) — for the first N steps
                                     # the loss sees only layer 0 (deep heads
                                     # get no gradient), booting a clean
                                     # visible-surface estimate before deeper
                                     # layers join.
    freeze_layer0_step: int = 0      # >0: from this step on, every parameter
                                     # layer-0's output depends on (UNet
                                     # trunk + the layer-0 channels of the
                                     # heads) gets a ZERO update — deep-layer
                                     # heads keep training. The closing
                                     # bracket of staged training (boot
                                     # layer-0 first via stage_layer0_steps,
                                     # pin it late via this): late layer-0
                                     # depth drift is impossible by
                                     # construction while hidden-surface
                                     # learning continues. Set to the
                                     # post-warmup abs_rel minimum (~50% of
                                     # the horizon on the toy testbed,
                                     # BASELINE.md). LDI family only.
    save_best_params: bool = True    # each in-training eval that improves
                                     # eval_abs_rel exports the params to
                                     # <checkpoint_dir>/best_params.npz (+
                                     # best_params.json sidecar with step +
                                     # value) — automated best-checkpoint
                                     # selection (the measured drift
                                     # mitigation), outside the orbax
                                     # rotation so max_to_keep can't evict
                                     # it; the sidecar seeds the tracker
                                     # across chunked-run segments. No-op
                                     # when eval_every == 0.
    freeze_layer0_from_best: bool = False  # with freeze_layer0_step > 0: at
                                     # the freeze boundary, splice the
                                     # best_params.npz values into every
                                     # entry layer-0 depends on (deep heads
                                     # keep their live values and keep
                                     # training), THEN freeze. Layer-0 =
                                     # the best geometry the run measured,
                                     # made immutable — robust to transient
                                     # collapses a fixed-step freeze would
                                     # pin (r4 flagship run, BASELINE.md).
                                     # If no best export exists at the
                                     # boundary (or eval cannot produce
                                     # eval_abs_rel at all — no GT depth in
                                     # the eval data), the run FAILS FAST:
                                     # at the first eval for the missing
                                     # metric, at the boundary for the
                                     # missing export — silently freezing
                                     # the live params instead would be
                                     # exactly the fixed-step failure this
                                     # flag exists to prevent (r4 flagship
                                     # run). Set freeze_fallback_live=True
                                     # to opt into the old fallback.
    freeze_fallback_live: bool = False  # with freeze_layer0_from_best: at
                                     # the boundary, fall back to freezing
                                     # the LIVE params (warning, no error)
                                     # when no best export exists, and
                                     # tolerate GT-free eval. For operators
                                     # who want best-effort splicing on
                                     # datasets where GT depth may be
                                     # missing.
    collapse_rollback_threshold: float = 0.0  # >0: in-training failure
                                     # RESPONSE to a transient geometry
                                     # collapse (r4 flagship finding: layer-0
                                     # disparity slid to the far plane at
                                     # ~step 2000 — abs_rel 3.54 vs best
                                     # 0.206 — and although training climbed
                                     # back out, PSNR never recovered its
                                     # pre-collapse level). When an eval's
                                     # eval_abs_rel_drift (= abs_rel above
                                     # the run's best) exceeds this
                                     # threshold, the trainer restores ALL
                                     # params from best_params.npz and
                                     # resets the optimizer (fresh Adam
                                     # moments; the LR schedule replays its
                                     # warmup from the rollback, shifting
                                     # the cosine tail by the rollback
                                     # step). Requires save_best_params +
                                     # eval_every > 0. Set well above
                                     # drift_warn_threshold (warn at slow
                                     # drift, roll back only on collapse);
                                     # the measured r4 collapse was drift
                                     # 3.33 vs the 0.15 warn level. 0 off.
    collapse_max_rollbacks: int = 2  # rollback budget per run (tracked in
                                     # <checkpoint_dir>/rollback_state.json,
                                     # so chunked segments share it): a run
                                     # that keeps collapsing past the budget
                                     # continues WITHOUT further rollbacks
                                     # (warning) — repeated collapse is a
                                     # recipe problem, not a transient.
    skip_nonfinite_updates: bool = True  # optax.apply_if_finite: a step with
                                     # inf/nan grads is SKIPPED (params/opt
                                     # state untouched) instead of poisoning
                                     # the run; the NaN halt guard still
                                     # fires if 100 consecutive steps fail.


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    render: RenderConfig = RenderConfig()
    loss: LossConfig = LossConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _cfg(**kw) -> Config:
    return Config(**kw)


# The five BASELINE.json evaluation configurations as named presets, plus
# the synthetic sanity experiment (the paper's two-plane overfit setting).
PRESETS = {
    # 0: synthetic sanity — train on analytic two-plane stereo scenes with
    #    GT depth available for eval (the fastest end-to-end check).
    "synthetic_sanity": _cfg(
        model=ModelConfig(num_layers=2, base_filters=16, num_scales=4),
        render=RenderConfig(zbuffer_scale=30.0),
        loss=LossConfig(photo_mode="both", smoothness_weight=0.01),
        data=DataConfig(dataset="synthetic", height=128, width=256,
                        batch_size=8),
        train=TrainConfig(learning_rate=5e-4, warmup_steps=20,
                          max_steps=2000),
    ),
    # 1: single KITTI stereo pair, 2-layer LDI + inverse-warp view synthesis
    #    @256x768 (the CPU denominator config).
    "kitti_ldi2": _cfg(
        model=ModelConfig(num_layers=2),
        loss=LossConfig(photo_mode="inverse_warp"),
        data=DataConfig(dataset="kitti", height=256, width=768, batch_size=1),
    ),
    # KITTI training with the r3 quality recipe (the anchor_occ sweep
    # winner; see `synthetic_multi` and BASELINE.md r3 experiments).
    # Costs ~2x a single-prediction step (two LDIs per pair + two
    # consistency renders) — the BASELINE perf configs above keep their
    # original single-prediction losses so benchmark numbers stay
    # comparable across rounds; reach for THIS preset when training for
    # geometry quality on real stereo data.
    "kitti_ldi3_quality": _cfg(
        model=ModelConfig(num_layers=3, layer0_texture_from_input=False),
        render=RenderConfig(pallas_max_dy=8),
        loss=LossConfig(photo_mode="both", smoothness_weight=0.01,
                        symmetric=True,
                        consistency_anchor_weight=0.5,
                        consistency_weight=0.5,
                        consistency_stop_target=True,
                        consistency_disocc_only=True,
                        consistency_deep_only=True,
                        consistency_start_step=500,
                        # Anti-offloading margin (r4 winner `margin_freeze`,
                        # BASELINE.md r4 synthesis): deep layers win a pixel
                        # only by beating layer-0 by > margin, so layer-0
                        # keeps its photometric constraint on tie pixels —
                        # best measured layer-0 depth at intact occ quality.
                        min_layer0_margin=0.02),
        data=DataConfig(dataset="kitti", height=256, width=768,
                        batch_size=8),
        # Late layer-0 freeze at 50% horizon (the r4 winner's second half):
        # zero late drift by construction while the disocc pseudo-label
        # keeps training the hidden layers — supersedes the r3 window
        # schedule (consistency_stop_step), whose drift reduction came from
        # killing that signal. Scale with max_steps if you change it.
        # freeze_layer0_from_best: the r4 flagship run showed a fixed-step
        # freeze can pin the half-recovered tail of a transient collapse
        # (abs_rel 0.43 vs the run's best 0.21); splicing the best export
        # at the boundary pins the best measured geometry instead.
        train=TrainConfig(learning_rate=5e-4, warmup_steps=50,
                          eval_every=2000,
                          freeze_layer0_step=50_000,
                          freeze_layer0_from_best=True),
    ),
    # 2: SYNTHIA 2-layer, forward splatting + soft z-buffer compositing.
    "synthia_ldi2_splat": _cfg(
        model=ModelConfig(num_layers=2),
        loss=LossConfig(photo_mode="splat",
                        depth_supervision_weight=0.1),
        data=DataConfig(dataset="synthia", height=256, width=768,
                        batch_size=8),
    ),
    # 3: 3-layer LDI with per-layer texture prediction, batched KITTI eval.
    "kitti_ldi3_b16": _cfg(
        model=ModelConfig(num_layers=3, layer0_texture_from_input=False),
        loss=LossConfig(photo_mode="both"),
        data=DataConfig(dataset="kitti", height=256, width=768,
                        batch_size=16),
    ),
    # 4: high-res 512x1536 inference + forward-splat render, batch 64.
    # batch_size is GLOBAL (sharded over the mesh data axis): b64
    # INFERENCE fits one chip (49.7 fps, BASELINE.md), but the b64
    # remat TRAINING step needs a measured 30.67 GB HBM program vs the
    # 16 GB chip (scripts/bench_highres_b64.py, r3) — train this preset
    # on a >=2-chip slice (b8/chip x 8 measured at 1.6 steps/s/chip).
    "highres_b64": _cfg(
        model=ModelConfig(num_layers=2),
        render=RenderConfig(splat_method="scatter"),
        loss=LossConfig(photo_mode="splat"),
        data=DataConfig(dataset="kitti", height=512, width=1536,
                        batch_size=64),
        train=TrainConfig(remat_decoder=True),
    ),
    # 7: multi-object synthetic stress — 2-4 boxes at varying depths over a
    #    slanted background, SE(3) pose jitter incl. rotation; 3-layer LDI
    #    with predicted textures (the setting that actually exercises layer
    #    specialization and disocclusion inpainting).
    #    Loss recipe = the r3 quality-sweep winner `anchor_occ`
    #    (BASELINE.md r3 experiments; 20 arms): symmetric photometric +
    #    disjoint-support consistency — negotiated anchor on visible
    #    pixels (layer-0 anti-drift) + stop-target deep-only pseudo-label
    #    on disoccluded pixels (hidden-surface geometry), warm-up 500.
    "synthetic_multi": _cfg(
        model=ModelConfig(num_layers=3, base_filters=16, num_scales=4,
                          layer0_texture_from_input=False),
        render=RenderConfig(zbuffer_scale=30.0, pallas_max_dy=8),
        loss=LossConfig(photo_mode="both", smoothness_weight=0.01,
                        symmetric=True,
                        consistency_anchor_weight=0.5,
                        consistency_weight=0.5,
                        consistency_stop_target=True,
                        consistency_disocc_only=True,
                        consistency_deep_only=True,
                        consistency_start_step=500,
                        # r4: anti-offloading margin (see
                        # kitti_ldi3_quality). No late freeze here: the 5k
                        # horizon predates the measured drift onset (~5k);
                        # for longer runs add
                        # train.freeze_layer0_step ~= 50% of max_steps
                        # (the measured winner's schedule).
                        min_layer0_margin=0.02),
        data=DataConfig(dataset="synthetic", synthetic_scene="multi",
                        height=128, width=256, batch_size=8),
        train=TrainConfig(learning_rate=5e-4, warmup_steps=50,
                          max_steps=5000),
    ),
    # 6: layered-planes (MPI) baseline — the reference's plane-based
    #    baseline experiments, trainable end-to-end for LDI-vs-planes
    #    comparisons on the same eval batches. Gather-only render.
    "mpi_baseline": _cfg(
        model=ModelConfig(family="mpi", num_planes=16, base_filters=16,
                          num_scales=4, min_depth=1.0, max_depth=100.0),
        loss=LossConfig(photo_mode="splat", smoothness_weight=0.01),
        data=DataConfig(dataset="synthetic", height=128, width=256,
                        batch_size=8),
        train=TrainConfig(learning_rate=5e-4, warmup_steps=20,
                          max_steps=2000),
    ),
    # 5: camera-trajectory sweep — one LDI rendered to 60 novel views
    #    (rotation sweeps need a wide vertical splat window).
    "trajectory_sweep": _cfg(
        model=ModelConfig(num_layers=2),
        render=RenderConfig(pallas_max_dy=16),
        data=DataConfig(dataset="synthetic", height=256, width=768,
                        batch_size=1),
    ),
}


def get_config(name: str) -> Config:
    if name not in PRESETS:
        raise KeyError(
            f"unknown config preset {name!r}; available: {sorted(PRESETS)}")
    return PRESETS[name]
