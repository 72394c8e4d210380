"""TPU training smoke: overfit synthetic scenes through the Pallas render.

Runs a few hundred sharded train steps (photo_mode=both so both the gather
and the Pallas-splat loss paths train), prints the loss curve and final
eval PSNR/depth metrics. Validates: custom_vjp through the Pallas kernel
under jit on real hardware, optimizer, NaN guard, metrics.
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from lsi_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                            RenderConfig, TrainConfig)
from lsi_tpu.data.pipeline import make_dataset
from lsi_tpu.evaluation.metrics import depth_metrics, psnr
from lsi_tpu.geometry.ldi import render_forward
from lsi_tpu.models.ldi_predictor import LDIPredictor
from lsi_tpu.parallel.mesh import make_mesh_plan
from lsi_tpu.train.trainer import create_state, make_train_step


def main(steps=300, use_pallas=True):
    cfg = Config(
        model=ModelConfig(num_layers=2, base_filters=16, num_scales=4,
                          compute_dtype="bfloat16"),
        render=RenderConfig(zbuffer_scale=30.0, use_pallas=use_pallas),
        loss=LossConfig(photo_mode="both", smoothness_weight=0.01),
        data=DataConfig(dataset="synthetic", height=128, width=256,
                        batch_size=8, prefetch=2),
        train=TrainConfig(learning_rate=5e-4, warmup_steps=20,
                          max_steps=steps),
    )
    plan = make_mesh_plan()
    print(f"devices: {plan.num_devices}, pallas={use_pallas}", flush=True)
    step_fn = make_train_step(cfg, plan)
    state = plan.replicate(create_state(cfg, jax.random.key(0)))
    it = make_dataset(cfg.data, seed=0, sharding=plan.batch_sharding())

    t0 = time.time()
    for step in range(steps):
        batch = next(it)
        state, metrics = step_fn(state, batch)
        if step % 25 == 0 or step == steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {step:4d} total={m['total']:.4f} "
                  f"inv={m.get('photo_inverse_warp', 0):.4f} "
                  f"splat={m.get('photo_splat', 0):.4f} "
                  f"({(time.time()-t0):.1f}s)", flush=True)
            assert np.isfinite(m["total"]), m

    # eval: render quality + layer-0 depth accuracy on fresh scenes
    model = LDIPredictor(cfg.model)

    @jax.jit
    def eval_fn(params, batch):
        ldi = model.apply({"params": params}, batch.src_image,
                          batch.intrinsics)
        out = render_forward(ldi, batch.pose_src2trg,
                             zbuffer_scale=30.0, use_pallas=use_pallas)
        return (psnr(out["rgb"], batch.trg_image),
                depth_metrics(ldi.disparities[:, 0], batch.gt_disparity,
                              batch.gt_valid))

    ev = make_dataset(cfg.data, seed=999, sharding=plan.batch_sharding())
    ps, dm = eval_fn(jax.device_get(state).params, next(ev))
    print(f"eval PSNR={float(ps):.2f} dB  abs_rel={float(dm['abs_rel']):.4f}"
          f"  d1.25={float(dm['delta_1.25']):.3f}", flush=True)


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    main(steps)
