"""LDI predictor model: shapes, ordering constraint, dtype policy, API."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsi_tpu.api import LSIModel, default_intrinsics, predict_ldi, render
from lsi_tpu.config import Config, ModelConfig
from lsi_tpu.geometry import transforms
from lsi_tpu.models.ldi_predictor import LDIPredictor


@pytest.fixture(scope="module")
def small_cfg():
    return ModelConfig(num_layers=2, base_filters=8, num_scales=3,
                       compute_dtype="float32")


@pytest.fixture(scope="module")
def model_and_params(small_cfg):
    model = LDIPredictor(small_cfg)
    img = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.key(0), img,
                           default_intrinsics(1, 32, 48))
    return model, variables["params"]


def test_output_layouts(model_and_params, rng):
    model, params = model_and_params
    img = jnp.asarray(rng.uniform(size=(2, 32, 48, 3)), jnp.float32)
    ldi = model.apply({"params": params}, img, default_intrinsics(2, 32, 48))
    assert ldi.textures.shape == (2, 2, 32, 48, 3)
    assert ldi.disparities.shape == (2, 2, 32, 48, 1)
    assert ldi.intrinsics.shape == (2, 3, 3)
    assert ldi.textures.dtype == jnp.float32
    assert ldi.disparities.dtype == jnp.float32


def test_layer0_texture_is_input(model_and_params, rng):
    model, params = model_and_params
    img = jnp.asarray(rng.uniform(size=(1, 32, 48, 3)), jnp.float32)
    ldi = model.apply({"params": params}, img, default_intrinsics(1, 32, 48))
    np.testing.assert_allclose(np.asarray(ldi.textures[:, 0]),
                               np.asarray(img), atol=1e-6)


def test_disparity_ordering_and_range(model_and_params, rng):
    model, params = model_and_params
    img = jnp.asarray(rng.uniform(size=(1, 32, 48, 3)), jnp.float32)
    ldi = model.apply({"params": params}, img, default_intrinsics(1, 32, 48))
    d = np.asarray(ldi.disparities)
    assert (d > 0).all()
    assert (d <= 1.0 + 1e-6).all()
    # strict ordering: deeper layer -> smaller disparity everywhere
    assert (d[:, 1] < d[:, 0]).all()


def test_three_layer_predicted_textures(rng):
    cfg = ModelConfig(num_layers=3, base_filters=8, num_scales=2,
                      layer0_texture_from_input=False,
                      compute_dtype="float32")
    model = LDIPredictor(cfg)
    img = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(1), img,
                           default_intrinsics(1, 16, 16))
    ldi = model.apply(variables, img, default_intrinsics(1, 16, 16))
    assert ldi.textures.shape == (1, 3, 16, 16, 3)
    d = np.asarray(ldi.disparities)
    assert (d[:, 1] < d[:, 0]).all() and (d[:, 2] < d[:, 1]).all()
    t = np.asarray(ldi.textures)
    assert (t >= 0).all() and (t <= 1).all()


def test_bf16_compute_f32_outputs(rng):
    cfg = ModelConfig(num_layers=2, base_filters=8, num_scales=2,
                      compute_dtype="bfloat16")
    model = LDIPredictor(cfg)
    img = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(2), img,
                           default_intrinsics(1, 16, 16))
    # params stay f32
    leaves = jax.tree.leaves(variables["params"])
    assert all(x.dtype == jnp.float32 for x in leaves)
    ldi = model.apply(variables, img, default_intrinsics(1, 16, 16))
    assert ldi.disparities.dtype == jnp.float32


def test_api_end_to_end(rng):
    cfg = Config(model=ModelConfig(num_layers=2, base_filters=8, num_scales=3,
                                   compute_dtype="float32"))
    model = LSIModel.init(jax.random.key(0), cfg, height=32, width=48)
    img = jnp.asarray(rng.uniform(size=(1, 32, 48, 3)), jnp.float32)
    ldi = model.predict_ldi(img)
    assert ldi.textures.shape == (1, 2, 32, 48, 3)
    pose = transforms.translation_pose(np.array([[0.05, 0, 0]], np.float32))
    novel = model.render(ldi, pose)
    assert novel.shape == (1, 32, 48, 3)
    assert np.isfinite(np.asarray(novel)).all()
    # functional forms. On TPU the two paths compile (and fuse) separately
    # and the UNet convs run at the MXU's DEFAULT precision by the repo's
    # numerics policy (docs/parity.md: network convs DEFAULT, geometry and
    # render kernels f32-exact), so bf16-rounding differences up to ~1e-3
    # are expected; on CPU both are f32-exact.
    tol = 4e-3 if jax.default_backend() == "tpu" else 1e-5
    ldi2 = predict_ldi(img, model.params, cfg.model)
    np.testing.assert_allclose(np.asarray(ldi2.disparities),
                               np.asarray(ldi.disparities), atol=tol)
    novel2 = render(ldi, pose)
    np.testing.assert_allclose(np.asarray(novel2), np.asarray(novel),
                               atol=tol)


def test_single_layer_ldi(rng):
    """L=1 degenerates to plain single-image depth prediction."""
    cfg = ModelConfig(num_layers=1, base_filters=8, num_scales=2,
                      compute_dtype="float32")
    model = LDIPredictor(cfg)
    img = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(3), img,
                           default_intrinsics(1, 16, 16))
    ldi = model.apply(variables, img, default_intrinsics(1, 16, 16))
    assert ldi.textures.shape == (1, 1, 16, 16, 3)
    assert ldi.disparities.shape == (1, 1, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(ldi.textures[:, 0]),
                               np.asarray(img), atol=1e-6)
    # renders fine
    from lsi_tpu.geometry.ldi import render_forward
    pose = transforms.translation_pose(np.array([[0.05, 0, 0]], np.float32))
    out = render_forward(ldi, pose)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_lsimodel_save_load_roundtrip(rng, tmp_path):
    """Single-file serving export: config + params reload bit-exact and
    produce identical predictions."""
    import jax
    import jax.numpy as jnp

    from lsi_tpu.api import LSIModel
    from lsi_tpu.config import Config, ModelConfig

    cfg = Config(model=ModelConfig(num_layers=2, base_filters=8,
                                   num_scales=2, compute_dtype="float32"))
    m = LSIModel.init(jax.random.key(3), cfg, height=16, width=32)
    path = str(tmp_path / "model.npz")
    m.save(path)
    m2 = LSIModel.load(path)
    assert m2.config == m.config
    img = jnp.asarray(rng.uniform(size=(1, 16, 32, 3)), jnp.float32)
    a = m.predict_ldi(img)
    b = m2.predict_ldi(img)
    np.testing.assert_array_equal(np.asarray(a.textures),
                                  np.asarray(b.textures))
    np.testing.assert_array_equal(np.asarray(a.disparities),
                                  np.asarray(b.disparities))


def test_deep_heads_stopgrad_trunk_isolation(rng):
    """deep_heads_stopgrad_trunk: a deep-layer-only loss produces ZERO
    gradient on the UNet trunk and on layer-0's outputs (both the feature
    path and the multiplicative ordering chain are cut), while a
    layer-0-only loss still trains the trunk. Ordering still holds."""
    from lsi_tpu.config import ModelConfig
    from lsi_tpu.models.ldi_predictor import LDIPredictor

    cfg = ModelConfig(num_layers=3, base_filters=4, num_scales=2,
                      layer0_texture_from_input=False,
                      deep_heads_stopgrad_trunk=True,
                      compute_dtype="float32")
    model = LDIPredictor(cfg)
    img = jnp.asarray(rng.uniform(size=(1, 16, 32, 3)), jnp.float32)
    K = jnp.asarray(np.array([[28.8, 0, 15.5], [0, 28.8, 7.5],
                              [0, 0, 1]], np.float32)[None])
    params = model.init(jax.random.key(0), img, K)["params"]

    ldi = model.apply({"params": params}, img, K)
    d = np.asarray(ldi.disparities)[..., 0]
    assert (d[:, 1] <= d[:, 0] + 1e-6).all()      # ordering intact
    assert (d[:, 2] <= d[:, 1] + 1e-6).all()

    def deep_loss(p):
        out = model.apply({"params": p}, img, K)
        return (jnp.sum(out.disparities[:, 1:] ** 2)
                + jnp.sum(out.textures[:, 1:] ** 2))

    def l0_loss(p):
        out = model.apply({"params": p}, img, K)
        return jnp.sum(out.disparities[:, 0] ** 2)

    g_deep = jax.grad(deep_loss)(params)
    g_l0 = jax.grad(l0_loss)(params)
    flat_deep = jax.tree_util.tree_flatten_with_path(g_deep)[0]
    trunk_deep = [np.abs(np.asarray(v)).max() for kp, v in flat_deep
                  if "UNet" in str(kp)]
    head_deep = [np.abs(np.asarray(v)).max() for kp, v in flat_deep
                 if "deep" in str(kp)]
    assert max(trunk_deep) == 0.0, "deep loss leaked into the trunk"
    assert max(head_deep) > 0.0, "deep heads get no signal"
    trunk_l0 = [np.abs(np.asarray(v)).max()
                for kp, v in jax.tree_util.tree_flatten_with_path(g_l0)[0]
                if "UNet" in str(kp)]
    assert max(trunk_l0) > 0.0, "layer-0 loss must still train the trunk"
