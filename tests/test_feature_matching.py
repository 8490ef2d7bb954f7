"""Feature-matching auxiliary loss (BASELINE config 5).

The frozen UNet doubles as the feature-matching tower: per-block features
of the differentiable x0-hat are matched against the target latents'
features (train/losses.py:feature_matching_loss, wired in
train/step.py:make_loss_fn behind LossConfig.feature_matching_weight).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvd_tpu.config import TINY_MODEL, LossConfig, OptimizerConfig, TrainConfig
from mvd_tpu.pipeline import MVDPipeline
from mvd_tpu.train.losses import feature_matching_loss
from mvd_tpu.train.step import make_loss_fn


@pytest.fixture(scope="module")
def setup():
    pipe = MVDPipeline.create(TINY_MODEL, jax.random.PRNGKey(0))
    cfg = TrainConfig(
        model=TINY_MODEL,
        loss=LossConfig(),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        batch_size=2,
        image_size=TINY_MODEL.unet.sample_size * 8,
    )
    hw = TINY_MODEL.unet.sample_size * 8
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = {  # flat rows (N, ...) — make_loss_fn's contract
        "source_image": jax.random.uniform(ks[0], (2, hw, hw, 3), minval=-1, maxval=1),
        "target_image": jax.random.uniform(ks[1], (2, hw, hw, 3), minval=-1, maxval=1),
        "source_camera": jnp.tile(jnp.eye(4), (2, 1, 1)),
        "target_camera": jnp.tile(jnp.eye(4), (2, 1, 1)),
        "input_ids": jnp.ones((2, 77), jnp.int32),
    }
    frozen = {"vae": pipe.params["vae"], "text_encoder": pipe.params["text_encoder"]}
    return pipe, cfg, batch, frozen


def test_identical_features_give_zero():
    feats = {"a": jnp.ones((1, 4, 8)), "b": jnp.full((1, 2, 3), 2.0)}
    assert float(feature_matching_loss(feats, feats)) == 0.0


def test_block_normalization_balances_scales():
    # a wide/large-magnitude block must not dominate: each block's error is
    # normalized by the target feature variance
    k = jax.random.PRNGKey(0)
    t_small = jax.random.normal(k, (1, 8, 4)) * 0.01
    t_big = jax.random.normal(k, (1, 8, 4)) * 100.0
    l_small = feature_matching_loss({"x": t_small * 1.1}, {"x": t_small})
    l_big = feature_matching_loss({"x": t_big * 1.1}, {"x": t_big})
    np.testing.assert_allclose(float(l_small), float(l_big), rtol=1e-4)


def test_weight_zero_is_reference_objective(setup):
    pipe, cfg, batch, frozen = setup
    rng = jax.random.PRNGKey(7)
    loss0 = make_loss_fn(pipe, pipe.schedule, cfg)
    l0, m0 = loss0(pipe.params["mvd"], frozen, batch, rng)
    assert "feature_matching_loss" not in m0
    np.testing.assert_allclose(float(l0), float(m0["noise_loss"]))


def test_feature_matching_adds_term_and_gradients(setup):
    pipe, cfg, batch, frozen = setup
    rng = jax.random.PRNGKey(7)
    w = 0.25
    cfg_fm = dataclasses.replace(cfg, loss=LossConfig(feature_matching_weight=w))
    loss0 = make_loss_fn(pipe, pipe.schedule, cfg)
    loss1 = make_loss_fn(pipe, pipe.schedule, cfg_fm)

    l0, m0 = loss0(pipe.params["mvd"], frozen, batch, rng)
    l1, m1 = loss1(pipe.params["mvd"], frozen, batch, rng)
    fm = float(m1["feature_matching_loss"])
    assert np.isfinite(fm) and fm > 0.0
    # same rng -> identical pure noise objective; total adds w * fm
    np.testing.assert_allclose(float(m1["noise_loss"]), float(m0["noise_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(l1), float(m1["noise_loss"]) + w * fm, rtol=1e-5)

    # the aux term reshapes the gradient on the trainable (adapter) params
    def scalar(fn):
        return lambda p: fn(p, frozen, batch, rng)[0]

    g0 = jax.grad(scalar(loss0))(pipe.params["mvd"])
    g1 = jax.grad(scalar(loss1))(pipe.params["mvd"])
    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves1)
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(leaves0, leaves1))
    assert diff > 0.0
