"""Gradient accumulation (optax.MultiSteps wiring, reference
accumulate_grad_batches train.py:196)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvd_tpu.config import OptimizerConfig
from mvd_tpu.train import TrainState, make_optimizer


def test_multisteps_accumulates():
    params = {"params": {"w": jnp.ones((4,))}}
    tx = make_optimizer(
        OptimizerConfig(learning_rate=0.1, warmup_fraction=0.0),
        params,
        total_steps=10,
        train_denoising_unet=True,  # make 'w' trainable
        grad_accum_steps=2,
    )
    state = TrainState.create(params, tx)
    g = {"params": {"w": jnp.ones((4,))}}
    s1 = state.apply_gradients(g)
    # first micro-step: update withheld
    np.testing.assert_array_equal(np.asarray(s1.params["params"]["w"]), 1.0)
    s2 = s1.apply_gradients(g)  # first real update (lr still 0: warmup)
    s3 = s2.apply_gradients(g)
    np.testing.assert_array_equal(np.asarray(s3.params["params"]["w"]),
                                  np.asarray(s2.params["params"]["w"]))
    s4 = s3.apply_gradients(g)  # second real update: lr > 0
    assert not np.allclose(
        np.asarray(s4.params["params"]["w"]), np.asarray(s3.params["params"]["w"])
    )
