"""Checkpoint conversion + orbax IO tests.

Converter strategy in a hermetic env (no diffusers): (a) round-trip — our
params -> torch-style state dict -> back — must be the identity; (b)
synthetic torch state dicts with the reference naming convert into trees
that match our init params leaf-for-leaf (paths AND shapes); (c) a torch
Conv2d/Linear forward parity check validates the layout transposes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch
from flax.traverse_util import flatten_dict

from mvd_tpu.config import TINY_CLIP, TINY_MODEL, TINY_UNET, TINY_VAE
from mvd_tpu.checkpoint import (
    CheckpointManager,
    convert_clip_text_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
    export_unet_state_dict,
    split_lightning_state_dict,
)
from mvd_tpu.nn import AutoencoderKL, CLIPTextEncoder, UNet2DCondition


def tiny_unet_params():
    model = UNet2DCondition(TINY_UNET)
    hw = TINY_UNET.sample_size
    sample = jnp.zeros((1, hw, hw, 4))
    ctx = jnp.zeros((1, 77, TINY_UNET.cross_attention_dim))
    return model.init(jax.random.PRNGKey(0), sample, jnp.array(0), ctx)


def test_unet_roundtrip_identity():
    params = tiny_unet_params()
    sd = export_unet_state_dict(params["params"])
    back, skipped = convert_unet_state_dict(sd)
    flat_a = flatten_dict(params["params"])
    flat_b = flatten_dict(back)
    assert set(flat_a) == set(flat_b), (
        set(flat_a) - set(flat_b), set(flat_b) - set(flat_a))
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k], err_msg=str(k))


def test_exported_names_look_like_diffusers():
    params = tiny_unet_params()
    sd = export_unet_state_dict(params["params"])
    keys = set(sd)
    assert "conv_in.weight" in keys
    assert "down_blocks.0.resnets.0.norm1.weight" in keys
    assert "down_blocks.0.attentions.0.proj_in.weight" in keys
    assert (
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight" in keys
    )
    assert (
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor.to_q_ref.weight"
        in keys
    )
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in keys
    assert "mid_block.attentions.0.transformer_blocks.0.attn2.to_k.weight" in keys
    assert "up_blocks.1.attentions.2.transformer_blocks.0.norm3.weight" in keys
    assert "time_embedding.linear_1.weight" in keys
    # conv weights exported OIHW
    assert sd["conv_in.weight"].shape == (TINY_UNET.block_out_channels[0], 4, 3, 3)


def test_conv_linear_layout_transform_parity():
    """Converted conv/linear weights produce identical outputs in flax."""
    from flax import linen as nn

    tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = np.random.default_rng(0).standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()

    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    bias = tconv.bias.detach().numpy()
    fconv = nn.Conv(8, (3, 3), padding=1)
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
    got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
    )

    tlin = torch.nn.Linear(6, 4)
    y = np.random.default_rng(1).standard_normal((2, 6)).astype(np.float32)
    with torch.no_grad():
        want = tlin(torch.from_numpy(y)).numpy()
    flin = nn.Dense(4)
    params = {
        "params": {
            "kernel": jnp.asarray(tlin.weight.detach().numpy().T),
            "bias": jnp.asarray(tlin.bias.detach().numpy()),
        }
    }
    np.testing.assert_allclose(np.asarray(flin.apply(params, y)), want, atol=1e-5)


def test_clip_converter_matches_init_structure():
    enc = CLIPTextEncoder(TINY_CLIP)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    want = flatten_dict(params["params"])

    cfg = TINY_CLIP
    sd = {}
    sd["text_model.embeddings.token_embedding.weight"] = np.zeros(
        (cfg.vocab_size, cfg.hidden_size), np.float32
    )
    sd["text_model.embeddings.position_embedding.weight"] = np.zeros(
        (cfg.max_length, cfg.hidden_size), np.float32
    )
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}."
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[p + f"self_attn.{proj}.weight"] = np.zeros(
                (cfg.hidden_size, cfg.hidden_size), np.float32
            )
            sd[p + f"self_attn.{proj}.bias"] = np.zeros((cfg.hidden_size,), np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[p + ln + ".weight"] = np.ones((cfg.hidden_size,), np.float32)
            sd[p + ln + ".bias"] = np.zeros((cfg.hidden_size,), np.float32)
        sd[p + "mlp.fc1.weight"] = np.zeros(
            (cfg.intermediate_size, cfg.hidden_size), np.float32
        )
        sd[p + "mlp.fc1.bias"] = np.zeros((cfg.intermediate_size,), np.float32)
        sd[p + "mlp.fc2.weight"] = np.zeros(
            (cfg.hidden_size, cfg.intermediate_size), np.float32
        )
        sd[p + "mlp.fc2.bias"] = np.zeros((cfg.hidden_size,), np.float32)
    sd["text_model.final_layer_norm.weight"] = np.ones((cfg.hidden_size,), np.float32)
    sd["text_model.final_layer_norm.bias"] = np.zeros((cfg.hidden_size,), np.float32)

    got = flatten_dict(convert_clip_text_state_dict(sd))
    assert set(got) == set(want), (set(want) - set(got), set(got) - set(want))
    for k in want:
        assert got[k].shape == want[k].shape, k


def test_lightning_split():
    sd = {
        "unet.base_unet.conv_in.weight": np.zeros((4, 4, 3, 3)),
        "unet.camera_encoder.output_norm.weight": np.zeros((8,)),
        "unet.image_encoder.unet.conv_in.weight": np.zeros((4, 4, 3, 3)),
    }
    g = split_lightning_state_dict(sd)
    assert "conv_in.weight" in g["base_unet"]
    assert "output_norm.weight" in g["camera_encoder"]
    assert "conv_in.weight" in g["image_encoder"]


def test_checkpoint_manager_roundtrip(tmp_path):
    import optax

    from mvd_tpu.train import TrainState

    params = {"params": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}}
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2, save_interval_steps=1)
    assert mgr.save(0, state, dataset_state={"rng_state": "abc"},
                    metrics={"val/noise_loss": 1.0}, force=True)
    mgr.wait()
    state2, meta = mgr.restore(state)
    assert int(state2.step) == 0
    np.testing.assert_array_equal(np.asarray(state2.params["params"]["w"]), 1.0)
    assert meta["dataset_state"]["rng_state"] == "abc"
    mgr.close()


def test_checkpoint_retention_keeps_topk_plus_last(tmp_path):
    """Top-k by val metric PLUS always the latest step (Lightning's
    save_top_k + save_last, reference train.py:154-162). Regression: with a
    pure best_fn/max_to_keep policy, a final save whose (one-val-stale)
    metric ranked k+1-th was evicted — an 8000-step evidence run's latest
    surviving checkpoint was 7000, losing the last 1000 steps on resume."""
    import optax

    from mvd_tpu.train import TrainState

    params = {"params": {"w": jnp.ones((2,))}}
    state = TrainState.create(params, optax.adam(1e-3))
    mgr = CheckpointManager(
        str(tmp_path / "ckpt"), max_to_keep=3, save_interval_steps=1
    )
    # the exact metric sequence that reproduced the eviction: the step-8
    # save carries a REGRESSED stale val (0.0622), ranking 4th of 4
    seq = {
        1: 0.08288, 2: 0.07204, 3: 0.06692, 4: 0.06165,
        5: 0.06356, 6: 0.06077, 7: 0.05813, 8: 0.06222,
    }
    for s, loss in seq.items():
        st = state.replace(step=jnp.asarray(s))
        assert mgr.save(s, st, metrics={"val/noise_loss": loss}, force=True)
    mgr.wait()
    kept = sorted(mgr.all_steps())
    assert kept == [4, 6, 7, 8], kept  # top-3 by loss + the latest
    assert mgr.latest_step() == 8
    assert mgr.best_step() == 7
    mgr.close()


def test_checkpoint_manager_replaces_existing_step(tmp_path):
    """Saving a step that already exists must replace it (a run resumed from
    an earlier pinned step re-reaches steps of the pre-resume trajectory;
    orbax itself raises StepAlreadyExistsError even with force=True)."""
    import optax

    from mvd_tpu.train import TrainState

    params = {"params": {"w": jnp.ones((4, 4))}}
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1)
    assert mgr.save(2, state, force=True)
    mgr.wait()

    state_b = state.replace(params={"params": {"w": jnp.full((4, 4), 7.0)}})
    assert mgr.save(2, state_b, force=True)  # must not raise
    mgr.wait()
    restored, _ = mgr.restore(state)
    np.testing.assert_array_equal(np.asarray(restored.params["params"]["w"]), 7.0)
    mgr.close()
