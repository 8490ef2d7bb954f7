"""Full Lightning-checkpoint conversion path: torch.save a synthetic .ckpt
with the reference's key layout (unet. prefix, base_unet/camera_encoder/
image_encoder groups), convert, and check the params load + match."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from mvd_tpu.checkpoint import convert_lightning_checkpoint, export_unet_state_dict
from mvd_tpu.config import TINY_UNET
from mvd_tpu.nn import UNet2DCondition


def test_lightning_ckpt_roundtrip(tmp_path):
    model = UNet2DCondition(TINY_UNET)
    hw = TINY_UNET.sample_size
    sample = jnp.zeros((1, hw, hw, 4))
    ctx = jnp.zeros((1, 77, TINY_UNET.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), sample, jnp.array(0), ctx)

    sd = export_unet_state_dict(params["params"])
    ckpt_sd = {}
    for k, v in sd.items():
        ckpt_sd[f"unet.base_unet.{k}"] = torch.from_numpy(np.ascontiguousarray(v))
        # the frozen feature-extractor copy carries the same weights
        ckpt_sd[f"unet.image_encoder.unet.{k}"] = torch.from_numpy(
            np.ascontiguousarray(v)
        )
    # dead reference params the converter must skip
    ckpt_sd[
        "unet.base_unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor.ref_ln.weight"
    ] = torch.zeros(TINY_UNET.block_out_channels[0])
    path = tmp_path / "last.ckpt"
    torch.save({"state_dict": ckpt_sd, "epoch": 3}, path)

    mvd_params, skipped = convert_lightning_checkpoint(str(path))
    got = flatten_dict(mvd_params["params"]["unet"])
    want = flatten_dict(params["params"])
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]), got[k], err_msg=str(k))
    assert any("ref_ln" in s[0] for s in skipped)

    # converted params drive the model identically
    out_a, _ = model.apply(params, sample, jnp.array(10), ctx)
    out_b, _ = model.apply({"params": mvd_params["params"]["unet"]}, sample, jnp.array(10), ctx)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=0)


def test_separate_image_encoder_conversion(tmp_path):
    model = UNet2DCondition(TINY_UNET)
    hw = TINY_UNET.sample_size
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, hw, hw, 4)),
        jnp.array(0),
        jnp.zeros((1, 77, TINY_UNET.cross_attention_dim)),
    )
    sd = export_unet_state_dict(params["params"])
    ckpt_sd = {f"unet.image_encoder.unet.{k}": torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    path = tmp_path / "enc.ckpt"
    torch.save({"state_dict": ckpt_sd}, path)
    mvd_params, _ = convert_lightning_checkpoint(str(path), share_image_encoder=False)
    assert "image_encoder_unet" in mvd_params["params"]
