"""Numerical parity of the CLIP text encoder and CLIP vision tower against
transformers' own CLIP implementations (the reference's actual dependency,
loaded at /root/reference/src/models/mvd_unet.py:411 via the SD2.1 pipeline
and in torchmetrics' CLIPScore, losses.py:59-98).

The model zoo is unreachable here (zero egress), so these run tiny RANDOM-init
configs — which still pins down every architectural and converter detail
(projection transposes, LayerNorm placement/eps, causal masking, activation
variant, class/position embedding handling). An error in any of those shows
up at random weights just as surely as at pretrained ones.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import transformers
from transformers import CLIPTextConfig as HFTextConfig
from transformers import CLIPTextModel, CLIPVisionConfig, CLIPVisionModelWithProjection

from mvd_tpu.checkpoint.torch_convert import convert_clip_text_state_dict
from mvd_tpu.config import CLIPTextConfig
from mvd_tpu.metrics.towers import CLIPVisionEncoder, clip_vision_from_torch
from mvd_tpu.nn.clip_text import CLIPTextEncoder


def _db(got, want):
    err = float(np.mean((got - want) ** 2))
    ref = float(np.mean(want**2))
    return 10.0 * np.log10(ref / max(err, 1e-30))


@pytest.mark.parametrize("hidden_act", ["gelu", "quick_gelu"])
def test_clip_text_parity_vs_transformers(hidden_act):
    hf_cfg = HFTextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act=hidden_act,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    tm = CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig(
        vocab_size=128,
        hidden_size=32,
        num_layers=3,
        num_heads=4,
        intermediate_size=64,
        max_length=16,
        hidden_act=hidden_act,
    )
    params = {
        "params": convert_clip_text_state_dict(
            {k: v.numpy() for k, v in tm.state_dict().items()}
        )
    }

    ids = np.array([[1, 5, 9, 3, 2, 0, 0, 0], [7, 7, 7, 7, 7, 7, 7, 2]], np.int64)
    with torch.no_grad():
        want = tm(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    got = np.asarray(CLIPTextEncoder(cfg).apply(params, jnp.asarray(ids, jnp.int32)))

    assert got.shape == want.shape
    db = _db(got, want)
    assert db >= 60.0, f"text parity only {db:.1f} dB"


@pytest.mark.parametrize("hidden_act", ["gelu", "quick_gelu"])
def test_clip_vision_parity_vs_transformers(hidden_act):
    hf_cfg = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        projection_dim=16,
        hidden_act=hidden_act,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    tm = CLIPVisionModelWithProjection(hf_cfg).eval()

    enc = CLIPVisionEncoder(
        hidden_size=32,
        num_layers=3,
        num_heads=4,
        intermediate_size=64,
        patch_size=8,
        image_size=32,
        projection_dim=16,
        hidden_act=hidden_act,
    )
    params = clip_vision_from_torch({k: v.numpy() for k, v in tm.state_dict().items()})

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(pixel_values=torch.from_numpy(pixels)).image_embeds.numpy()
    got = np.asarray(enc.apply(params, jnp.asarray(pixels.transpose(0, 2, 3, 1))))

    assert got.shape == want.shape
    db = _db(got, want)
    assert db >= 60.0, f"vision parity only {db:.1f} dB"
