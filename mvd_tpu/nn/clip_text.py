"""CLIP text encoder (OpenCLIP ViT-H text tower, as shipped with SD2.1).

The reference calls ``self.text_encoder(input_ids)[0]`` (pipeline.py:62,
training.py:189-197) — a transformers CLIPTextModel with 23 hidden layers,
hidden 1024, 16 heads, GELU MLPs, causal attention, final LayerNorm; the
last_hidden_state (B, 77, 1024) is the UNet cross-attention context.

Implements exactly that contract in Flax. Weights convert 1:1 from the torch
checkpoint. Tokenization lives in mvd_tpu/data/tokenizer.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import CLIPTextConfig


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        B, S, D = x.shape
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)
        q = dense("q_proj")(x) * (head_dim**-0.5)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        split = lambda t: t.reshape(B, S, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits + mask
        probs = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return dense("out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name
        )
        h = ln("layer_norm1")(x).astype(x.dtype)
        x = x + CLIPAttention(cfg, self.dtype, name="self_attn")(h, mask)
        h = ln("layer_norm2")(x).astype(x.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        if cfg.hidden_act == "quick_gelu":
            # OpenAI CLIP (ViT-L et al.): x * sigmoid(1.702 x)
            h = h * nn.sigmoid(1.702 * h)
        else:  # "gelu" — OpenCLIP ViT-H text tower shipped with SD2.1
            h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids (B, 77) int32 -> last_hidden_state (B, 77, hidden)."""
        cfg = self.cfg
        B, S = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
        )
        x = tok + pos[None, :S].astype(tok.dtype)

        causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, self.dtype, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="final_layer_norm",
        )(x.astype(jnp.float32))
        return x
