"""SD AutoencoderKL (VAE) in Flax, NHWC.

Matches diffusers' AutoencoderKL used by the reference pipeline
(vae.encode at pipeline.py:115, training.py:173-177; vae.decode at
pipeline.py:171-173) including the asymmetric ((0,1),(0,1)) downsample
padding and the single-head mid-block attention, so converted torch weights
reproduce outputs.

Encode returns the diagonal-Gaussian moments; sampling/mode choice and the
``scaling_factor`` multiply live with the caller (the reference multiplies
by scaling_factor after ``latent_dist.sample()``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import VAEConfig
from .layers import Downsample, GroupNorm, ResnetBlock, Upsample


class VAEAttention(nn.Module):
    """Single-head full attention over spatial positions (diffusers
    ``Attention`` in the VAE mid block: GroupNorm + q/k/v/out, head_dim =
    channels)."""

    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(self.norm_num_groups, 1e-6, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(C)), axis=-1)
        h = jnp.einsum(
            "bqk,bkc->bqc", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        h = nn.Dense(C, dtype=self.dtype, name="to_out")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
        )(x)
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(
                    out_channels=out_ch,
                    norm_num_groups=cfg.norm_num_groups,
                    norm_eps=1e-6,
                    use_temb=False,
                    dtype=self.dtype,
                    name=f"down_{i}_resnet_{j}",
                )(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(
                    out_ch, asymmetric_pad=True, dtype=self.dtype, name=f"down_{i}_downsample"
                )(h)
        # mid
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(
            out_channels=ch, norm_num_groups=cfg.norm_num_groups, norm_eps=1e-6, use_temb=False,
            dtype=self.dtype, name="mid_resnet_0",
        )(h)
        h = VAEAttention(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(
            out_channels=ch, norm_num_groups=cfg.norm_num_groups, norm_eps=1e-6, use_temb=False,
            dtype=self.dtype, name="mid_resnet_1",
        )(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, fuse_silu=True, name="conv_norm_out")(h)
        h = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        return h


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        rev = list(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        # mid
        h = ResnetBlock(
            out_channels=rev[0], norm_num_groups=cfg.norm_num_groups, norm_eps=1e-6, use_temb=False,
            dtype=self.dtype, name="mid_resnet_0",
        )(h)
        h = VAEAttention(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(
            out_channels=rev[0], norm_num_groups=cfg.norm_num_groups, norm_eps=1e-6, use_temb=False,
            dtype=self.dtype, name="mid_resnet_1",
        )(h)
        for i, out_ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(
                    out_channels=out_ch,
                    norm_num_groups=cfg.norm_num_groups,
                    norm_eps=1e-6,
                    use_temb=False,
                    dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h)
            if i < len(rev) - 1:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, fuse_silu=True, name="conv_norm_out")(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        return h


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode_moments(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image (B,H,W,3) in [-1,1] -> (mean, logvar), each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None, sample: bool = True) -> jnp.ndarray:
        """Latent sample (or mean when sample=False / rng=None), WITHOUT the
        scaling_factor multiply — callers apply cfg.scaling_factor to match
        the reference's `latents * vae.config.scaling_factor`."""
        mean, logvar = self.encode_moments(x)
        if sample and rng is not None:
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return mean

    def decode(self, z) -> jnp.ndarray:
        """latents (WITHOUT scaling factor) -> image (B,H,W,3) approx [-1,1]."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z)
