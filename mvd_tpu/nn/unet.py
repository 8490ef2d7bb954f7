"""SD2.1-class conditional UNet in Flax, with explicit feature dataflow.

Replaces both of the reference's UNet roles with ONE module:
  * the denoising ``base_unet`` (reference mvd_unet.py:46-52, 318-326) —
    called with cross-attention context, per-layer reference features for the
    adapters, and FiLM camera modulation parameters;
  * the hook-instrumented frozen ``ImageEncoder`` copy (reference
    image_encoder.py:9-112) — the same function called with conditioning
    disabled; the per-attention-layer features the reference captures via
    forward hooks are simply *returned* as a dict. With the default frozen
    base UNet this also removes the reference's duplicated ~866M parameters.

Names in the feature dict match the reference hook names exactly
("down_block_{i}_attn_{j}", "mid_block_attn_0", "up_block_{i}_attn_{j}" —
image_encoder.py:40-79), as do the FiLM modulator names
("down_{i}", "mid", "up_{i}", "output" — mvd_unet.py:70-81).

FiLM parameters arrive as a dict name -> (scale, shift) with shapes
(B, C) — already processed by the camera encoder (sigmoid*2*strength etc.,
camera_encoder.py:227-234); the UNet only applies x*scale+shift at the block
boundaries the reference hooks into (mvd_unet.py:354-385): after each
down/mid/up block's full forward (post-downsample/upsample), never on the
skip connections. The "output" modulator applies to the input latents before
conv_in (mvd_unet.py:251-258).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import UNetConfig
from .layers import (
    Downsample,
    GroupNorm,
    ResnetBlock,
    TimestepEmbedMLP,
    Transformer2D,
    Upsample,
    timestep_embedding,
)

Features = Dict[str, jnp.ndarray]
Film = Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]


def _remat_policy():
    """Checkpoint policy for rematerialized UNet blocks.

    ``flash`` (default): save each flash-attention kernel's (out, lse) —
    tagged via ``checkpoint_name`` in the kernels' custom-VJP fwd rules —
    so backward recomputes the cheap projections but never re-runs the
    forward attention kernels. ``none``: blanket recompute (the historical
    behavior)."""
    import os

    import jax

    mode = os.environ.get("MVD_REMAT_POLICY", "flash_conv")
    if mode == "none":
        return None
    names = ["flash_out", "flash_lse"]
    if mode in ("flash_conv", "flash_conv_dots"):  # + ResnetBlock conv outputs
        names.append("conv_out")
    policy = jax.checkpoint_policies.save_only_these_names(*names)
    if mode == "flash_conv_dots":  # + every matmul output (FF/projections)
        policy = jax.checkpoint_policies.save_from_both_policies(
            policy, jax.checkpoint_policies.dots_saveable
        )
    return policy


def apply_film(x: jnp.ndarray, film: Optional[Film], name: str) -> jnp.ndarray:
    """x * scale + shift with (B, C) params broadcast over NHWC."""
    if film is None or name not in film:
        return x
    scale, shift = film[name]
    scale = scale[:, None, None, :].astype(x.dtype)
    shift = shift[:, None, None, :].astype(x.dtype)
    return x * scale + shift


class UNet2DCondition(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, h, w, 4) NHWC latents
        timesteps: jnp.ndarray,  # () or (B,)
        encoder_hidden_states: jnp.ndarray,  # (B, 77, 1024)
        ref_features: Optional[Features] = None,
        film: Optional[Film] = None,
        ref_scale: Optional[jnp.ndarray] = None,
        cached_encoder: Optional[Tuple] = None,
        return_encoder_cache: bool = False,
        ray_map: Optional[jnp.ndarray] = None,  # (B, h, w, 6) Plücker rays
    ):
        """Full UNet forward, or a decoder-only forward from a cached
        encoder state.

        Encoder propagation ("Faster Diffusion", arXiv 2312.09608): the
        down-path (encoder) features of adjacent denoising steps are nearly
        identical, so at non-key steps the encoder can be skipped and the
        key step's skip/bottleneck activations reused — only the mid+up
        (decoder) path, which carries most of the semantic change per step,
        is recomputed with the new timestep embedding.

          * ``return_encoder_cache=True`` → returns
            ``(out, features, cache)`` where ``cache`` is the pytree of
            down-path activations (skip residuals + bottleneck input).
          * ``cached_encoder=cache`` → skips the down path entirely;
            ``sample`` is unused (the non-key prediction depends only on the
            cached encoder state and the new timestep — this is what makes
            the approximation, and what lets non-key steps batch).
        """
        cfg = self.cfg
        B = (sample if cached_encoder is None else cached_encoder[1]).shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))

        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedMLP(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_emb.astype(self.dtype))

        ctx = encoder_hidden_states.astype(self.dtype)

        if cfg.remat:
            # Save the flash-attention residuals (named in
            # kernels/flash_attention.py fwd rules) across the remat
            # boundary: plain remat re-runs every flash forward kernel
            # during backward just to regenerate (out, lse) — ~25% of the
            # full-scale train step's flash time for zero information.
            # Everything unnamed still rematerializes. MVD_REMAT_POLICY=none
            # restores blanket recompute.
            policy = _remat_policy()
            ResBlock = nn.remat(ResnetBlock, policy=policy)
            AttnBlock = nn.remat(Transformer2D, static_argnums=(), policy=policy)
        else:
            ResBlock, AttnBlock = ResnetBlock, Transformer2D

        def make_attn(i_block: int, name: str):
            return AttnBlock(
                heads=cfg.num_attention_heads[i_block],
                head_dim=cfg.block_out_channels[i_block]
                // cfg.num_attention_heads[i_block],
                num_layers=cfg.transformer_layers_per_block,
                norm_num_groups=cfg.norm_num_groups,
                with_adapters=cfg.with_adapters,
                ref_scale=cfg.img_ref_scale,
                attention_impl=cfg.attention_impl,
                num_views=cfg.num_views,
                view_axis=cfg.view_axis,
                dtype=self.dtype,
                name=name,
            )

        def get_ref(feature_name):
            if ref_features is None:
                return None
            return ref_features.get(feature_name)

        features: Features = {}

        if cached_encoder is not None:
            residuals, h = list(cached_encoder[0]), cached_encoder[1]
        else:
            sample = apply_film(sample, film, "output")
            if ray_map is not None:
                # Plücker ray-map conditioning (camera.py:plucker_ray_map):
                # 6 extra input channels AFTER the "output" FiLM (which
                # modulates only the 4 latent channels). conv_in's extra
                # input rows zero-init from converted checkpoints
                # (checkpoint/torch_convert.py:zero_pad_conv_in).
                sample = jnp.concatenate(
                    [sample, ray_map.astype(sample.dtype)], axis=-1
                )
            sample = sample.astype(self.dtype)

            h = nn.Conv(
                cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
            )(sample)
            residuals = [h]

            # ----- down path -----
            for i, block_type in enumerate(cfg.down_block_types):
                out_ch = cfg.block_out_channels[i]
                has_attn = block_type == "CrossAttnDownBlock2D"
                for j in range(cfg.layers_per_block):
                    h = ResBlock(
                        out_channels=out_ch,
                        norm_num_groups=cfg.norm_num_groups,
                        norm_eps=cfg.norm_eps,
                        dtype=self.dtype,
                        name=f"down_{i}_resnet_{j}",
                    )(h, temb)
                    if has_attn:
                        fname = f"down_block_{i}_attn_{j}"
                        h = make_attn(i, f"down_{i}_attn_{j}")(
                            h, ctx, get_ref(fname), ref_scale
                        )
                        features[fname] = h
                    residuals.append(h)
                if i < len(cfg.down_block_types) - 1:
                    h = Downsample(out_ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
                    residuals.append(h)
                h = apply_film(h, film, f"down_{i}")

        encoder_cache = (tuple(residuals), h) if return_encoder_cache else None

        # ----- mid -----
        mid_ch = cfg.block_out_channels[-1]
        h = ResBlock(
            out_channels=mid_ch,
            norm_num_groups=cfg.norm_num_groups,
            norm_eps=cfg.norm_eps,
            dtype=self.dtype,
            name="mid_resnet_0",
        )(h, temb)
        fname = "mid_block_attn_0"
        h = make_attn(len(cfg.block_out_channels) - 1, "mid_attn_0")(
            h, ctx, get_ref(fname), ref_scale
        )
        features[fname] = h
        h = ResBlock(
            out_channels=mid_ch,
            norm_num_groups=cfg.norm_num_groups,
            norm_eps=cfg.norm_eps,
            dtype=self.dtype,
            name="mid_resnet_1",
        )(h, temb)
        h = apply_film(h, film, "mid")

        # ----- up path -----
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            has_attn = block_type == "CrossAttnUpBlock2D"
            attn_block_index = len(cfg.block_out_channels) - 1 - i
            for j in range(cfg.layers_per_block + 1):
                res = residuals.pop()
                h = jnp.concatenate([h, res.astype(h.dtype)], axis=-1)
                h = ResBlock(
                    out_channels=out_ch,
                    norm_num_groups=cfg.norm_num_groups,
                    norm_eps=cfg.norm_eps,
                    dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h, temb)
                if has_attn:
                    fname = f"up_block_{i}_attn_{j}"
                    h = make_attn(attn_block_index, f"up_{i}_attn_{j}")(
                        h, ctx, get_ref(fname), ref_scale
                    )
                    features[fname] = h
            if i < len(cfg.up_block_types) - 1:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
            h = apply_film(h, film, f"up_{i}")

        # ----- out -----
        h = GroupNorm(
            cfg.norm_num_groups, cfg.norm_eps, fuse_silu=True, name="conv_norm_out"
        )(h)
        out = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        if return_encoder_cache:
            return out.astype(jnp.float32), features, encoder_cache
        return out.astype(jnp.float32), features
