"""Camera encoder + FiLM modulators in Flax.

Rebuild of reference src/models/camera_encoder.py:12-255:
  * rotation branch: MLP over the flattened relative 3x3 rotation
    (LayerNorm+SiLU stacks; 2-layer "simple" or 3-layer default),
  * translation branch: NeRF positional encoding -> Gaussian projection ->
    MLP. Deliberate deviation: the reference draws a FRESH random projection
    matrix on every forward (camera_encoder.py:153-156) — nondeterministic by
    construction; here the projection is a fixed parameter initialized from
    the PRNG at init (variance-matched: N(0, 1/fan_in)), the correct
    functional-JAX equivalent. Documented for parity.
  * final projection MLP + output LayerNorm,
  * per-block FiLM modulator MLPs with the reference's init (weights
    N(0, 0.02), bias first-half 0.5 / second-half 0.0 so the initial scale is
    sigmoid(0.5)*2*strength — camera_encoder.py:93-105),
  * ``film_params`` returns the PROCESSED (scale, shift) per block:
    scale = sigmoid(raw_scale)*2*strength, shift = raw_shift*strength
    (camera_encoder.py:227-234); the UNet applies x*scale+shift.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..camera import positional_encoding, relative_transform
from ..config import CameraEncoderConfig


def modulation_dims(block_out_channels, num_down, num_up) -> Dict[str, int]:
    """Modulator name -> channel dim (reference mvd_unet.py:63-81)."""
    down = list(block_out_channels)
    up = list(reversed(down))
    dims = {f"down_{i}": down[min(i, len(down) - 1)] for i in range(num_down)}
    dims.update({f"up_{i}": up[i] for i in range(num_up)})
    dims["mid"] = down[-1]
    dims["output"] = 4
    return dims


class _MLPBranch(nn.Module):
    """Linear(+LN+SiLU) stack ending in a plain Linear."""

    hidden_dim: int
    output_dim: int
    num_hidden: int  # 1 for "simple", 2 for default
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_hidden):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name=f"ln_{i}")(
                x.astype(jnp.float32)
            ).astype(self.dtype)
            x = nn.silu(x)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="dense_out")(x)


def _film_bias_init(key, shape, dtype=jnp.float32):
    dim = shape[0] // 2
    return jnp.concatenate(
        [jnp.full((dim,), 0.5, dtype), jnp.zeros((shape[0] - dim,), dtype)]
    )


class CameraEncoder(nn.Module):
    cfg: CameraEncoderConfig
    modulation_hidden_dims: Tuple[Tuple[str, int], ...]  # ordered (name, dim)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, source_camera: jnp.ndarray, target_camera: jnp.ndarray):
        """(B,4,4) cameras -> (camera_embedding (B, D), film dict)."""
        cfg = self.cfg
        R, T = relative_transform(
            source_camera.astype(jnp.float32), target_camera.astype(jnp.float32)
        )
        B = R.shape[0]
        n_hidden = 1 if cfg.simple_encoder else 2

        r_emb = _MLPBranch(
            cfg.hidden_dim, cfg.output_dim, n_hidden, self.dtype, name="rotation_encoder"
        )(R.reshape(B, 9).astype(self.dtype))

        t_enc = positional_encoding(T, cfg.pos_enc_dim, cfg.max_freq)
        proj = self.param(
            "translation_projection",
            nn.initializers.normal(stddev=1.0 / jnp.sqrt(t_enc.shape[-1])),
            (t_enc.shape[-1], cfg.output_dim),
        )
        t_enc = (t_enc.astype(self.dtype) @ proj.astype(self.dtype))
        t_emb = _MLPBranch(
            cfg.hidden_dim, cfg.output_dim, n_hidden, self.dtype, name="translation_encoder"
        )(t_enc)

        combined = jnp.concatenate([r_emb, t_emb], axis=-1)
        # final_projection: Linear -> LN -> SiLU -> Linear -> LN
        h = nn.Dense(cfg.output_dim, dtype=self.dtype, name="final_dense_0")(combined)
        h = nn.LayerNorm(
            dtype=jnp.float32, param_dtype=jnp.float32, name="final_ln_0"
        )(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Dense(cfg.output_dim, dtype=self.dtype, name="final_dense_1")(h)
        h = nn.LayerNorm(
            dtype=jnp.float32, param_dtype=jnp.float32, name="final_ln_1"
        )(h.astype(jnp.float32))
        emb = nn.LayerNorm(
            dtype=jnp.float32, param_dtype=jnp.float32, name="output_norm"
        )(h).astype(self.dtype)

        film = {}
        for name, dim in self.modulation_hidden_dims:
            m = nn.Dense(cfg.output_dim // 2, dtype=self.dtype, name=f"mod_{name}_dense_0")(emb)
            m = nn.LayerNorm(
                dtype=jnp.float32, param_dtype=jnp.float32, name=f"mod_{name}_ln"
            )(m.astype(jnp.float32)).astype(self.dtype)
            m = nn.silu(m)
            m = nn.Dense(
                dim * 2,
                kernel_init=nn.initializers.normal(0.02),
                bias_init=_film_bias_init,
                dtype=self.dtype,
                name=f"mod_{name}_dense_1",
            )(m)
            raw_scale, raw_shift = jnp.split(m, 2, axis=-1)
            scale = nn.sigmoid(raw_scale.astype(jnp.float32)) * 2.0 * cfg.modulation_strength
            shift = raw_shift.astype(jnp.float32) * cfg.modulation_strength
            film[name] = (scale, shift)

        return emb, film
