"""InceptionV3 feature extractor for standard FID.

The reference computes FID with torchmetrics' FrechetInceptionDistance
(training.py:107-117, losses.py:101-125), which wraps the pytorch-fid
InceptionV3 (TF-ported "pt_inception-2015-12-05" weights, pool3 features,
2048-dim). This module implements that network in Flax (NHWC):

  * BasicConv2d = conv (no bias) + batchnorm (eps 1e-3) + relu,
  * Inception A/B/C/D/E blocks; the FID variant's quirk — branch-pool
    average pooling with ``count_include_pad=False`` — is reproduced by a
    count-corrected average pool,
  * input: (B, 299, 299, 3) in [-1, 1] (the FID net's own normalization;
    callers resize + rescale from [0,1] via ``preprocess``),
  * output: 2048-dim pool3 features.

Weights convert from a local pytorch-fid / torchmetrics state dict via
``inception_from_torch`` (structure-tested here; numerically exercised
wherever the torch weights exist — no model zoo in this environment).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.traverse_util import unflatten_dict


def avg_pool_nopad(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """3x3 stride-1 SAME average pool with count_include_pad=False."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, ..., None]
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    cnt = jax.lax.reduce_window(
        jnp.broadcast_to(ones, x.shape[:3] + (1,)), 0.0, jax.lax.add,
        (1, window, window, 1), (1, 1, 1, 1), "SAME",
    )
    return sum_ / cnt


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int]
    strides: int = 1
    padding: object = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        # inference-only batchnorm: running stats are converted parameters
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_channels,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_channels,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_channels,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_channels,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = avg_pool_nopad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = avg_pool_nopad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # final block uses max pool in the FID variant

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            bp = avg_pool_nopad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Trunk through pool3 -> (B, 2048)."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # adaptive avg pool -> (B, 2048)


def preprocess(images01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] NHWC images -> 299x299 in [-1,1] (pytorch-fid input contract)."""
    x = jax.image.resize(
        images01, (images01.shape[0], 299, 299, 3), "bilinear"
    )
    return x * 2.0 - 1.0


def inception_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """pytorch-fid / torchmetrics InceptionV3 state dict -> flax params."""
    out = {}
    for key, val in sd.items():
        val = np.asarray(val)
        k = re.sub(r"^(inception|net|model)\.", "", key)
        if k.startswith(("fc.", "AuxLogits")):
            continue
        parts = k.split(".")
        # <Block>.<branch>.conv.weight / .bn.{weight,bias,running_mean,running_var}
        if parts[-2] == "conv" and parts[-1] == "weight":
            out[tuple(parts[:-2]) + ("conv", "kernel")] = val.transpose(2, 3, 1, 0)
        elif parts[-2] == "bn":
            leaf = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }.get(parts[-1])
            if leaf:
                out[tuple(parts[:-2]) + (leaf,)] = val
    return {"params": unflatten_dict(out)}


class InceptionFIDExtractor:
    """FID feature extractor callable for metrics.fid.FID."""

    def __init__(self, params: Optional[Dict] = None):
        self.model = InceptionV3Features()
        self.params = params
        self._jitted = None

    @property
    def available(self) -> bool:
        return self.params is not None

    def __call__(self, images01: np.ndarray) -> np.ndarray:
        if self._jitted is None:
            self._jitted = jax.jit(
                lambda p, x: self.model.apply(p, preprocess(x))
            )
        return np.asarray(self._jitted(self.params, jnp.asarray(images01)))
