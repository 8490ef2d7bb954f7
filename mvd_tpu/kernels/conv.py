"""3x3 convolution as shifted matmuls (MXU-friendly path).

XLA's TPU convolution runs at ~10-30 TFLOP/s bf16 on the UNet/VAE shapes
(measured, benchmarks/kernel_bench.py) — far off MXU peak. Re-expressing a
stride-1 SAME 3x3 conv as nine shifted (B·H·W, Cin) x (Cin, Cout) matmuls
accumulated in f32 measures 10-30% faster at the UNet's core shapes
(64²x320, 32²x640, 16²x1280) while losing at large-spatial/small-channel
shapes (512²x128: 9 re-reads of x dominate). Dispatch policy: shifted path
when Cin >= 256 on TPU, XLA conv otherwise.

Differentiable (pure lax ops — pad/slice/dot transpose cleanly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MIN_CIN_SHIFTED = 256
_MAX_HW_SHIFTED = 64 * 64


def conv3x3_shifted(x: jnp.ndarray, w: jnp.ndarray, b=None) -> jnp.ndarray:
    """x (B,H,W,Cin) NHWC; w (3,3,Cin,Cout) HWIO; stride 1, SAME padding."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            t = jnp.einsum(
                "bhwc,co->bhwo", patch, w[dy, dx],
                preferred_element_type=jnp.float32,
            )
            out = t if out is None else out + t
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def use_shifted(x_shape, kernel_shape, strides, impl: str = "auto") -> bool:
    if impl == "xla":
        return False
    kh, kw = kernel_shape[:2]
    if kh != 3 or kw != 3 or strides not in (1, (1, 1)):
        return False
    if impl == "shifted":
        return True
    # Default ON for TPU at small-spatial/large-channel shapes (the UNet's
    # core: 64²x320, 32²x640, 16²x1280): with the streaming-GN rewrite in
    # place the epilogue-fusion advantage XLA's conv held in round 1 is gone
    # — A/B on v5e: denoise step 49.1 -> 48.3 ms/step, full-scale train step
    # neutral (226.6 vs 226.4 ms). Large-spatial shapes stay on XLA convs:
    # the VAE decoder (128²-512² rows, where the nine shifted re-reads of x
    # dominate) measured 158 -> 199 ms with the shifted path.
    # MVD_SHIFTED_CONV=0 restores XLA convs everywhere.
    import os

    if os.environ.get("MVD_SHIFTED_CONV", "1") != "1":
        return False
    return (
        jax.default_backend() == "tpu"
        and x_shape[-1] >= _MIN_CIN_SHIFTED
        and x_shape[1] * x_shape[2] <= _MAX_HW_SHIFTED
    )
