"""Image quality metrics in pure JAX (NHWC).

Rebuild of the reference's metric bank (val.py:60-104, losses.py:21-125):
PSNR and SSIM here; perceptual/LPIPS/CLIP/FID need pretrained towers and
live in mvd_tpu/metrics/towers.py (loaded from converted weights when
available).

SSIM follows Wang et al. 2004 with the standard 11x11 Gaussian window,
sigma 1.5, K1=0.01, K2=0.03 — the same definition torchmetrics'
StructuralSimilarityIndexMeasure uses (reference training.py:99-104 with
data_range=2.0 for [-1,1] images).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over the whole batch."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def psnr_per_image(a, b, data_range: float = 2.0):
    mse = jnp.mean(
        (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
        axis=tuple(range(1, a.ndim)),
    )
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D filter, VALID padding. x: (B,H,W,C)."""
    C = x.shape[-1]
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, C))  # HWIO, feature_group_count=C
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        # TPU convs default to bf16 passes on f32 inputs; SSIM's variance
        # terms (E[x²] − μ²) catastrophically cancel at bf16 and the map
        # goes wildly wrong (measured: 0.78 true SSIM read as 0.06 on-chip,
        # and negative val/gen_ssim in training logs). Metrics must be
        # exact — force full f32 accumulation.
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 2.0,
    window_size: int = 11,
    sigma: float = 1.5,
    per_image: bool = False,
) -> jnp.ndarray:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu_a = _filter2d(a, win)
    mu_b = _filter2d(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_a = _filter2d(a * a, win) - mu_aa
    sigma_b = _filter2d(b * b, win) - mu_bb
    sigma_ab = _filter2d(a * b, win) - mu_ab

    ssim_map = ((2 * mu_ab + c1) * (2 * sigma_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sigma_a + sigma_b + c2)
    )
    if per_image:
        return ssim_map.mean(axis=(1, 2, 3))
    return ssim_map.mean()
