"""Training losses + step metrics as pure functions.

Rebuild of reference src/training/losses.py:128-286:
  * v-prediction / epsilon target selection (losses.py:165-170),
  * Min-SNR weighting, gamma configurable (hardcoded 5.0 in the reference,
    losses.py:175),
  * x0-hat reconstruction + latent/pixel recon + SSIM metrics under
    stop_gradient (losses.py:209-261).

Weighting modes: the reference computes ``F.mse_loss`` with MEAN reduction
*first*, so its per-sample Min-SNR weights collapse to
``scalar_mse * mean(weights)`` (losses.py:170-192). ``per_sample`` applies
the weights per sample as the Min-SNR paper intends; ``faithful`` reproduces
the reference arithmetic exactly.

VGG-perceptual / CLIP-score / FID need pretrained towers; they live in
mvd_tpu/metrics/ and are wired into the val harness (they are no-grad
metrics, never part of the training objective — losses.py:209).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..diffusion import (
    NoiseSchedule,
    compute_snr,
    get_velocity,
    min_snr_weight,
    pred_original_sample,
)
from ..metrics.image import ssim


def noise_loss(
    schedule: NoiseSchedule,
    noise_pred: jnp.ndarray,
    noise: jnp.ndarray,
    target_latents: jnp.ndarray,
    timesteps: jnp.ndarray,
    snr_gamma: float = 5.0,
    use_snr: bool = True,
    weighting: str = "per_sample",
) -> Dict[str, jnp.ndarray]:
    if schedule.prediction_type == "v_prediction":
        target = get_velocity(schedule, target_latents, noise, timesteps)
    else:
        target = noise

    err = (noise_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    snr = compute_snr(schedule, timesteps)
    if use_snr:
        w = min_snr_weight(schedule, timesteps, snr_gamma)
    else:
        w = jnp.ones_like(snr)

    if weighting == "faithful":
        # scalar-mse * mean(w): reference losses.py:170-192 behavior
        loss = err.mean() * w.mean()
    else:
        per_sample = err.mean(axis=tuple(range(1, err.ndim)))
        loss = (per_sample * w).mean()

    return {
        "noise_loss": loss,
        "mean_snr": snr.mean(),
        "mean_snr_weight": w.mean(),
    }


def feature_matching_loss(
    feats_pred: Dict[str, jnp.ndarray],
    feats_target: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """Frozen-UNet feature-matching auxiliary loss (BASELINE config 5).

    Mean squared distance between the frozen feature extractor's per-block
    activations for the predicted x0-hat and for the target latents,
    averaged over blocks. Per-block errors are normalized by the target
    feature's variance so deep wide blocks don't dominate shallow ones
    (the standard feature-matching normalization). The target side must be
    stop-gradiented by the caller; gradients flow through the prediction
    side into the adapter/camera params via x0-hat."""
    losses = []
    for name in sorted(feats_target):
        p = feats_pred[name].astype(jnp.float32)
        t = feats_target[name].astype(jnp.float32)
        scale = jnp.maximum(jnp.var(t), 1e-6)
        losses.append(jnp.mean((p - t) ** 2) / scale)
    return jnp.stack(losses).mean()


def reconstruction_metrics(
    schedule: NoiseSchedule,
    noise_pred: jnp.ndarray,
    noisy_latents: jnp.ndarray,
    target_latents: jnp.ndarray,
    timesteps: jnp.ndarray,
    vae_decode=None,
    image_metric_fns: Optional[Dict] = None,
) -> Dict[str, jnp.ndarray]:
    """No-grad metric tower (reference losses.py:209-273).

    ``image_metric_fns`` maps names to fns(img_hat, img_tgt) -> scalar,
    computed on the decoded [-1,1] images — the hook for the reference's
    optional perceptual/CLIP/FID tower metrics when pretrained weights are
    available (mvd_tpu/metrics/towers.py)."""
    noise_pred = jax.lax.stop_gradient(noise_pred)
    target_latents = jax.lax.stop_gradient(target_latents)
    x0_hat = pred_original_sample(schedule, noise_pred, noisy_latents, timesteps)
    out = {
        "latent_recon_loss": jnp.mean(
            (x0_hat.astype(jnp.float32) - target_latents.astype(jnp.float32)) ** 2
        )
    }
    if vae_decode is not None:
        img_hat = vae_decode(x0_hat)
        img_tgt = vae_decode(target_latents)
        out["pixel_recon_loss"] = jnp.mean(
            (img_hat.astype(jnp.float32) - img_tgt.astype(jnp.float32)) ** 2
        )
        s = ssim(img_hat, img_tgt, data_range=2.0)
        out["ssim_value"] = s
        out["ssim_loss"] = 1.0 - s
        for name, fn in (image_metric_fns or {}).items():
            out[name] = fn(img_hat, img_tgt)
    return out
