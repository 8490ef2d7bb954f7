"""Golden-tensor parity vs the torch reference (gated).

Run tools/parity/export_golden.py in a diffusers environment, then:
    MVD_GOLDEN_DIR=/path/to/goldens pytest tests/test_golden_parity.py

Targets (SURVEY §6 / BASELINE.md): end-to-end UNet prediction PSNR >= 40 dB
against the torch reference at fixed inputs; CLIP/VAE outputs tight.
"""

import os

import numpy as np
import pytest

GOLDEN = os.environ.get("MVD_GOLDEN_DIR")
pytestmark = pytest.mark.skipif(
    not GOLDEN or not os.path.isdir(GOLDEN or ""),
    reason="MVD_GOLDEN_DIR not set (golden tensors unavailable in hermetic env)",
)


def _psnr(a, b, data_range=None):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    rng = data_range or (b.max() - b.min())
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(rng**2 / max(mse, 1e-20))


def _torch_sd(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return {k: v.numpy() for k, v in sd.items()}


def test_clip_text_parity():
    import jax.numpy as jnp

    from mvd_tpu.checkpoint import convert_clip_text_state_dict
    from mvd_tpu.config import CLIPTextConfig
    from mvd_tpu.nn import CLIPTextEncoder

    g = np.load(os.path.join(GOLDEN, "clip_text.npz"))
    params = {"params": convert_clip_text_state_dict(
        _torch_sd(os.path.join(GOLDEN, "weights", "text_encoder.pth"))
    )}
    enc = CLIPTextEncoder(CLIPTextConfig())
    out = enc.apply(params, jnp.asarray(g["input_ids"]))
    assert _psnr(out, g["last_hidden_state"]) >= 40.0


def test_vae_parity():
    import jax.numpy as jnp

    from mvd_tpu.checkpoint import convert_vae_state_dict
    from mvd_tpu.config import VAEConfig
    from mvd_tpu.nn import AutoencoderKL

    g = np.load(os.path.join(GOLDEN, "vae.npz"))
    params = {"params": convert_vae_state_dict(
        _torch_sd(os.path.join(GOLDEN, "weights", "vae.pth"))
    )}
    vae = AutoencoderKL(VAEConfig())
    img = jnp.asarray(g["image"].transpose(0, 2, 3, 1))
    mean, logvar = vae.apply(params, img, method=vae.encode_moments)
    assert _psnr(np.asarray(mean).transpose(0, 3, 1, 2), g["posterior_mean"]) >= 40.0
    lat = jnp.asarray(g["latent"].transpose(0, 2, 3, 1))
    dec = vae.apply(params, lat, method=vae.decode)
    assert _psnr(np.asarray(dec).transpose(0, 3, 1, 2), g["decoded"], data_range=2.0) >= 40.0


def test_unet_parity_and_features():
    import jax.numpy as jnp

    from mvd_tpu.checkpoint import convert_unet_state_dict
    from mvd_tpu.config import UNetConfig
    from mvd_tpu.nn import UNet2DCondition

    g = np.load(os.path.join(GOLDEN, "unet.npz"))
    gf = np.load(os.path.join(GOLDEN, "unet_features.npz"))
    tree, skipped = convert_unet_state_dict(
        _torch_sd(os.path.join(GOLDEN, "weights", "unet.pth"))
    )
    cfg = UNetConfig(with_adapters=False, remat=False, attention_impl="xla")
    model = UNet2DCondition(cfg)
    params = {"params": tree}
    sample = jnp.asarray(g["sample"].transpose(0, 2, 3, 1))
    text = jnp.asarray(g["text"])
    for t in (0, 500, 999):
        out, feats = model.apply(params, sample, jnp.asarray(t), text)
        psnr = _psnr(np.asarray(out).transpose(0, 3, 1, 2), g[f"pred_t{t}"])
        assert psnr >= 40.0, f"t={t}: {psnr:.1f} dB"
        if t == 0:
            for name in gf.files:
                got = np.asarray(feats[name]).transpose(0, 3, 1, 2)
                fp = _psnr(got, gf[name])
                assert fp >= 35.0, f"{name}: {fp:.1f} dB"
