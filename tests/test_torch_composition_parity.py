"""Composition-level numerical parity vs independent torch reimplementations.

Extends tests/test_torch_layer_parity.py from per-layer to whole-model
compositions (VERDICT r2 'next' #5) — the strongest parity evidence
obtainable without diffusers/real weights in this environment:

  (a) full UNet forward WITH image cross-attention adapters at every site
      and camera FiLM at every block boundary,
  (b) full VAE encode (moments) / decode / roundtrip,
  (c) one full denoise step including the scheduler update (v-prediction
      DDIM, the SD2.1 configuration), torch end-to-end vs jitted JAX.

All torch modules are written from the diffusers spec (reference
mvd_unet.py:46-52 loads UNet2DConditionModel/AutoencoderKL), emit diffusers
state-dict key layouts, and convert through checkpoint/torch_convert — so a
shared misreading of layout/key semantics between converter and model would
fail here at >=60 dB fp32.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from mvd_tpu.checkpoint.torch_convert import (
    convert_unet_state_dict,
    convert_vae_state_dict,
)
from mvd_tpu.config import TINY_UNET, TINY_VAE, UNetConfig, VAEConfig
from tests.test_torch_layer_parity import (
    TUNet,
    TVAEAttention,
    assert_same_structure,
    snr_db,
    to_np_sd,
)

torch.manual_seed(1)


# ---------------------------------------------------------------------------
# (a) full UNet with adapters + FiLM
# ---------------------------------------------------------------------------


def _site_shapes(cfg, hw):
    """(feature_name, spatial, channels) for every attention site, matching
    mvd_tpu/nn/unet.py's feature dict."""
    ch = cfg.block_out_channels
    n = len(ch)
    sites = []
    for i, bt in enumerate(cfg.down_block_types):
        if bt == "CrossAttnDownBlock2D":
            for j in range(cfg.layers_per_block):
                sites.append((f"down_block_{i}_attn_{j}", hw >> i, ch[i]))
    sites.append(("mid_block_attn_0", hw >> (n - 1), ch[-1]))
    rev = list(reversed(ch))
    for i, bt in enumerate(cfg.up_block_types):
        if bt == "CrossAttnUpBlock2D":
            for j in range(cfg.layers_per_block + 1):
                sites.append((f"up_block_{i}_attn_{j}", hw >> (n - 1 - i), rev[i]))
    return sites


def test_full_unet_adapters_film_parity():
    """Whole tiny UNet with an adapter at EVERY attention site plus FiLM at
    every block boundary: torch composition -> convert_unet_state_dict ->
    UNet2DCondition, >=60 dB."""
    from mvd_tpu.nn.unet import UNet2DCondition

    cfg = dataclasses.replace(TINY_UNET, with_adapters=True, attention_impl="xla")
    ctx_dim = cfg.cross_attention_dim
    tm = TUNet(cfg, ctx_dim, with_adapters=True).eval()
    B, hw = 2, cfg.sample_size
    rng = np.random.default_rng(0)
    x = torch.randn(B, cfg.in_channels, hw, hw)
    t = torch.tensor([123, 800])
    ctx = torch.randn(B, 7, ctx_dim)
    ref_scale = 0.3

    refs_np = {
        name: rng.normal(size=(B, s * s, c)).astype(np.float32)
        for name, s, c in _site_shapes(cfg, hw)
    }
    film_np = {}
    film_np["output"] = (
        1 + 0.1 * rng.normal(size=(B, cfg.in_channels)).astype(np.float32),
        0.1 * rng.normal(size=(B, cfg.in_channels)).astype(np.float32),
    )
    ch = cfg.block_out_channels
    rev = list(reversed(ch))
    for i in range(len(cfg.down_block_types)):
        film_np[f"down_{i}"] = (
            1 + 0.1 * rng.normal(size=(B, ch[i])).astype(np.float32),
            0.1 * rng.normal(size=(B, ch[i])).astype(np.float32),
        )
    film_np["mid"] = (
        1 + 0.1 * rng.normal(size=(B, ch[-1])).astype(np.float32),
        0.1 * rng.normal(size=(B, ch[-1])).astype(np.float32),
    )
    for i in range(len(cfg.up_block_types)):
        film_np[f"up_{i}"] = (
            1 + 0.1 * rng.normal(size=(B, rev[i])).astype(np.float32),
            0.1 * rng.normal(size=(B, rev[i])).astype(np.float32),
        )

    t_refs = {k: torch.from_numpy(v) for k, v in refs_np.items()}
    t_film = {
        k: (torch.from_numpy(s), torch.from_numpy(sh))
        for k, (s, sh) in film_np.items()
    }
    with torch.no_grad():
        want = tm(x, t, ctx, t_refs, ref_scale, t_film).permute(0, 2, 3, 1).numpy()

    tree, skipped = convert_unet_state_dict(to_np_sd(tm))
    assert not skipped

    fm = UNet2DCondition(cfg)
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    tj = jnp.asarray(t.numpy())
    cj = jnp.asarray(ctx.numpy())
    j_refs = {k: jnp.asarray(v) for k, v in refs_np.items()}
    j_film = {k: (jnp.asarray(s), jnp.asarray(sh)) for k, (s, sh) in film_np.items()}
    init = fm.init(
        jax.random.PRNGKey(0), xj, tj, cj, ref_features=j_refs,
        film=j_film, ref_scale=jnp.float32(ref_scale),
    )["params"]
    assert_same_structure(tree, init)
    got, feats = fm.apply(
        {"params": tree}, xj, tj, cj, ref_features=j_refs,
        film=j_film, ref_scale=jnp.float32(ref_scale),
    )
    db = snr_db(want, np.asarray(got))
    assert db >= 60, f"full UNet (adapters+FiLM) parity {db:.1f} dB < 60"


# ---------------------------------------------------------------------------
# (b) full VAE: torch AutoencoderKL composition from the diffusers spec
# ---------------------------------------------------------------------------


class TVAEResnet(tnn.Module):
    """diffusers ResnetBlock2D with temb_channels=None (the VAE variant)."""

    def __init__(self, in_ch, out_ch, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        s = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return s + h


class TVAEEncoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.down_blocks = tnn.ModuleList()
        cur = ch[0]
        for i, out_ch in enumerate(ch):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(TVAEResnet(cur, out_ch, g))
                cur = out_ch
            if i < len(ch) - 1:
                ds = tnn.Module()
                # diffusers Downsample2D in the VAE: asymmetric (0,1,0,1)
                # pad then stride-2 conv with padding=0
                ds.conv = tnn.Conv2d(cur, cur, 3, stride=2, padding=0)
                blk.downsamplers = tnn.ModuleList([ds])
            self.down_blocks.append(blk)
        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList(
            [TVAEResnet(cur, ch[-1], g), TVAEResnet(ch[-1], ch[-1], g)]
        )
        self.mid_block.attentions = tnn.ModuleList([TVAEAttention(ch[-1], g)])
        self.conv_norm_out = tnn.GroupNorm(g, ch[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(ch[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for rn in blk.resnets:
                h = rn(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(F.pad(h, (0, 1, 0, 1)))
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVAEDecoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        rev = list(reversed(cfg.block_out_channels))
        g = cfg.norm_num_groups
        self.conv_in = tnn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList(
            [TVAEResnet(rev[0], rev[0], g), TVAEResnet(rev[0], rev[0], g)]
        )
        self.mid_block.attentions = tnn.ModuleList([TVAEAttention(rev[0], g)])
        self.up_blocks = tnn.ModuleList()
        cur = rev[0]
        for i, out_ch in enumerate(rev):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(TVAEResnet(cur, out_ch, g))
                cur = out_ch
            if i < len(rev) - 1:
                us = tnn.Module()
                us.conv = tnn.Conv2d(cur, cur, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(g, rev[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(rev[-1], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        for blk in self.up_blocks:
            for rn in blk.resnets:
                h = rn(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TAutoencoderKL(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TVAEEncoder(cfg)
        self.decoder = TVAEDecoder(cfg)
        self.quant_conv = tnn.Conv2d(
            2 * cfg.latent_channels, 2 * cfg.latent_channels, 1
        )
        self.post_quant_conv = tnn.Conv2d(
            cfg.latent_channels, cfg.latent_channels, 1
        )

    def encode_moments(self, x):
        m = self.quant_conv(self.encoder(x))
        mean, logvar = m.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def test_full_vae_parity():
    """Full VAE encode (posterior moments), decode, and mean-mode roundtrip:
    torch composition -> convert_vae_state_dict -> AutoencoderKL, >=60 dB."""
    from mvd_tpu.nn.vae import AutoencoderKL

    cfg = TINY_VAE
    tm = TAutoencoderKL(cfg).eval()
    B, hw = 2, 32
    x = torch.randn(B, cfg.in_channels, hw, hw).clamp(-1, 1)
    with torch.no_grad():
        t_mean, t_logvar = tm.encode_moments(x)
        t_dec = tm.decode(t_mean)
    nhwc = lambda t: t.permute(0, 2, 3, 1).numpy()

    tree = convert_vae_state_dict(to_np_sd(tm))
    fm = AutoencoderKL(cfg)
    xj = jnp.asarray(nhwc(x))
    init = fm.init(jax.random.PRNGKey(0), xj)["params"]
    assert_same_structure(tree, init)

    j_mean, j_logvar = fm.apply({"params": tree}, xj, method=fm.encode_moments)
    db_m = snr_db(nhwc(t_mean), np.asarray(j_mean))
    db_lv = snr_db(nhwc(t_logvar), np.asarray(j_logvar))
    assert db_m >= 60, f"VAE encode mean parity {db_m:.1f} dB < 60"
    assert db_lv >= 60, f"VAE encode logvar parity {db_lv:.1f} dB < 60"

    j_dec = fm.apply({"params": tree}, j_mean, method=fm.decode)
    db_d = snr_db(nhwc(t_dec), np.asarray(j_dec))
    assert db_d >= 60, f"VAE decode parity {db_d:.1f} dB < 60"


# ---------------------------------------------------------------------------
# (c) one full denoise step incl. the scheduler (v-prediction DDIM)
# ---------------------------------------------------------------------------


def _t_ddim_step_vpred(alphas_cumprod, v, t, sample, num_steps, T=1000):
    """Independent torch DDIM step for v-prediction (diffusers
    DDIMScheduler.step with eta=0, clip_sample=False)."""
    prev_t = t - T // num_steps
    ac_t = alphas_cumprod[t]
    ac_prev = alphas_cumprod[prev_t] if prev_t >= 0 else torch.tensor(1.0)
    sa, so = ac_t.sqrt(), (1 - ac_t).sqrt()
    x0 = sa * sample - so * v
    eps = sa * v + so * sample
    return ac_prev.sqrt() * x0 + (1 - ac_prev).sqrt() * eps


def test_full_denoise_step_parity():
    """latents -> UNet (v-pred) -> DDIM update, torch vs jitted JAX at the
    same timestep on the same scaled-linear schedule: >=60 dB on the
    post-step latents. Covers the model + scheduler composition the
    reference runs per denoising iteration (pipeline.py:140-161)."""
    from mvd_tpu.diffusion.schedules import NoiseSchedule, ddim_step
    from mvd_tpu.nn.unet import UNet2DCondition

    cfg = dataclasses.replace(TINY_UNET, with_adapters=False, attention_impl="xla")
    ctx_dim = cfg.cross_attention_dim
    tm = TUNet(cfg, ctx_dim).eval()
    B, hw = 2, cfg.sample_size
    lat = torch.randn(B, cfg.in_channels, hw, hw)
    ctx = torch.randn(B, 7, ctx_dim)
    num_steps, t_now = 20, 701  # a "leading"-spaced step for T=1000/20

    # torch side: scaled_linear betas (the SD schedule), v-pred DDIM
    betas = (
        torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64) ** 2
    ).float()
    ac = torch.cumprod(1 - betas, dim=0)
    t = torch.tensor([t_now] * B)
    with torch.no_grad():
        v = tm(lat, t, ctx)
        want = _t_ddim_step_vpred(ac, v, t_now, lat, num_steps)

    tree, skipped = convert_unet_state_dict(to_np_sd(tm))
    assert not skipped
    fm = UNet2DCondition(cfg)
    sched = NoiseSchedule.create(prediction_type="v_prediction")
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), ac.numpy(), rtol=2e-6
    )

    @jax.jit
    def step(params, lat, t, ctx):
        pred, _ = fm.apply({"params": params}, lat, t, ctx)
        return ddim_step(sched, pred, t[0], lat, num_steps)

    latj = jnp.asarray(lat.permute(0, 2, 3, 1).numpy())
    got = step(tree, latj, jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))
    db = snr_db(want.permute(0, 2, 3, 1).numpy(), np.asarray(got))
    assert db >= 60, f"denoise step parity {db:.1f} dB < 60"


# ---------------------------------------------------------------------------
# (d) FULL SD2.1 WIDTH at reduced spatial (VERDICT r4 'next' #2)
# ---------------------------------------------------------------------------
#
# Tiny-width parity (>=60 dB above) does not transfer: head mapping at heads
# 5-20, 1024-dim cross-attention context, and 32-group GroupNorm over
# 320/640/1280 channels are all width-dependent converter territory (the VAE
# GroupNorm-eps bug was exactly this class and was only caught by parity).
# These run the REAL SD2.1 widths — block_out_channels (320, 640, 1280,
# 1280), heads (5, 10, 20, 20), cross_attention_dim 1024 — at 16² latents
# (the MULTICHIP_FLAGSHIP spatial-reduction trick) so the whole thing is
# CPU-runnable. Marked slow: ~1 GB of torch weights + a full-width XLA
# compile per test.

SD21_WIDTH_UNET = UNetConfig(sample_size=16, remat=False, attention_impl="xla")


def _assert_same_shapes(converted, init_params):
    from flax.traverse_util import flatten_dict

    a = flatten_dict(converted)
    b = flatten_dict(init_params)
    assert set(a) == set(b)
    bad = {
        k: (np.shape(a[k]), tuple(getattr(b[k], "shape", ())))
        for k in a
        if tuple(np.shape(a[k])) != tuple(getattr(b[k], "shape", ()))
    }
    assert not bad, f"converted leaf shapes != init shapes: {bad}"


@pytest.mark.slow
def test_full_unet_adapters_film_parity_sd21_width():
    """Full-SD2.1-width UNet with an adapter at EVERY attention site plus
    FiLM at every block boundary, through convert_unet_state_dict, >=60 dB
    f32 (reference load semantics at real width: infer.py:46-74, adapter
    dims attention.py:199-245)."""
    from mvd_tpu.nn.unet import UNet2DCondition

    cfg = dataclasses.replace(SD21_WIDTH_UNET, with_adapters=True)
    ctx_dim = cfg.cross_attention_dim
    torch.manual_seed(7)
    tm = TUNet(cfg, ctx_dim, with_adapters=True).eval()
    B, hw = 1, cfg.sample_size
    rng = np.random.default_rng(7)
    x = torch.randn(B, cfg.in_channels, hw, hw)
    t = torch.tensor([617])
    ctx = torch.randn(B, 7, ctx_dim)
    ref_scale = 0.3

    refs_np = {
        name: rng.normal(size=(B, s * s, c)).astype(np.float32)
        for name, s, c in _site_shapes(cfg, hw)
    }
    film_np = {"output": (
        1 + 0.1 * rng.normal(size=(B, cfg.in_channels)).astype(np.float32),
        0.1 * rng.normal(size=(B, cfg.in_channels)).astype(np.float32),
    )}
    ch = cfg.block_out_channels
    rev = list(reversed(ch))
    for i in range(len(cfg.down_block_types)):
        film_np[f"down_{i}"] = (
            1 + 0.1 * rng.normal(size=(B, ch[i])).astype(np.float32),
            0.1 * rng.normal(size=(B, ch[i])).astype(np.float32),
        )
    film_np["mid"] = (
        1 + 0.1 * rng.normal(size=(B, ch[-1])).astype(np.float32),
        0.1 * rng.normal(size=(B, ch[-1])).astype(np.float32),
    )
    for i in range(len(cfg.up_block_types)):
        film_np[f"up_{i}"] = (
            1 + 0.1 * rng.normal(size=(B, rev[i])).astype(np.float32),
            0.1 * rng.normal(size=(B, rev[i])).astype(np.float32),
        )

    t_refs = {k: torch.from_numpy(v) for k, v in refs_np.items()}
    t_film = {
        k: (torch.from_numpy(s), torch.from_numpy(sh))
        for k, (s, sh) in film_np.items()
    }
    with torch.no_grad():
        want = tm(x, t, ctx, t_refs, ref_scale, t_film).permute(0, 2, 3, 1).numpy()

    tree, skipped = convert_unet_state_dict(to_np_sd(tm))
    assert not skipped

    fm = UNet2DCondition(cfg)
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    tj = jnp.asarray(t.numpy())
    cj = jnp.asarray(ctx.numpy())
    j_refs = {k: jnp.asarray(v) for k, v in refs_np.items()}
    j_film = {k: (jnp.asarray(s), jnp.asarray(sh)) for k, (s, sh) in film_np.items()}
    # eval_shape: full-width init materialization is pointless — only the
    # tree structure + leaf shapes are being checked against the converter
    init = jax.eval_shape(
        fm.init, jax.random.PRNGKey(0), xj, tj, cj, ref_features=j_refs,
        film=j_film, ref_scale=jnp.float32(ref_scale),
    )["params"]
    assert_same_structure(tree, init)
    _assert_same_shapes(tree, init)

    @jax.jit
    def fwd(params, xj, tj, cj, j_refs, j_film):
        out, _ = fm.apply(
            {"params": params}, xj, tj, cj, ref_features=j_refs,
            film=j_film, ref_scale=jnp.float32(ref_scale),
        )
        return out

    got = fwd(tree, xj, tj, cj, j_refs, j_film)
    db = snr_db(want, np.asarray(got))
    assert db >= 60, f"SD2.1-width UNet (adapters+FiLM) parity {db:.1f} dB < 60"


@pytest.mark.slow
def test_full_vae_parity_sd21_width():
    """Full-width SD VAE (128-512ch, 32 groups): encode moments, decode,
    >=60 dB f32 through convert_vae_state_dict."""
    from mvd_tpu.nn.vae import AutoencoderKL

    cfg = VAEConfig(sample_size=64)
    torch.manual_seed(8)
    tm = TAutoencoderKL(cfg).eval()
    B, hw = 1, 64
    x = torch.randn(B, cfg.in_channels, hw, hw).clamp(-1, 1)
    with torch.no_grad():
        t_mean, t_logvar = tm.encode_moments(x)
        t_dec = tm.decode(t_mean)
    nhwc = lambda t: t.permute(0, 2, 3, 1).numpy()

    tree = convert_vae_state_dict(to_np_sd(tm))
    fm = AutoencoderKL(cfg)
    xj = jnp.asarray(nhwc(x))
    init = jax.eval_shape(fm.init, jax.random.PRNGKey(0), xj)["params"]
    assert_same_structure(tree, init)
    _assert_same_shapes(tree, init)

    j_mean, j_logvar = jax.jit(
        lambda p, x: fm.apply({"params": p}, x, method=fm.encode_moments)
    )(tree, xj)
    db_m = snr_db(nhwc(t_mean), np.asarray(j_mean))
    db_lv = snr_db(nhwc(t_logvar), np.asarray(j_logvar))
    assert db_m >= 60, f"SD-width VAE encode mean parity {db_m:.1f} dB < 60"
    assert db_lv >= 60, f"SD-width VAE encode logvar parity {db_lv:.1f} dB < 60"

    j_dec = jax.jit(
        lambda p, z: fm.apply({"params": p}, z, method=fm.decode)
    )(tree, j_mean)
    db_d = snr_db(nhwc(t_dec), np.asarray(j_dec))
    assert db_d >= 60, f"SD-width VAE decode parity {db_d:.1f} dB < 60"


@pytest.mark.slow
def test_full_denoise_step_parity_sd21_width():
    """One full denoise step (v-pred DDIM) at SD2.1 width: latents -> UNet
    -> scheduler update, torch vs jitted JAX, >=60 dB on the post-step
    latents (reference pipeline.py:140-161 composition at real width)."""
    from mvd_tpu.diffusion.schedules import NoiseSchedule, ddim_step
    from mvd_tpu.nn.unet import UNet2DCondition

    cfg = dataclasses.replace(SD21_WIDTH_UNET, with_adapters=False)
    ctx_dim = cfg.cross_attention_dim
    torch.manual_seed(9)
    tm = TUNet(cfg, ctx_dim).eval()
    B, hw = 1, cfg.sample_size
    lat = torch.randn(B, cfg.in_channels, hw, hw)
    ctx = torch.randn(B, 7, ctx_dim)
    num_steps, t_now = 20, 701

    betas = (
        torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64) ** 2
    ).float()
    ac = torch.cumprod(1 - betas, dim=0)
    t = torch.tensor([t_now] * B)
    with torch.no_grad():
        v = tm(lat, t, ctx)
        want = _t_ddim_step_vpred(ac, v, t_now, lat, num_steps)

    tree, skipped = convert_unet_state_dict(to_np_sd(tm))
    assert not skipped
    fm = UNet2DCondition(cfg)
    sched = NoiseSchedule.create(prediction_type="v_prediction")

    @jax.jit
    def step(params, lat, t, ctx):
        pred, _ = fm.apply({"params": params}, lat, t, ctx)
        return ddim_step(sched, pred, t[0], lat, num_steps)

    latj = jnp.asarray(lat.permute(0, 2, 3, 1).numpy())
    got = step(tree, latj, jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))
    db = snr_db(want.permute(0, 2, 3, 1).numpy(), np.asarray(got))
    assert db >= 60, f"SD2.1-width denoise step parity {db:.1f} dB < 60"
