"""Layer-level numerical parity vs INDEPENDENT torch reimplementations.

The ≥40 dB end-to-end golden parity (tools/parity/export_golden.py) needs a
host with diffusers + real SD2.1 weights; this suite runs UN-GATED in CI by
reimplementing the reference's building blocks in plain torch from the
diffusers spec (ResnetBlock2D, Transformer2DModel with use_linear_projection,
the VAE mid-block attention, a CLIP encoder layer, the adapter processor —
reference mvd_unet.py:46-52, attention.py:12-197), converting their state
dicts through checkpoint/torch_convert, and asserting fp32 agreement ≥60 dB.
Catches numerics/layout/key-mapping drift without any downloaded weights.
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
from flax.traverse_util import flatten_dict

from mvd_tpu.checkpoint.torch_convert import (
    convert_clip_text_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
)
from mvd_tpu.config import CLIPTextConfig
from mvd_tpu.nn.clip_text import CLIPLayer
from mvd_tpu.nn.layers import ResnetBlock, Transformer2D
from mvd_tpu.nn.vae import VAEAttention

torch.manual_seed(0)


def snr_db(want: np.ndarray, got: np.ndarray) -> float:
    want = np.asarray(want, np.float64)
    got = np.asarray(got, np.float64)
    err = np.mean((want - got) ** 2)
    if err == 0:
        return np.inf
    return float(10 * np.log10(np.mean(want**2) / err))


def to_np_sd(mod: tnn.Module, prefix: str = ""):
    return {prefix + k: v.detach().numpy() for k, v in mod.state_dict().items()}


def assert_same_structure(converted, init_params, path=""):
    a = set(flatten_dict(converted).keys())
    b = set(flatten_dict(init_params).keys())
    assert a == b, f"param tree mismatch{path}: only-converted={a - b}, only-init={b - a}"


# ---------------------------------------------------------------------------
# torch reference modules (independent reimplementations of the diffusers
# blocks the reference model is made of)
# ---------------------------------------------------------------------------


class TResnetBlock(tnn.Module):
    """diffusers ResnetBlock2D (SD variant: pre-norm, SiLU, additive temb)."""

    def __init__(self, in_ch, out_ch, temb_ch, groups=32):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=1e-5)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_ch, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=1e-5)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        s = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return s + h


def t_attention(q, k, v, heads):
    B, S, D = q.shape
    hd = D // heads
    sh = lambda t: t.view(B, -1, heads, hd).transpose(1, 2)
    q, k, v = sh(q), sh(k), sh(v)
    p = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
    return (p @ v).transpose(1, 2).reshape(B, S, D)


class TAttn(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_v = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        c = x if ctx is None else ctx
        o = t_attention(self.to_q(x), self.to_k(c), self.to_v(c), self.heads)
        return self.to_out[0](o)


class TAdapterProcessor(tnn.Module):
    """The trainable half of ImageCrossAttentionProcessor (reference
    attention.py:125-158): q from hidden, k/v from the (pre-normalized)
    reference feature, SDPA, out projection."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q_ref = tnn.Linear(dim, dim, bias=False)
        self.to_k_ref = tnn.Linear(dim, dim, bias=False)
        self.to_v_ref = tnn.Linear(dim, dim, bias=False)
        self.to_out_ref = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, hidden, ref):
        o = t_attention(
            self.to_q_ref(hidden), self.to_k_ref(ref), self.to_v_ref(ref), self.heads
        )
        return self.to_out_ref[0](o)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TBasicBlock(tnn.Module):
    def __init__(self, dim, ctx_dim, heads, with_adapters=False):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TAttn(dim, dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TAttn(dim, ctx_dim, heads)
        self.norm3 = tnn.LayerNorm(dim, eps=1e-5)
        self.ff = tnn.Module()
        self.ff.net = tnn.ModuleList(
            [TGEGLU(dim, dim * 4), tnn.Identity(), tnn.Linear(dim * 4, dim)]
        )
        if with_adapters:
            self.attn1.processor = TAdapterProcessor(dim, heads)
            self.attn2.processor = TAdapterProcessor(dim, heads)

    def forward(self, x, ctx, ref=None, ref_scale=0.0):
        h = self.norm1(x)
        a = self.attn1(h)
        if ref is not None:
            a = a + ref_scale * self.attn1.processor(h, ref)
        x = x + a
        h = self.norm2(x)
        a = self.attn2(h, ctx)
        if ref is not None:
            a = a + ref_scale * self.attn2.processor(h, ref)
        x = x + a
        h = self.norm3(x)
        return x + self.ff.net[2](self.ff.net[0](h))


class TTransformer2D(tnn.Module):
    """Transformer2DModel with use_linear_projection=True (SD2.x)."""

    def __init__(self, dim, ctx_dim, heads, with_adapters=False, groups=32):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = tnn.Linear(dim, dim)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(dim, ctx_dim, heads, with_adapters)]
        )
        self.proj_out = tnn.Linear(dim, dim)

    def forward(self, x, ctx, ref=None, ref_scale=0.0):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.proj_in(h)
        h = self.transformer_blocks[0](h, ctx, ref, ref_scale)
        h = self.proj_out(h)
        return h.reshape(B, H, W, C).permute(0, 3, 1, 2) + res


class TVAEAttention(tnn.Module):
    """diffusers VAE mid-block Attention: single head, head_dim=C."""

    def __init__(self, dim, groups=32):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.to_q = tnn.Linear(dim, dim)
        self.to_k = tnn.Linear(dim, dim)
        self.to_v = tnn.Linear(dim, dim)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        p = torch.softmax(
            self.to_q(h) @ self.to_k(h).transpose(-1, -2) / math.sqrt(C), dim=-1
        )
        h = self.to_out[0](p @ self.to_v(h))
        return x + h.reshape(B, H, W, C).permute(0, 3, 1, 2)


class TCLIPLayer(tnn.Module):
    def __init__(self, dim, heads, inter):
        super().__init__()
        self.heads = heads
        self.layer_norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.self_attn = tnn.Module()
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            setattr(self.self_attn, n, tnn.Linear(dim, dim))
        self.layer_norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, inter)
        self.mlp.fc2 = tnn.Linear(inter, dim)

    def forward(self, x, mask):
        B, S, D = x.shape
        hd = D // self.heads
        h = self.layer_norm1(x)
        sa = self.self_attn
        q = sa.q_proj(h) * hd**-0.5
        sh = lambda t: t.view(B, S, self.heads, hd).transpose(1, 2)
        p = torch.softmax(sh(q) @ sh(sa.k_proj(h)).transpose(-1, -2) + mask, dim=-1)
        o = (p @ sh(sa.v_proj(h))).transpose(1, 2).reshape(B, S, D)
        x = x + sa.out_proj(o)
        h = self.layer_norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h), approximate="none"))


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


def test_resnet_block_parity():
    B, Cin, Cout, Td, HW = 2, 32, 64, 96, 8
    tm = TResnetBlock(Cin, Cout, Td).eval()
    x = torch.randn(B, Cin, HW, HW)
    temb = torch.randn(B, Td)
    with torch.no_grad():
        want = tm(x, temb).permute(0, 2, 3, 1).numpy()

    sd = to_np_sd(tm, "mid_block.resnets.0.")
    tree, skipped = convert_unet_state_dict(sd)
    assert not skipped
    params = tree["mid_resnet_0"]

    fm = ResnetBlock(out_channels=Cout)
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    tj = jnp.asarray(temb.numpy())
    init = fm.init(jax.random.PRNGKey(0), xj, tj)["params"]
    assert_same_structure(params, init)
    got = fm.apply({"params": params}, xj, tj)
    db = snr_db(want, np.asarray(got))
    assert db >= 60, f"ResnetBlock parity {db:.1f} dB < 60"


@pytest.mark.parametrize("with_adapters", [False, True])
def test_transformer2d_parity(with_adapters):
    B, C, HW, heads, ctx_dim, Sc = 2, 32, 8, 2, 48, 7
    tm = TTransformer2D(C, ctx_dim, heads, with_adapters).eval()
    x = torch.randn(B, C, HW, HW)
    ctx = torch.randn(B, Sc, ctx_dim)
    ref = torch.randn(B, HW * HW, C) if with_adapters else None
    ref_scale = 0.3
    with torch.no_grad():
        want = tm(x, ctx, ref, ref_scale).permute(0, 2, 3, 1).numpy()

    sd = to_np_sd(tm, "down_blocks.0.attentions.0.")
    tree, skipped = convert_unet_state_dict(sd)
    assert not skipped
    params = tree["down_0_attn_0"]

    fm = Transformer2D(
        heads=heads, head_dim=C // heads, with_adapters=with_adapters,
        attention_impl="xla",
    )
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    cj = jnp.asarray(ctx.numpy())
    rj = None if ref is None else jnp.asarray(ref.numpy())
    init = fm.init(jax.random.PRNGKey(0), xj, cj, rj)["params"]
    assert_same_structure(params, init)
    got = fm.apply(
        {"params": params}, xj, cj, rj,
        jnp.float32(ref_scale) if with_adapters else None,
    )
    db = snr_db(want, np.asarray(got))
    assert db >= 60, f"Transformer2D(adapters={with_adapters}) parity {db:.1f} dB < 60"


def test_vae_attention_parity():
    B, C, HW = 2, 32, 6
    tm = TVAEAttention(C).eval()
    x = torch.randn(B, C, HW, HW)
    with torch.no_grad():
        want = tm(x).permute(0, 2, 3, 1).numpy()

    sd = to_np_sd(tm, "encoder.mid_block.attentions.0.")
    tree = convert_vae_state_dict(sd)
    params = tree["encoder"]["mid_attn"]

    fm = VAEAttention()
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    init = fm.init(jax.random.PRNGKey(0), xj)["params"]
    assert_same_structure(params, init)
    got = fm.apply({"params": params}, xj)
    db = snr_db(want, np.asarray(got))
    assert db >= 60, f"VAEAttention parity {db:.1f} dB < 60"


def test_clip_layer_parity():
    B, S, D, heads, inter = 2, 11, 64, 4, 128
    tm = TCLIPLayer(D, heads, inter).eval()
    x = torch.randn(B, S, D)
    mask = torch.triu(torch.full((S, S), -1e9), diagonal=1)[None, None]
    with torch.no_grad():
        want = tm(x, mask).numpy()

    sd = to_np_sd(tm, "text_model.encoder.layers.0.")
    tree = convert_clip_text_state_dict(sd)
    params = tree["layers_0"]

    cfg = CLIPTextConfig(hidden_size=D, num_heads=heads, intermediate_size=inter)
    fm = CLIPLayer(cfg)
    xj = jnp.asarray(x.numpy())
    mj = jnp.asarray(mask.numpy())
    init = fm.init(jax.random.PRNGKey(0), xj, mj)["params"]
    assert_same_structure(params, init)
    got = fm.apply({"params": params}, xj, mj)
    db = snr_db(want, np.asarray(got))
    assert db >= 60, f"CLIPLayer parity {db:.1f} dB < 60"


# ---------------------------------------------------------------------------
# full tiny-UNet composition: end-to-end parity without diffusers
# ---------------------------------------------------------------------------


def t_timestep_embedding(t, dim):
    """diffusers get_timestep_embedding (flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = t[:, None].float() * exponent.exp()[None]
    return torch.cat([emb.cos(), emb.sin()], dim=-1)


class TUNet(tnn.Module):
    """UNet2DConditionModel skeleton composed from the blocks above, with
    diffusers' state-dict key layout (down_blocks.i.resnets.j etc.), so the
    whole convert_unet_state_dict translation + skip ordering + timestep
    embedding path is exercised end-to-end."""

    def __init__(self, cfg, ctx_dim, with_adapters=False):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        temb_ch = ch[0] * 4
        self.cfg = cfg
        self.with_adapters = with_adapters
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = tnn.Module()
        self.time_embedding.linear_1 = tnn.Linear(ch[0], temb_ch)
        self.time_embedding.linear_2 = tnn.Linear(temb_ch, temb_ch)

        skip_ch = [ch[0]]
        self.down_blocks = tnn.ModuleList()
        cur = ch[0]
        for i, btype in enumerate(cfg.down_block_types):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            has_attn = btype == "CrossAttnDownBlock2D"
            if has_attn:
                blk.attentions = tnn.ModuleList()
            for j in range(cfg.layers_per_block):
                blk.resnets.append(TResnetBlock(cur, ch[i], temb_ch, g))
                cur = ch[i]
                if has_attn:
                    blk.attentions.append(
                        TTransformer2D(ch[i], ctx_dim, cfg.num_attention_heads[i],
                                       with_adapters, groups=g)
                    )
                skip_ch.append(cur)
            if i < len(cfg.down_block_types) - 1:
                ds = tnn.Module()
                ds.conv = tnn.Conv2d(cur, cur, 3, stride=2, padding=1)
                blk.downsamplers = tnn.ModuleList([ds])
                skip_ch.append(cur)
            self.down_blocks.append(blk)

        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnetBlock(cur, ch[-1], temb_ch, g), TResnetBlock(ch[-1], ch[-1], temb_ch, g)]
        )
        self.mid_block.attentions = tnn.ModuleList(
            [TTransformer2D(ch[-1], ctx_dim, cfg.num_attention_heads[-1],
                            with_adapters, groups=g)]
        )
        cur = ch[-1]

        rev = list(reversed(ch))
        self.up_blocks = tnn.ModuleList()
        for i, btype in enumerate(cfg.up_block_types):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            has_attn = btype == "CrossAttnUpBlock2D"
            if has_attn:
                blk.attentions = tnn.ModuleList()
            ai = len(ch) - 1 - i
            for j in range(cfg.layers_per_block + 1):
                s = skip_ch.pop()
                blk.resnets.append(TResnetBlock(cur + s, rev[i], temb_ch, g))
                cur = rev[i]
                if has_attn:
                    blk.attentions.append(
                        TTransformer2D(rev[i], ctx_dim, cfg.num_attention_heads[ai],
                                       with_adapters, groups=g)
                    )
            if i < len(cfg.up_block_types) - 1:
                us = tnn.Module()
                us.conv = tnn.Conv2d(cur, cur, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            self.up_blocks.append(blk)

        self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=cfg.norm_eps)
        self.conv_out = tnn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx, refs=None, ref_scale=0.0, film=None):
        """refs: {feature_name: (B, S, C)} adapter reference features;
        film: {name: (scale (B,C), shift (B,C))} applied at the SAME points
        as mvd_tpu/nn/unet.py (input "output", post-block down_i/mid/up_i)."""
        refs = refs or {}

        def fl(h, name):
            if film and name in film:
                s, sh = film[name]
                return h * s[:, :, None, None] + sh[:, :, None, None]
            return h

        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(t_timestep_embedding(t, self.cfg.block_out_channels[0])))
        )
        h = self.conv_in(fl(x, "output"))
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, rn in enumerate(blk.resnets):
                h = rn(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](
                        h, ctx, refs.get(f"down_block_{i}_attn_{j}"), ref_scale
                    )
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)
            h = fl(h, f"down_{i}")
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](
            h, ctx, refs.get("mid_block_attn_0"), ref_scale
        )
        h = self.mid_block.resnets[1](h, temb)
        h = fl(h, "mid")
        for i, blk in enumerate(self.up_blocks):
            for j, rn in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = rn(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](
                        h, ctx, refs.get(f"up_block_{i}_attn_{j}"), ref_scale
                    )
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
            h = fl(h, f"up_{i}")
        h = F.silu(self.conv_norm_out(h))
        return self.conv_out(h)


def test_full_unet_parity():
    """Whole tiny UNet: torch composition -> convert_unet_state_dict ->
    UNet2DCondition, >=60 dB. Covers block-rule key translation, timestep
    embedding, skip ordering, down/upsample paths in one shot."""
    from mvd_tpu.config import TINY_UNET
    from mvd_tpu.nn.unet import UNet2DCondition

    cfg = dataclasses.replace(TINY_UNET, with_adapters=False, attention_impl="xla")
    ctx_dim = cfg.cross_attention_dim
    tm = TUNet(cfg, ctx_dim).eval()
    B, hw = 2, cfg.sample_size
    x = torch.randn(B, cfg.in_channels, hw, hw)
    t = torch.tensor([123, 800])
    ctx = torch.randn(B, 7, ctx_dim)
    with torch.no_grad():
        want = tm(x, t, ctx).permute(0, 2, 3, 1).numpy()

    tree, skipped = convert_unet_state_dict(to_np_sd(tm))
    assert not skipped

    fm = UNet2DCondition(cfg)
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    tj = jnp.asarray(t.numpy())
    cj = jnp.asarray(ctx.numpy())
    init = fm.init(jax.random.PRNGKey(0), xj, tj, cj)["params"]
    assert_same_structure(tree, init)
    got, feats = fm.apply({"params": tree}, xj, tj, cj)
    db = snr_db(want, np.asarray(got))
    assert db >= 60, f"full UNet parity {db:.1f} dB < 60"
    assert "down_block_0_attn_0" in feats and "mid_block_attn_0" in feats
