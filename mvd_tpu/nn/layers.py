"""Core Flax building blocks for the SD2.1-class UNet and VAE.

TPU-native notes:
  * layout is NHWC end-to-end (TPU conv-friendly; torch NCHW weights are
    transposed by the checkpoint converter),
  * params are float32, compute dtype is a knob (bf16 on TPU),
  * GroupNorm/LayerNorm/softmax accumulate in float32,
  * attention dispatches to the Pallas flash kernel on TPU
    (mvd_tpu/kernels/flash_attention.py) and XLA elsewhere.

Architecture matches diffusers' UNet2DConditionModel /AutoencoderKL modules
used by the reference (loaded at /root/reference/src/models/mvd_unet.py:46-52)
so that the weight converter is a pure renaming + transpose.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..kernels.flash_attention import attention as attention_dispatch
from ..kernels.flash_attention import attention_packed


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers ``get_timestep_embedding``
    semantics; SD uses flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedMLP(nn.Module):
    """time_embedding: Linear -> SiLU -> Linear (320 -> 1280 -> 1280)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)
        return x


class GroupNorm(nn.Module):
    """GroupNorm with float32 statistics regardless of compute dtype.

    ``fuse_silu`` folds the SiLU that follows almost every GroupNorm in the
    UNet/VAE into the same pass; on TPU this dispatches to the fused Pallas
    kernel (kernels/groupnorm_silu.py) when the layout tiles."""

    num_groups: int = 32
    epsilon: float = 1e-5
    fuse_silu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..kernels.groupnorm_silu import groupnorm_silu

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return groupnorm_silu(
            x, scale, bias, self.num_groups, self.epsilon, apply_silu=self.fuse_silu
        )


class StreamingLayerNorm(nn.Module):
    """LayerNorm with f32 row statistics but WITHOUT materializing the
    activation in f32: means/variances come from dtype-accumulated reduces,
    the normalize+affine applies in the input dtype (per-row f32-derived
    scalars). Same param structure (scale/bias) as nn.LayerNorm. The
    nn.LayerNorm(dtype=f32) + astype(bf16) formulation emits full-size f32
    intermediates on TPU — the same pathology profiled for GroupNorm."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        sq = jnp.mean(x * x, axis=-1, keepdims=True, dtype=jnp.float32)
        var = jnp.maximum(sq - mean * mean, 0.0)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        y = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def normalize_ref_feature(feat: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Adapter K/V pre-normalization (reference attention.py:95-103).

    The reference normalizes the raw 4D NCHW feature over dims (batch,
    channel) with an unbiased std, clamps the std, and rescales by 0.5 —
    under no_grad. In NHWC the equivalent axes are (0, 3); gradients are
    stopped to match.
    """
    feat = jax.lax.stop_gradient(feat).astype(jnp.float32)
    mean = feat.mean(axis=(0, 3), keepdims=True)
    n = feat.shape[0] * feat.shape[3]
    var = ((feat - mean) ** 2).sum(axis=(0, 3), keepdims=True) / max(n - 1, 1)
    std = jnp.maximum(jnp.sqrt(var), eps)
    return (feat - mean) / std * 0.5


class _DenseParams(nn.Module):
    """Declares the same ``{kernel}`` param (same name, shape, init) as a
    bias-free ``nn.Dense`` — without computing.  Lets the caller concatenate
    several projections that share an input into ONE matmul (exact math:
    each output column block only sees its own kernel columns), while the
    param tree stays checkpoint-identical to the unfused Dense modules."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )


def _use_fused_qkv() -> bool:
    """Fuse projections sharing an input into one matmul.

    Exact-math rewrite (concatenated kernels).  A/B'd on the chip
    (end-to-end bench, 4-view 512²): wall-neutral — 3.967 vs 3.976 img/sec,
    within day-to-day variance.  The projection matmuls are already
    MXU-bound and XLA schedules the three reads of the shared input out of
    HBM once, so fusing buys nothing.  Kept off by default
    (MVD_FUSED_QKV=1 enables) as a documented closed-out experiment."""
    import os

    return os.environ.get("MVD_FUSED_QKV", "0") == "1"


class CrossViewAdapter(nn.Module):
    """Image cross-attention adapter (reference attention.py:12-197).

    Queries come from the current view's (pre-normed) hidden states, keys and
    values from the frozen feature extractor's output for the same layer.
    Output is scaled by ``ref_scale`` and added to the base attention output
    by the caller. ``to_q_ref``/``to_k_ref``/``to_v_ref`` are bias-free,
    ``to_out_ref`` has bias, matching the reference's trainable adapter.
    """

    heads: int
    head_dim: int
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, ref) -> jnp.ndarray:
        """``ref`` is either the normalized reference features (B, Sk, C) or
        a precomputed (k, v) tuple of (B, H, Sk, head_dim) — the K/V
        projections are step-invariant, so the sampling pipeline hoists them
        out of the denoise loop (MultiViewUNet.prepare_conditioning)."""
        B, S, D = hidden.shape
        inner = self.heads * self.head_dim
        # packed (B, S, H*head_dim) layout end-to-end — no head transposes
        # (profiled at 2.3 ms/step of pure copies across the UNet's
        # attention sites; kernels/flash_attention.attention_packed)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q_ref")(hidden)
        if isinstance(ref, tuple):
            k, v = ref  # (B, Sk, inner), precomputed by the pipeline
            # cast to the COMPUTE dtype (q's), not hidden's: the residual
            # stream is f32, and upcasting the precomputed K/V fed every
            # adapter flash kernel f32 operands — the MXU's slow path, 2x
            # the K/V VMEM (a scoped-VMEM compile OOM at 768² 8-view), and
            # a dtype the self-attention path never uses
            k = k.astype(q.dtype)
            v = v.astype(q.dtype)
        elif _use_fused_qkv():
            # K/V share the ref input: one matmul over concatenated kernels
            wk = _DenseParams(inner, name="to_k_ref")(ref.shape[-1])
            wv = _DenseParams(inner, name="to_v_ref")(ref.shape[-1])
            w = jnp.concatenate([wk, wv], axis=1).astype(self.dtype)
            kv = jnp.dot(ref.astype(self.dtype), w)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ref")(
                ref.astype(hidden.dtype)
            )
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ref")(
                ref.astype(hidden.dtype)
            )
        out = attention_packed(q, k, v, self.heads, impl=self.attention_impl)
        out = nn.Dense(D, dtype=self.dtype, name="to_out_ref")(out)
        return out


class Attention(nn.Module):
    """Multi-head attention: self (context=None) or cross.

    Joint multi-view self-attention: with ``num_views > 1`` the flat
    (B*V, S, D) rows are regrouped into (B, V*S, D) so every view attends to
    every other view's tokens. If ``view_axis`` names a bound mesh axis
    (i.e. we are inside shard_map with the view dimension sharded), the
    local views attend to the GLOBAL sequence via the ring collective."""

    heads: int
    head_dim: int
    attention_impl: str = "auto"
    out_dim: Optional[int] = None
    num_views: int = 1
    view_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, context: Optional[jnp.ndarray] = None):
        B, S, D = hidden.shape
        is_self = context is None
        ctx = hidden if is_self else context.astype(hidden.dtype)
        Sk = ctx.shape[1]
        inner = self.heads * self.head_dim
        if _use_fused_qkv():
            wq = _DenseParams(inner, name="to_q")(D)
            wk = _DenseParams(inner, name="to_k")(ctx.shape[-1])
            wv = _DenseParams(inner, name="to_v")(ctx.shape[-1])
            if is_self:
                # q/k/v share the input: ONE (D -> 3*inner) matmul
                w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
                q, k, v = jnp.split(
                    jnp.dot(hidden.astype(self.dtype), w), 3, axis=-1
                )
            else:
                # k/v share the context: one (D_ctx -> 2*inner) matmul
                q = jnp.dot(hidden.astype(self.dtype), wq.astype(self.dtype))
                w = jnp.concatenate([wk, wv], axis=1).astype(self.dtype)
                k, v = jnp.split(jnp.dot(ctx.astype(self.dtype), w), 2, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(hidden)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        joint = is_self and self.num_views > 1
        if joint:
            from jax import lax

            V = self.num_views
            if self.view_axis is not None:
                V = V // lax.psum(1, self.view_axis)  # local views per shard
            nb = B // V
            if self.view_axis is not None:
                # packed (B, V_local*S, H*D) shards straight into the ring —
                # same zero-head-transpose rule as the unsharded sites (the
                # old (B,H,S,D) split cost a copy pair at every sharded
                # attention site)
                from ..kernels.ring_attention import ring_attention_packed

                merge = lambda t, s: t.reshape(nb, V * s, inner)
                out = ring_attention_packed(
                    merge(q, S), merge(k, Sk), merge(v, Sk), self.heads,
                    axis_name=self.view_axis, impl=self.attention_impl,
                )
                out = out.reshape(B, S, inner)
            else:
                # merging the view axis into the sequence is a FREE reshape in
                # the packed (B*V, S, H*D) layout — no head transposes
                merge = lambda t, s: t.reshape(nb, V * s, inner)
                out = attention_packed(
                    merge(q, S), merge(k, Sk), merge(v, Sk), self.heads,
                    impl=self.attention_impl,
                )
                out = out.reshape(B, S, inner)
        else:
            # packed layout: no head transposes (see CrossViewAdapter note)
            out = attention_packed(q, k, v, self.heads, impl=self.attention_impl)
        out = nn.Dense(self.out_dim or D, dtype=self.dtype, name="to_out")(out)
        return out


class FeedForward(nn.Module):
    """GEGLU feed-forward (dim -> 4*dim gated -> dim)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj_geglu")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF, each residual.

    When adapters are enabled and a reference feature is provided, the
    adapter contribution (scaled by ``ref_scale``) is added to the base
    attention output before the residual add — the explicit-dataflow
    equivalent of the reference's processor wrapping
    (attention.py:62-188)."""

    heads: int
    head_dim: int
    with_adapters: bool = False
    ref_scale: float = 0.3
    attention_impl: str = "auto"
    num_views: int = 1
    view_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context,
        ref: Optional[jnp.ndarray] = None,
        ref_scale: Optional[jnp.ndarray] = None,
    ):
        ln = lambda name: StreamingLayerNorm(epsilon=1e-5, name=name)
        kw = dict(
            heads=self.heads,
            head_dim=self.head_dim,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
        )
        # runtime-overridable adapter scale (the reference uses 0.3 at train,
        # 0.1 at validation, 1.0 at infer — a traced scalar avoids recompiles)
        scale = self.ref_scale if ref_scale is None else ref_scale

        # per-layer ref: raw features (shared by both adapters, reference
        # behavior) or a {"self": (k,v), "cross": (k,v)} precomputed dict
        if isinstance(ref, dict):
            ref_self, ref_cross = ref.get("self"), ref.get("cross")
        else:
            ref_self = ref_cross = ref

        h = ln("norm1")(x).astype(x.dtype)
        a = Attention(
            **kw, num_views=self.num_views, view_axis=self.view_axis, name="attn1"
        )(h)
        if self.with_adapters:
            adapter = CrossViewAdapter(**kw, name="adapter_self")
            if ref_self is not None:
                a = a + scale * adapter(h, ref_self)
            else:
                # keep params materialized for checkpoint-shape stability
                _ = adapter(h[:, :1], h[:, :1]) * 0.0
        x = x + a

        h = ln("norm2")(x).astype(x.dtype)
        a = Attention(**kw, name="attn2")(h, context)
        if self.with_adapters:
            adapter = CrossViewAdapter(**kw, name="adapter_cross")
            if ref_cross is not None:
                a = a + scale * adapter(h, ref_cross)
            else:
                _ = adapter(h[:, :1], h[:, :1]) * 0.0
        x = x + a

        h = ln("norm3")(x).astype(x.dtype)
        x = x + FeedForward(dim=x.shape[-1], dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """diffusers Transformer2DModel with use_linear_projection=True
    (SD2.x): GroupNorm -> linear proj_in -> transformer blocks -> linear
    proj_out -> residual."""

    heads: int
    head_dim: int
    num_layers: int = 1
    norm_num_groups: int = 32
    with_adapters: bool = False
    ref_scale: float = 0.3
    attention_impl: str = "auto"
    num_views: int = 1
    view_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context,
        ref: Optional[jnp.ndarray] = None,
        ref_scale: Optional[jnp.ndarray] = None,
    ):
        B, H, W, C = x.shape
        residual = x
        h = GroupNorm(self.norm_num_groups, 1e-6, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(self.heads * self.head_dim, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                heads=self.heads,
                head_dim=self.head_dim,
                with_adapters=self.with_adapters,
                ref_scale=self.ref_scale,
                attention_impl=self.attention_impl,
                num_views=self.num_views,
                view_axis=self.view_axis,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, context, ref, ref_scale)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(B, H, W, C) + residual


class Conv3x3(nn.Module):
    """3x3 stride-1 SAME conv with the same param structure as nn.Conv,
    dispatching to the shifted-matmul path (kernels/conv.py) when it wins
    on TPU."""

    out_channels: int
    impl: str = "auto"  # auto | xla | shifted
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..kernels.conv import conv3x3_shifted, use_shifted

        C = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, C, self.out_channels),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        if use_shifted(x.shape, kernel.shape, 1, self.impl):
            return conv3x3_shifted(x, kernel.astype(self.dtype), bias)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)


class ResnetBlock(nn.Module):
    """SD ResnetBlock2D: pre-norm, SiLU, 3x3 convs, additive time embedding,
    1x1 shortcut on channel change."""

    out_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        in_ch = x.shape[-1]
        h = GroupNorm(self.norm_num_groups, self.norm_eps, fuse_silu=True, name="norm1")(x)
        # named so a remat policy can optionally save conv outputs
        # (MVD_REMAT_POLICY=flash_conv, nn/unet.py)
        h = checkpoint_name(
            Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")(h), "conv_out"
        )
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :].astype(h.dtype)
        h = GroupNorm(self.norm_num_groups, self.norm_eps, fuse_silu=True, name="norm2")(h)
        h = checkpoint_name(
            Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")(h), "conv_out"
        )
        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class Downsample(nn.Module):
    """3x3 stride-2 conv; ``asymmetric_pad`` matches the VAE encoder's
    (0,1)x(0,1) padding, the UNet uses symmetric padding=1."""

    out_channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = 1
        return nn.Conv(
            self.out_channels, (3, 3), strides=2, padding=pad, dtype=self.dtype, name="conv"
        )(x)


def conv3x3_after_nearest_x2(x, kernel, bias):
    """``3x3 SAME conv(nearest-x2(x))`` computed WITHOUT materializing the
    upsampled tensor (subpixel identity): because upsampled pixels repeat in
    2x2 blocks, each of the four output phases (di, dj) sees at most 2
    distinct source rows/cols, so the 3x3 kernel folds into four 2x2 phase
    kernels — one VALID 2x2 conv at LOW resolution with 4*Cout channels,
    then a phase interleave. 2.25x fewer conv FLOPs and ~3x less HBM traffic
    than upsample-then-conv (the broadcast+conv formulation cost ~30 ms of
    the VAE decoder's 164 ms at 4x512², profiled).

    Exactly equivalent arithmetic up to f32 re-association of kernel taps.
    x: (B, H, W, C) NHWC; kernel: (3, 3, C, O) HWIO.
    """
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    k = kernel

    def fold(di, dj):
        # output phase (di, dj) taps source rows {i-1, i} (di=0: kernel rows
        # [W0, W1+W2]) or {i, i+1} (di=1: [W0+W1, W2]); same along columns
        if di == 0:
            r = jnp.concatenate([k[0:1], k[1:3].sum(0, keepdims=True)], axis=0)
        else:
            r = jnp.concatenate([k[0:2].sum(0, keepdims=True), k[2:3]], axis=0)
        if dj == 0:
            return jnp.concatenate(
                [r[:, 0:1], r[:, 1:3].sum(1, keepdims=True)], axis=1
            )
        return jnp.concatenate([r[:, 0:2].sum(1, keepdims=True), r[:, 2:3]], axis=1)

    w4 = jnp.concatenate(
        [fold(0, 0), fold(0, 1), fold(1, 0), fold(1, 1)], axis=-1
    )  # (2, 2, C, 4*O)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w4.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+1, W+1, 4*O)
    phases = [
        y[:, di : di + H, dj : dj + W, (2 * di + dj) * O : (2 * di + dj + 1) * O]
        for di in (0, 1)
        for dj in (0, 1)
    ]
    top = jnp.stack(phases[:2], axis=3)  # (B, H, W, 2, O) — dj axis
    bot = jnp.stack(phases[2:], axis=3)
    t = jnp.stack([top, bot], axis=2)  # (B, H, 2[di], W, 2[dj], O)
    out = t.reshape(B, 2 * H, 2 * W, O)
    return out + bias.astype(out.dtype)


def conv3x3_after_nearest_x2_transposed(x, kernel, bias):
    """``3x3 SAME conv(nearest-x2(x))`` as ONE lhs-dilated (transposed) conv.

    Because XLA convolution is correlation, output phase p receives x[i] with
    weight W[2i - p + 2] along each spatial dim, so the 3-tap kernel folds to
    the 4-tap ``[K0, K0+K1, K1+K2, K2]`` and the conv emits the interleaved
    double-resolution output directly — no phase slice/stack formatting
    (which cost ~12 ms of the 4x512² VAE decode with the subpixel-slice
    formulation; see benchmarks/upsample_bench.py: 19.3 -> 11.1 ms at the
    up_2 shape). Exact up to f32 tap re-association.
    """
    r = jnp.asarray(
        [[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], kernel.dtype
    )
    k4 = jnp.einsum("ar,rsio,bs->abio", r, kernel, r)
    y = jax.lax.conv_general_dilated(
        x,
        k4.astype(x.dtype),
        (1, 1),
        ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


class _Conv3x3Params(nn.Module):
    """Parameter-only twin of nn.Conv's (3,3) param structure, so Upsample
    can own ``conv/kernel``+``conv/bias`` (checkpoint-compatible) while
    applying them through the folded subpixel formulation."""

    out_channels: int

    @nn.compact
    def __call__(self, in_channels: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_channels, self.out_channels),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,), jnp.float32
        )
        return kernel, bias


class Upsample(nn.Module):
    """Nearest x2 then 3x3 conv, computed as one lhs-dilated conv with the
    folded 4-tap kernel (conv3x3_after_nearest_x2_transposed — the fastest
    formulation at every UNet/VAE shape, benchmarks/upsample_bench.py).
    ``MVD_UPSAMPLE=subpixel`` restores the phase-slice subpixel fold,
    ``MVD_UPSAMPLE=naive`` the materialized upsample-then-conv path."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        B, H, W, C = x.shape
        kernel, bias = _Conv3x3Params(self.out_channels, name="conv")(C)
        mode = os.environ.get("MVD_UPSAMPLE", "transposed")
        if os.environ.get("MVD_NAIVE_UPSAMPLE", "0") == "1":  # legacy knob
            mode = "naive"
        if mode == "naive":
            up = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
            up = up.reshape(B, H * 2, W * 2, C).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                up, kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(y.dtype)
        if mode == "subpixel":
            return conv3x3_after_nearest_x2(
                x.astype(self.dtype), kernel.astype(self.dtype), bias
            )
        return conv3x3_after_nearest_x2_transposed(
            x.astype(self.dtype), kernel.astype(self.dtype), bias
        )
