"""Pallas TPU flash attention for the diffusion UNet.

Replaces the reference's CUDA fused attention
(``F.scaled_dot_product_attention``, reference src/models/attention.py:148-150
and diffusers' memory-efficient attention, mvd_unet.py:39) with a TPU-native
online-softmax kernel:

  * forward: tiled over (batch*heads, q-blocks), K/V streamed through VMEM,
    f32 accumulation on the MXU, no materialized S×S attention matrix;
  * backward: custom VJP with a recomputation-based kernel (dq in one pass,
    dk/dv in a second pass tiled over k-blocks) — the standard flash
    backward, so training never materializes attention either;
  * no masking — diffusion self/cross attention is full (non-causal), which
    keeps both kernels branch-free.

Layout: (B, H, S, D) with D the lane dimension (64 for SD2.1 heads). Falls
back to a pure-XLA attention for tiny sequences (where kernel launch +
padding overhead beats the win) and on non-TPU backends; the fallback is also
the numerical reference for the kernel's unit tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sequences shorter than this run the XLA path: one MXU-tile worth of rows.
_MIN_PALLAS_SEQ = 1024


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Reference / fallback implementation (also used on CPU and for tests)
# ---------------------------------------------------------------------------


def xla_attention(q, k, v, scale=None):
    """Plain attention, f32 softmax accumulation. q,k,v: (B, H, S, D)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel_grid(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_s, l_s,
                     *, scale, block_k, nk, kv_valid, kv_len):
    """One (bh, q-block, k-block) grid step: the k dimension lives in the
    GRID (not a fori_loop) with the online-softmax state carried in VMEM
    scratch — Mosaic then double-buffers the K/V block loads and overlaps
    them with compute across grid steps (+12% at the 4096-token hot shape
    vs the in-kernel loop).

    VPU-pass economy (the kernel is VPU- not MXU-bound at D=64): the scale
    is folded into q (one (bq,D) multiply instead of a (bq,bk) pass), exp
    writes p directly in the matmul dtype, and the row-sum of p rides the
    P·V matmul via a ones-column appended to V — the MXU output tile is 128
    lanes wide, so with D=64 the extra column is free. Net: two elementwise
    passes over the score tile (max-read, exp) instead of five."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)

    q = q_ref[0] * scale  # (bq, D): folds the scale off the score tile
    k = k_ref[0]
    v = v_ref[0]
    d = v.shape[-1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_valid < kv_len:  # static: masked tail columns (tail block only)
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_valid, s, -jnp.inf)
    m_prev = m_s[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new).astype(v.dtype)
    alpha = jnp.exp(m_prev - m_new)
    # [P·V | P·1]: accumulator columns and the row-sum in one MXU op
    v_aug = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1)
    pv = jax.lax.dot_general(
        p, v_aug, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    l_s[:] = alpha * l_s[:] + pv[:, d:]
    acc[:] = acc[:] * alpha + pv[:, :d]
    m_s[:] = m_new

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc[:] / l_s[:]).astype(o_ref.dtype)
        lse_ref[0] = m_s[:] + jnp.log(l_s[:])


def _flash_fwd(q, k, v, scale, block_q, block_k, kv_valid, interpret):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    bh = B * H
    q = q.reshape(bh, Sq, D)
    k = k.reshape(bh, Sk, D)
    v = v.reshape(bh, Sk, D)

    block_q = min(block_q, Sq)
    block_k = min(block_k, Sk)
    nk = _cdiv(Sk, block_k)
    grid = (bh, _cdiv(Sq, block_q), nk)

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_grid, scale=scale, block_k=block_k, nk=nk,
            kv_valid=kv_valid, kv_len=Sk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((bh, Sq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out.reshape(B, H, Sq, D), lse.reshape(B, H, Sq)


# ---------------------------------------------------------------------------
# Packed-layout forward: (B, S, H*D), heads sliced in-kernel
# ---------------------------------------------------------------------------


def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_s, l_s,
                       *, heads, head_dim, scale, block_k, nk, kv_valid, kv_len):
    """Grid step over (B, q-block, k-block) with ALL heads processed by a
    static in-kernel loop on the packed (bq, H*D) block. Avoids the
    (B,S,H,D)->(B,H,S,D) head transposes entirely — profiled at 2.3 ms/step
    of pure layout copies across the UNet's ~30 attention sites — and runs
    slightly faster than the transposed kernel even in isolation (1.74 vs
    1.85 ms at B4/H5/S4096/D64: 5x fewer grid steps amortize the softmax
    state updates)."""
    ki = pl.program_id(2)
    D = head_dim

    @pl.when(ki == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)

    qf = q_ref[0]
    kf = k_ref[0]
    vf = v_ref[0]
    if kv_valid < kv_len:  # static: tail columns live in the last k-block
        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (qf.shape[0], kf.shape[0]), 1
        )
        tail_mask = col < kv_valid
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        qb = qf[:, sl] * scale
        s = jax.lax.dot_general(
            qb, kf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if kv_valid < kv_len:
            s = jnp.where(tail_mask, s, -jnp.inf)
        vb = vf[:, sl]
        m_prev = m_s[:, h : h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new).astype(vb.dtype)
        alpha = jnp.exp(m_prev - m_new)
        v_aug = jnp.concatenate(
            [vb, jnp.ones((vb.shape[0], 1), vb.dtype)], axis=-1
        )
        pv = jax.lax.dot_general(
            p, v_aug, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        l_s[:, h : h + 1] = alpha * l_s[:, h : h + 1] + pv[:, D:]
        acc[:, sl] = acc[:, sl] * alpha + pv[:, :D]
        m_s[:, h : h + 1] = m_new

    @pl.when(ki == nk - 1)
    def _():
        for h in range(heads):
            sl = slice(h * D, (h + 1) * D)
            o_ref[0, :, sl] = (acc[:, sl] / l_s[:, h : h + 1]).astype(o_ref.dtype)
        lse_ref[0] = m_s[:] + jnp.log(l_s[:])


def _flash_fwd_packed(q, k, v, heads, scale, block_q, block_k, kv_valid, interpret):
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // heads

    block_q = min(block_q, Sq)
    block_k = min(block_k, Sk)
    nk = _cdiv(Sk, block_k)
    grid = (B, _cdiv(Sq, block_q), nk)

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_packed, heads=heads, head_dim=D, scale=scale,
            block_k=block_k, nk=nk, kv_valid=kv_valid, kv_len=Sk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, HD), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, HD), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, HD), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, HD), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, heads), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sq, HD), q.dtype),
            jax.ShapeDtypeStruct((B, Sq, heads), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, HD), jnp.float32),
            pltpu.VMEM((block_q, heads), jnp.float32),
            pltpu.VMEM((block_q, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention_packed(q, k, v, heads, scale, block_q, block_k, kv_valid, interpret):
    out, _ = _flash_fwd_packed(q, k, v, heads, scale, block_q, block_k, kv_valid, interpret)
    return out


def _flash_attention_packed_fwd(q, k, v, heads, scale, block_q, block_k, kv_valid, interpret):
    out, lse = _flash_fwd_packed(q, k, v, heads, scale, block_q, block_k, kv_valid, interpret)
    # Named so a remat policy (save_only_these_names, nn/unet.py) can SAVE
    # the kernel's residuals: without this, rematerialized transformer
    # blocks re-run every flash forward kernel during backward just to
    # regenerate (out, lse) — measured at ~52 ms/step of flash kernel time
    # in the full-scale train step, of which the recompute share is pure
    # waste. q/k/v recompute via their (cheap) projections.
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _flash_attention_packed_bwd(heads, scale, block_q, block_k, kv_valid, interpret, res, g):
    # backward rides the (B,H,S,D) kernels via reshape+transpose: the fwd is
    # the sampling hot path; training keeps the same net transpose count it
    # had before (moved from fwd to bwd).
    q, k, v, out, lse = res
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // heads
    tr = lambda t, s: t.reshape(B, s, heads, D).transpose(0, 2, 1, 3)
    dq, dk, dv = _flash_bwd(
        scale, block_q, block_k, interpret,
        (tr(q, Sq), tr(k, Sk), tr(v, Sk), tr(out, Sq), lse.transpose(0, 2, 1)),
        tr(g, Sq),
    )
    un = lambda t, s: t.transpose(0, 2, 1, 3).reshape(B, s, HD)
    return un(dq, Sq), un(dk, Sk), un(dv, Sk)


_flash_attention_packed.defvjp(_flash_attention_packed_fwd, _flash_attention_packed_bwd)


# ---------------------------------------------------------------------------
# int8 forward (SageAttention-style quantized attention)
# ---------------------------------------------------------------------------
#
# CLOSED-OUT EXPERIMENT — measured SLOWER than the bf16 kernel on v5e at
# the UNet's D=64 heads; kept opt-in (impl="int8") as working quantized-
# attention infrastructure and so the ablation is reproducible.
#
# Premise: the bf16 packed kernel is bound by the chip's D=64 matmul rate,
# and the stripped matmul-only chain runs 1.32x faster in int8
# (benchmarks/int8_probe.py: 49 -> 65 TF/s — not the advertised 2x, since
# the MXU loads only 64 of its 128 contraction rows either way). That caps
# the win at ~0.45 ms of the 2.0 ms hot-shape kernel. Measured reality
# (v5e-1, B4/H5/S4096/D64): the int8 kernel runs 2.35 ms vs bf16's 1.96 —
# the mandatory i32->f32 convert + per-row dequant multiply on every
# (block_q, block_k) score slab adds more VPU time than the int8 MXU saves
# — and the XLA-side quantization passes cost a further ~0.9 ms (less when
# fused into the qkv-projection epilogues, but the kernel alone already
# loses). Revisit only on a chip with a >=2x practical int8 advantage at
# D=64, or for D>=128 head dims where the MXU runs the f16 path at full
# depth and int8 halves a larger matmul share.
#
# Scheme (SageAttention-style, arXiv:2410.02367):
#   * K is smoothed (per-head mean over the sequence subtracted) before
#     quantization — the q.mean(K)^T term is constant along each score row,
#     so softmax is invariant to it and no correction is needed;
#   * Q per-token, K per-(batch, head), V per-channel symmetric scales,
#     computed by XLA outside the kernel; the kernel loads int8 operands
#     straight from HBM;
#   * P = exp(s - rowmax) is quantized per row against its BLOCK-LOCAL max
#     (always exactly 1.0), folded into the exp as +log(127); the
#     exp(m_loc - m_new)/127 dequant factor rides the per-row alpha
#     rescale the online softmax already does.
#
# Accuracy: ~30 dB per call vs the f32 reference at the UNet's hot shapes
# on-chip (~34 dB in interpret mode at S=256; the P int8 term dominates —
# see tests/test_flash_attention.py). Gradients flow via a straight-through
# VJP that feeds the int8 forward's (out, lse) to the exact bf16 flash
# backward, so impl="int8" survives jax.grad.


_LOG127 = float(math.log(127.0))


def _fwd_kernel_packed_int8(q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref,
                            o_ref, lse_ref, acc, m_s, l_s,
                            *, heads, head_dim, scale, nk):
    ki = pl.program_id(2)
    D = head_dim

    @pl.when(ki == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)

    qf = q_ref[0]
    kf = k_ref[0]
    vf = v_ref[0]
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        s32 = jax.lax.dot_general(
            qf[:, sl], kf[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # per-token Q scales x per-block K scale, fused into one (bq,1)
        # broadcast — same VPU cost as a scalar dequant
        sqv = sq_ref[0][:, h : h + 1] * (sk_ref[0, 0, h] * scale)
        s = s32.astype(jnp.float32) * sqv
        m_loc = jnp.max(s, axis=-1, keepdims=True)
        m_prev = m_s[:, h : h + 1]
        m_new = jnp.maximum(m_prev, m_loc)
        # P quantized against the block-local row max (== 1.0 by
        # construction): x127 folded into the exp, +0.5 makes the int8
        # cast's truncation a round-half-up.
        p8 = (jnp.exp(s - m_loc + _LOG127) + 0.5).astype(jnp.int8)
        v_aug = jnp.concatenate(
            [vf[:, sl], jnp.ones((vf.shape[0], 1), jnp.int8)], axis=-1
        )
        pv = jax.lax.dot_general(
            p8, v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        alpha = jnp.exp(m_prev - m_new)
        gamma = jnp.exp(m_loc - m_new) * (1.0 / 127.0)
        l_s[:, h : h + 1] = alpha * l_s[:, h : h + 1] + pv[:, D:] * gamma
        # per-channel V scales: a (D,) row broadcast over the (bq, D) slab
        acc[:, sl] = acc[:, sl] * alpha + (pv[:, :D] * gamma) * sv_ref[0, 0, sl]
        m_s[:, h : h + 1] = m_new

    @pl.when(ki == nk - 1)
    def _():
        for h in range(heads):
            sl = slice(h * D, (h + 1) * D)
            o_ref[0, :, sl] = (acc[:, sl] / l_s[:, h : h + 1]).astype(o_ref.dtype)
        lse_ref[0] = m_s[:] + jnp.log(l_s[:])


def _quantize_rows(x, heads):
    """(B, S, H*D) float -> int8 with per-(batch, token, head) scales."""
    B, S, HD = x.shape
    D = HD // heads
    xb = x.reshape(B, S, heads, D).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xb), axis=3)  # (B, S, heads)
    scale = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    q8 = jnp.round(xb / scale[..., None]).astype(jnp.int8)
    return q8.reshape(B, S, HD), scale


def _quantize_heads(x, heads):
    """(B, S, H*D) float -> int8 with per-(batch, head) scales over the whole
    sequence. (Mosaic block specs can't tile a per-k-block scale row, so K
    uses tensor granularity; smoothing already removed its mean.)"""
    B, S, HD = x.shape
    D = HD // heads
    xb = x.reshape(B, S, heads, D).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xb), axis=(1, 3), keepdims=True)  # (B,1,H,1)
    scale = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    q8 = jnp.round(xb / scale).astype(jnp.int8)
    return q8.reshape(B, S, HD), scale[:, :, :, 0]  # (B, 1, heads)


def _quantize_channels(x):
    """(B, S, H*D) float -> int8 with per-(batch, channel) scales — V's
    per-channel quantization (channel = packed H*D lane)."""
    B, S, HD = x.shape
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)  # (B, 1, HD)
    scale = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    q8 = jnp.round(xf / scale).astype(jnp.int8)
    return q8, scale


def _flash_fwd_packed_int8(q, k, v, heads, scale, block_q, block_k, interpret):
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // heads
    nq = Sq // block_q
    nk = Sk // block_k

    # K smoothing: the per-head mean over the sequence is a row-constant
    # score offset, invisible to softmax, and halves K's quantization range.
    k4 = k.reshape(B, Sk, heads, D).astype(jnp.float32)
    k_sm = (k4 - k4.mean(axis=1, keepdims=True)).reshape(B, Sk, HD)

    q8, sq = _quantize_rows(q, heads)
    k8, sk = _quantize_heads(k_sm, heads)
    v8, sv = _quantize_channels(v)

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_packed_int8, heads=heads, head_dim=D, scale=scale, nk=nk,
        ),
        grid=(B, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, HD), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, HD), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, HD), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, heads), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, heads), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, HD), lambda b, i, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, HD), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, heads), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Sq, HD), q.dtype),
            jax.ShapeDtypeStruct((B, Sq, heads), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, HD), jnp.float32),
            pltpu.VMEM((block_q, heads), jnp.float32),
            pltpu.VMEM((block_q, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q8, k8, v8, sq, sk, sv)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention_packed_int8(q, k, v, heads, scale, block_q, block_k, interpret):
    out, _ = _flash_fwd_packed_int8(q, k, v, heads, scale, block_q, block_k, interpret)
    return out


def _flash_attention_packed_int8_fwd(q, k, v, heads, scale, block_q, block_k, interpret):
    out, lse = _flash_fwd_packed_int8(q, k, v, heads, scale, block_q, block_k, interpret)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _flash_attention_packed_int8_bwd(heads, scale, block_q, block_k, interpret, res, g):
    # Straight-through: the exact bf16 flash backward evaluated at the int8
    # forward's (out, lse). Lets impl="int8" survive under jax.grad
    # (quantization-aware finetuning); training configs default to bf16.
    return _flash_attention_packed_bwd(
        heads, scale, min(block_q, 512), min(block_k, 512),
        res[1].shape[1], interpret, res, g,
    )


_flash_attention_packed_int8.defvjp(
    _flash_attention_packed_int8_fwd, _flash_attention_packed_int8_bwd
)


def flash_attention_packed_int8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-quantized flash attention on the packed (B, S, H*D) layout.

    Shapes whose sequence lengths don't tile into whole blocks (after the
    min() clamp) fall back to the bf16 packed kernel — on the UNet that is
    only the 77-token text cross-attention, which the XLA path serves
    anyway.
    """
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // heads
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    block_q = min(block_q, Sq)
    block_k = min(block_k, Sk)
    if Sq % block_q or Sk % block_k or Sq % 128 or Sk % 128:
        return flash_attention_packed(q, k, v, heads, scale, interpret=interpret)
    return _flash_attention_packed_int8(
        q, k, v, heads, float(scale), block_q, block_k, interpret
    )


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc, *, scale, nk
):
    """dq for one (bh, q-block, k-block) grid step:
    dq = sum_k (P * (dO V^T - delta)) K * scale.

    The k dimension lives in the GRID (not a fori_loop) with the accumulator
    in VMEM scratch — every block stays O(block), so VMEM stays bounded at
    any sequence length (whole-length K/V residency OOM'd scoped vmem at
    S=9216, the 768² level-0 shape). Matmul operands stay in the input dtype
    (full-rate MXU); softmax math and the accumulator are f32."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]  # (bq, 1)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, nq
):
    """dk/dv for one (bh, k-block, q-block) grid step: q streams through the
    grid with f32 scratch accumulators (same bounded-VMEM argument as dq;
    the old whole-length (1,Sq,1) lse/delta blocks alone padded to
    Sq x 128 lanes ≈ 4.7 MB each at S=9216)."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]  # (bq, 1)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)  # (bq, bk) f32
    pc = p.astype(do.dtype)
    dv_acc[:] += jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    bh = B * H
    do = g

    # delta_i = sum_d dO_i * O_i  (rowwise) — cheap, do it in XLA.
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    qr = q.reshape(bh, Sq, D)
    kr = k.reshape(bh, Sk, D)
    vr = v.reshape(bh, Sk, D)
    dor = do.reshape(bh, Sq, D)
    lser = lse.reshape(bh, Sq, 1)
    deltar = delta.reshape(bh, Sq, 1)

    bq = min(block_q, Sq)
    bk = min(block_k, Sk)
    nq = _cdiv(Sq, bq)
    nk = _cdiv(Sk, bk)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, Sq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qr, kr, vr, dor, lser, deltar)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((bh, Sk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qr, kr, vr, dor, lser, deltar)

    return (
        dq.reshape(B, H, Sq, D),
        dk.reshape(B, H, Sk, D),
        dv.reshape(B, H, Sk, D),
    )


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention(q, k, v, scale, block_q, block_k, kv_valid, interpret):
    out, _ = _flash_fwd(q, k, v, scale, block_q, block_k, kv_valid, interpret)
    return out


def _flash_attention_fwd(q, k, v, scale, block_q, block_k, kv_valid, interpret):
    out, lse = _flash_fwd(q, k, v, scale, block_q, block_k, kv_valid, interpret)
    # see _flash_attention_packed_fwd: lets a remat policy save the
    # residuals so backward skips the forward-kernel re-run
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _flash_attention_bwd(scale, block_q, block_k, kv_valid, interpret, res, g):
    # No masking needed in the backward kernels: padded K/V rows are zero, so
    # dq's ds·K contribution vanishes on them; padded q rows have dO = 0
    # (gradient of the output slice), so their p·dO / ds contributions to
    # dk/dv vanish; dk/dv padding rows are sliced off by the caller.
    return _flash_bwd(scale, block_q, block_k, interpret, res, g)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention on (B, H, S, D); differentiable; full (non-causal).
    block_k=1024 measured best for the grid-pipelined forward at the
    pipeline's 4096-token hot shape (benchmarks/fa_variants.py).

    Arbitrary sequence lengths: q and k/v are zero-padded up to block
    multiples, the padded K/V columns are masked to -inf inside the forward
    kernel, and the output is sliced back — so awkward shapes (e.g. 77-token
    text K/V against latent queries) take the fast path instead of silently
    falling back to XLA."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    Sq, Sk = q.shape[2], k.shape[2]
    block_q = min(block_q, _round_up(Sq, 128))
    block_k = min(block_k, _round_up(Sk, 128))
    sq_pad = _round_up(Sq, block_q)
    sk_pad = _round_up(Sk, block_k)
    if sq_pad != Sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - Sq), (0, 0)))
    if sk_pad != Sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - Sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - Sk), (0, 0)))
    out = _flash_attention(
        q, k, v, float(scale), block_q, block_k, int(Sk), interpret
    )
    return out[:, :, :Sq, :] if sq_pad != Sq else out


def flash_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention on the packed (B, S, H*D) layout — no head
    transposes. Differentiable (backward reuses the (B,H,S,D) kernels).
    Arbitrary lengths via pad + in-kernel tail masking, as
    ``flash_attention``."""
    HD = q.shape[-1]
    D = HD // heads
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    Sq, Sk = q.shape[1], k.shape[1]
    block_q = min(block_q, _round_up(Sq, 128))
    block_k = min(block_k, _round_up(Sk, 128))
    sq_pad = _round_up(Sq, block_q)
    sk_pad = _round_up(Sk, block_k)
    if sq_pad != Sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - Sq), (0, 0)))
    if sk_pad != Sk:
        k = jnp.pad(k, ((0, 0), (0, sk_pad - Sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad - Sk), (0, 0)))
    out = _flash_attention_packed(
        q, k, v, heads, float(scale), block_q, block_k, int(Sk), interpret
    )
    return out[:, :Sq, :] if sq_pad != Sq else out


def attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    impl: str = "auto",
    scale: float | None = None,
) -> jnp.ndarray:
    """Multi-head attention on the packed (B, S, H*D) layout (the natural
    output of the qkv projections): Pallas packed kernel on TPU for long
    sequences, otherwise the XLA path with explicit head split/merge."""
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // heads
    if impl == "pallas":
        return flash_attention_packed(q, k, v, heads, scale)
    if impl == "pallas_interpret":
        return flash_attention_packed(q, k, v, heads, scale, interpret=True)
    if impl == "int8_interpret":
        return flash_attention_packed_int8(q, k, v, heads, scale, interpret=True)
    on_tpu = jax.default_backend() == "tpu"
    if impl == "int8":
        # Quantized path only where the flash kernel would run at all;
        # short sequences keep the (exact) XLA fallback below.
        if on_tpu and Sq >= _MIN_PALLAS_SEQ and Sk >= 128:
            return flash_attention_packed_int8(q, k, v, heads, scale)
        impl = "auto"
    if impl != "xla" and on_tpu and Sq >= _MIN_PALLAS_SEQ and Sk >= 128:
        return flash_attention_packed(q, k, v, heads, scale)
    split = lambda t, s: t.reshape(B, s, heads, D).transpose(0, 2, 1, 3)
    out = xla_attention(split(q, Sq), split(k, Sk), split(v, Sk), scale)
    return out.transpose(0, 2, 1, 3).reshape(B, Sq, HD)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
    scale: float | None = None,
) -> jnp.ndarray:
    """Dispatch: ``pallas`` flash kernel on TPU for long sequences, XLA
    otherwise. ``impl`` in {auto, xla, pallas, pallas_interpret}."""
    if impl == "xla":
        return xla_attention(q, k, v, scale)
    if impl == "pallas":
        return flash_attention(q, k, v, scale)
    if impl == "pallas_interpret":
        return flash_attention(q, k, v, scale, interpret=True)
    # auto: the kernel handles arbitrary lengths via padded + masked tails,
    # so the only criterion is whether the sequence is long enough for the
    # kernel to beat XLA (launch + padding overhead).
    on_tpu = jax.default_backend() == "tpu"
    Sq, Sk = q.shape[2], k.shape[2]
    if on_tpu and Sq >= _MIN_PALLAS_SEQ and Sk >= 128:
        return flash_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
