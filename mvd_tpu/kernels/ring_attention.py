"""Ring attention over a sharded view axis — flash per-hop, O(block) memory.

The reference has no sequence/context parallelism (SURVEY §5.7) — its only
cross-view information path is pairwise adapter attention. The TPU rebuild's
north star extends this to N-view *joint* denoising: self-attention runs over
the concatenated (views x tokens) sequence, with the view axis sharded across
the mesh. This module is that collective kernel:

  * each device holds its local views' Q/K/V in the packed (B, S, H*D)
    layout (no head transposes on the forward path — the same layout rule
    the single-device attention sites follow, nn/layers.py),
  * K/V shards rotate around the ring via ``lax.ppermute`` (ICI
    neighbor-exchange); each hop's partial attention is merged with the
    running result via online softmax (log-sum-exp) accumulation in f32 —
    numerics identical to unsharded attention,
  * per-hop compute is the Pallas packed flash kernel's (out, lse) forward
    on TPU (kernels/flash_attention._flash_fwd_packed), so per-hop memory is
    O(block_q x block_k) — never the (S_q_local, S_k_local) logits matrix.
    At the north-star 8-view 768² shape (S_local = 9216) the old unfused
    einsum hop materialized ~340 MB of f32 logits per (B, H) slab; the flash
    hop's VMEM residency is a few hundred KB regardless of S.

Differentiation: a custom VJP over the WHOLE ring. The backward re-rotates
K/V around the ring and calls the flash backward kernels per hop with the
GLOBAL (out, lse) — p = exp(s - lse_global) is exactly the global softmax
restricted to that hop's columns, so each hop's dk/dv are exact for its
block and dq accumulates exactly across hops. dk/dv accumulators travel the
ring with their blocks and arrive home after n rotations. This sidesteps
needing d(lse) plumbing through the merge.

Usable inside ``shard_map``; tested against unsharded attention (values and
grads) on an 8-device CPU mesh (tests/test_ring_attention.py), including a
9216-token local sequence.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name

from .flash_attention import _MIN_PALLAS_SEQ, _flash_bwd, _flash_fwd_packed


def _use_flash_hop(Sq: int, Sk: int, impl: str) -> bool:
    """Static dispatch: Pallas flash per hop on TPU (or explicitly via
    impl='pallas'/'pallas_interpret'), XLA otherwise. The flash path needs
    128-lane-aligned sequences; the UNet's ring shapes (V_local*S at 512²/768²
    levels that are long enough to matter) all are."""
    if impl in ("pallas", "pallas_interpret"):
        return True
    if impl == "xla":
        return False
    aligned = Sq % 128 == 0 and Sk % 128 == 0
    return (
        jax.default_backend() == "tpu"
        and aligned
        and Sq >= _MIN_PALLAS_SEQ
        and Sk >= 128
    )


def _hop_fwd_xla(q, k, v, heads, scale):
    """(out_f32, lse) for one hop, packed layout, XLA fallback.
    q: (B,Sq,H*D), k/v: (B,Sk,H*D) -> out (B,Sq,H*D) f32, lse (B,Sq,H) f32."""
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // heads
    qh = q.reshape(B, Sq, heads, D)
    kh = k.reshape(B, Sk, heads, D)
    vh = v.reshape(B, Sk, heads, D)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", (p / l).astype(v.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    lse = (m + jnp.log(l))[..., 0].transpose(0, 2, 1)  # (B, Sq, H)
    return out.reshape(B, Sq, HD).astype(jnp.float32), lse


def _hop_fwd(q, k, v, heads, scale, impl):
    """One hop's (out_f32, lse) in the packed layout."""
    Sq, Sk = q.shape[1], k.shape[1]
    if _use_flash_hop(Sq, Sk, impl):
        out, lse = _flash_fwd_packed(
            q, k, v, heads, scale,
            block_q=min(512, Sq), block_k=min(1024, Sk), kv_valid=Sk,
            interpret=(impl == "pallas_interpret"),
        )
        return out.astype(jnp.float32), lse
    return _hop_fwd_xla(q, k, v, heads, scale)


def _merge(o0, l0, o1, l1, heads):
    """Online-softmax merge of two normalized partials (packed layout,
    per-head lse weights broadcast over the head's D lanes)."""
    B, S, HD = o0.shape
    D = HD // heads
    m = jnp.maximum(l0, l1)
    w0 = jnp.exp(l0 - m)
    w1 = jnp.exp(l1 - m)
    denom = w0 + w1
    o = (
        o0.reshape(B, S, heads, D) * (w0 / denom)[..., None]
        + o1.reshape(B, S, heads, D) * (w1 / denom)[..., None]
    ).reshape(B, S, HD)
    return o, m + jnp.log(denom)


def _ring_fwd(q, k, v, heads, scale, axis_name, impl):
    n = lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    out, lse = _hop_fwd(q, k, v, heads, scale, impl)

    def body(_, carry):
        o, l, kc, vc = carry
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)
        o_i, l_i = _hop_fwd(q, kc, vc, heads, scale, impl)
        o, l = _merge(o, l, o_i, l_i, heads)
        return o, l, kc, vc

    out, lse, _, _ = lax.fori_loop(0, n - 1, body, (out, lse, k, v))
    return out.astype(q.dtype), lse


def _hop_bwd_xla(qT, kT, vT, outT, lseT, gT, scale):
    """Per-hop backward, (B,H,S,D) layout, global lse — XLA fallback.
    Returns (dq_partial, dk_block, dv_block) in f32."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", qT, kT, preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lseT[..., None])  # global softmax probs, this hop's cols
    delta = jnp.sum(
        gT.astype(jnp.float32) * outT.astype(jnp.float32), axis=-1, keepdims=True
    )
    dv = jnp.einsum(
        "bhqk,bhqd->bhkd", p.astype(gT.dtype), gT,
        preferred_element_type=jnp.float32,
    )
    dp = jnp.einsum(
        "bhqd,bhkd->bhqk", gT, vT, preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq = jnp.einsum(
        "bhqk,bhkd->bhqd", ds.astype(kT.dtype), kT,
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jnp.einsum(
        "bhqk,bhqd->bhkd", ds.astype(qT.dtype), qT,
        preferred_element_type=jnp.float32,
    ) * scale
    return dq, dk, dv


def _ring_bwd_impl(heads, scale, axis_name, impl, res, g):
    q, k, v, out, lse = res
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    D = HD // heads
    n = lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    use_flash = _use_flash_hop(Sq, Sk, impl)

    # one transpose set outside the ring loop; K/V (and their grad
    # accumulators) rotate in the (B,H,S,D) layout the backward kernels use
    tr = lambda t, s: t.reshape(B, s, heads, D).transpose(0, 2, 1, 3)
    qT, outT, gT = tr(q, Sq), tr(out, Sq), tr(g, Sq)
    lseT = lse.transpose(0, 2, 1)  # (B, H, Sq)
    kT, vT = tr(k, Sk), tr(v, Sk)

    def hop(kc, vc):
        if use_flash:
            return _flash_bwd(
                scale, min(512, Sq), min(1024, Sk),
                impl == "pallas_interpret",
                (qT, kc, vc, outT, lseT), gT,
            )
        return _hop_bwd_xla(qT, kc, vc, outT, lseT, gT, scale)

    def body(_, carry):
        dq, kc, vc, dkc, dvc = carry
        dq_i, dk_i, dv_i = hop(kc, vc)
        dq = dq + dq_i.astype(jnp.float32)
        dkc = dkc + dk_i.astype(jnp.float32)
        dvc = dvc + dv_i.astype(jnp.float32)
        # rotate K/V AND their accumulated grads together; after n total
        # rotations each block's gradient is back on its owner device
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)
        dkc = lax.ppermute(dkc, axis_name, perm)
        dvc = lax.ppermute(dvc, axis_name, perm)
        return dq, kc, vc, dkc, dvc

    # accumulator inits must be marked varying over the ring axis: the loop
    # body adds axis-varying grads, and scan/fori_loop requires the carry's
    # varying-manual-axes to match between input and output
    vary = lambda x: lax.pcast(x, axis_name, to="varying")
    zq = vary(jnp.zeros((B, heads, Sq, D), jnp.float32))
    zk = vary(jnp.zeros((B, heads, Sk, D), jnp.float32))
    dq, _, _, dk, dv = lax.fori_loop(
        0, n, body, (zq, kT, vT, zk, jnp.zeros_like(zk))
    )
    un = lambda t, s: t.transpose(0, 2, 1, 3).reshape(B, s, HD)
    return (
        un(dq, Sq).astype(q.dtype),
        un(dk, Sk).astype(k.dtype),
        un(dv, Sk).astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_packed(q, k, v, heads, scale, axis_name, impl):
    out, _ = _ring_fwd(q, k, v, heads, scale, axis_name, impl)
    return out


def _ring_packed_fwd(q, k, v, heads, scale, axis_name, impl):
    out, lse = _ring_fwd(q, k, v, heads, scale, axis_name, impl)
    # named so the train step's remat policy (save_only_these_names,
    # nn/unet.py) can save the ring's residuals exactly like the
    # single-device flash sites
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


_ring_packed.defvjp(_ring_packed_fwd, _ring_bwd_impl)


def ring_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    axis_name: str,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Full (non-causal) attention with K/V sharded over ``axis_name``,
    packed (B, S_local, H*D) layout end-to-end.

    Must be called inside ``shard_map``/``pmap`` with ``axis_name`` bound.
    Returns (B, S_local, H*D) equal to attention over the GLOBAL K/V
    sequence. Differentiable (whole-ring custom VJP; flash backward kernels
    per hop on TPU)."""
    HD = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(HD // heads)
    return _ring_packed(q, k, v, heads, float(scale), axis_name, impl)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """(B, H, S_local, D) compatibility wrapper over the packed ring.
    Prefer ``ring_attention_packed`` — this adds one transpose pair."""
    B, H, S, D = q.shape
    Sk = k.shape[2]
    pack = lambda t, s: t.transpose(0, 2, 1, 3).reshape(B, s, H * D)
    out = ring_attention_packed(
        pack(q, S), pack(k, Sk), pack(v, Sk), H, axis_name, scale, impl
    )
    return out.reshape(B, S, H, D).transpose(0, 2, 1, 3)
