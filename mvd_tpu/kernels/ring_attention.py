"""Ring attention over a sharded view axis.

The reference has no sequence/context parallelism (SURVEY §5.7) — its only
cross-view information path is pairwise adapter attention. The TPU rebuild's
north star extends this to N-view *joint* denoising: self-attention runs over
the concatenated (views x tokens) sequence, with the view axis sharded across
the mesh. This module is that collective kernel:

  * each device holds its local views' Q/K/V,
  * K/V shards rotate around the ring via ``lax.ppermute`` (ICI
    neighbor-exchange) while each hop's partial attention is merged with the
    running result via online softmax (log-sum-exp) accumulation — numerics
    identical to unsharded attention,
  * per-hop compute uses the local flash/XLA attention kernel, so the MXU
    work overlaps the next hop's ppermute under XLA's async collectives.

Differentiable (pure jnp + ppermute: JAX derives the transposed collective),
usable inside ``shard_map``. Tested against unsharded attention on an
8-device CPU mesh (tests/test_ring_attention.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _local_attention_with_lse(q, k, v, scale):
    """Returns (out, lse) with f32 accumulation. q,k,v: (B,H,S,D)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(jnp.float32) / l
    lse = (m + jnp.log(l))[..., 0]  # (B,H,S)
    return out, lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Full (non-causal) attention where K/V are sharded over ``axis_name``.

    Must be called inside ``shard_map``/``pmap`` with ``axis_name`` bound.
    q, k, v: (B, H, S_local, D); returns (B, H, S_local, D) equal to
    attention over the GLOBAL K/V sequence.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n = lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    out0, lse0 = _local_attention_with_lse(q, k, v, scale)

    def body(i, carry):
        out, lse, kc, vc = carry
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)
        o_i, lse_i = _local_attention_with_lse(q, kc, vc, scale)
        # online merge of two (out, lse) partials
        m = jnp.maximum(lse, lse_i)
        w0 = jnp.exp(lse - m)[..., None]
        w1 = jnp.exp(lse_i - m)[..., None]
        out = (out * w0 + o_i * w1) / (w0 + w1)
        lse = m + jnp.log(jnp.exp(lse - m) + jnp.exp(lse_i - m))
        return out, lse, kc, vc

    out, lse, _, _ = lax.fori_loop(0, n - 1, body, (out0, lse0, k, v))
    return out.astype(q.dtype)
