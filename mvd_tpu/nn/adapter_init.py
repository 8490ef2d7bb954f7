"""Initialize cross-view adapters from the frozen base attention weights.

The reference constructs every ``ImageCrossAttentionProcessor`` by copying
the wrapped attention's q/k/v/out weights into the trainable ``to_*_ref``
projections (``load_original_weights``, reference
/root/reference/src/models/attention.py:199-245, invoked at construction in
:248-265). Adapters therefore start as a near-copy of the base attention:
given identical inputs they reproduce its output exactly, which is what
makes fresh training stable at ``ref_scale`` ≈ 0.3.

K/V shape adaptation (the adapter's K/V input is the layer hidden dim ``C``;
the wrapped cross-attention's is the text dim, 1024 for SD2.1):

* equal shapes (all self-attn adapters)  → direct copy;
* ``C > 1024`` (cross adapters in 1280-dim blocks) → copy into the leading
  input rows, zero-pad the rest (attention.py:216-221);
* ``C < 1024`` (cross adapters in 320/640-dim blocks) → the reference
  computes ``F.linear(eye(C), W[:, :C])`` = the truncated weight
  *transposed* (attention.py:222-227) — requires a square projection, which
  SD2.1 satisfies (inner_dim == query_dim). The transpose is faithfully
  reproduced; it is a reference quirk, not an oversight here.

Flax Dense kernels are (in, out) = torch ``weight.T``; the rules below are
the torch-layout rules re-derived for that layout (and verified against a
torch reimplementation in tests/test_adapter_init.py).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _adapt_kv_kernel(base_kernel: jnp.ndarray, k_in: int, k_out: int) -> jnp.ndarray:
    """Map a frozen to_k/to_v kernel (ok_in, ok_out) onto an adapter kernel
    of shape (k_in, k_out), matching reference attention.py:206-245."""
    ok_in, ok_out = base_kernel.shape
    if (k_in, k_out) == (ok_in, ok_out):
        return base_kernel
    m = min(k_out, ok_out)
    if k_in >= ok_in:
        out = jnp.zeros((k_in, k_out), base_kernel.dtype)
        return out.at[:ok_in, :m].set(base_kernel[:, :m])
    # k_in < ok_in: truncate-and-transpose (square in SD2.1: inner == query)
    if m != k_in or k_in != k_out:
        raise ValueError(
            f"non-square K/V truncation ({k_in},{k_out}) from ({ok_in},{ok_out}) "
            "is undefined in the reference semantics"
        )
    return base_kernel[:k_in, :m].T


def _copy_adapter(attn: Dict, adapter: Dict) -> Dict:
    """Return new adapter params initialized from a frozen attention's.

    Every copied leaf is materialized as a NEW buffer (jnp.array copy=True):
    aliasing the frozen attention's buffer at two tree leaves breaks donated
    train steps ("attempt to donate the same buffer twice")."""
    new = dict(adapter)
    new["to_q_ref"] = {"kernel": jnp.array(attn["to_q"]["kernel"], copy=True)}
    new["to_out_ref"] = {
        "kernel": jnp.array(attn["to_out"]["kernel"], copy=True),
        "bias": jnp.array(attn["to_out"]["bias"], copy=True),
    }
    for src, dst in (("to_k", "to_k_ref"), ("to_v", "to_v_ref")):
        k_in, k_out = adapter[dst]["kernel"].shape
        kern = _adapt_kv_kernel(attn[src]["kernel"], k_in, k_out)
        new[dst] = {"kernel": jnp.array(kern, copy=True)}
    return new


def init_adapters_from_frozen(params):
    """Walk a param tree; wherever a transformer block holds both the frozen
    attention (``attn1``/``attn2``) and its adapter (``adapter_self``/
    ``adapter_cross``), re-initialize the adapter from the attention.

    Works on the full pipeline tree, the ``mvd`` subtree, or a bare UNet
    tree — any nested dict-of-dicts. Non-dict leaves pass through untouched.
    """

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        for attn_name, ad_name in (("attn1", "adapter_self"), ("attn2", "adapter_cross")):
            if attn_name in out and ad_name in out:
                out[ad_name] = _copy_adapter(out[attn_name], out[ad_name])
        return out

    return walk(params)
