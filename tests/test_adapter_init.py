"""Adapter init-from-frozen-attention (reference attention.py:199-245).

Verifies that freshly constructed cross-view adapters start as a copy of the
wrapped base attention: identical outputs given identical inputs, and the
reference's exact K/V shape-adaptation rules (zero-pad when the adapter's
input dim exceeds the frozen cross-attn's, truncate-and-transpose when it is
smaller), checked against an independent numpy port of the torch algorithm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvd_tpu.nn.adapter_init import _adapt_kv_kernel, init_adapters_from_frozen
from mvd_tpu.nn.layers import Attention, CrossViewAdapter


def torch_layout_reference_rule(orig_w: np.ndarray, k_out: int, k_in: int) -> np.ndarray:
    """Numpy port of reference load_original_weights' K/V branch
    (attention.py:206-245), operating in torch (out, in) layout."""
    ok_out, ok_in = orig_w.shape
    if (k_out, k_in) == (ok_out, ok_in):
        return orig_w.copy()
    if k_in >= ok_in:
        out = np.zeros((k_out, k_in), orig_w.dtype)
        out[: min(k_out, ok_out), :ok_in] = orig_w[: min(k_out, ok_out), :]
        return out
    # k_in < ok_in: F.linear(eye(k_in), orig[:min(k_out,ok_out), :k_in])
    trunc = orig_w[: min(k_out, ok_out), :k_in]
    return (np.eye(k_in, dtype=orig_w.dtype) @ trunc.T).astype(orig_w.dtype)


@pytest.mark.parametrize(
    "k_in,k_out,ok_in,ok_out",
    [
        (32, 32, 32, 32),  # self-adapter: exact copy
        (48, 32, 32, 32),  # pad branch (1280-dim blocks vs 1024 text dim)
        (16, 16, 32, 16),  # truncate-transpose branch (320/640-dim blocks)
        # REAL SD2.1 dims (VERDICT r4: width-dependent rules unexercised at
        # flagship size) — cross-adapters against the 1024 text dim:
        (320, 320, 1024, 320),    # level-0 truncate-transpose
        (640, 640, 1024, 640),    # level-1 truncate-transpose
        (1280, 1280, 1024, 1280),  # level-2/3 zero-pad
        (1280, 1280, 1280, 1280),  # self-adapter at the widest block
    ],
)
def test_kv_rule_matches_torch_reference(k_in, k_out, ok_in, ok_out):
    rng = np.random.default_rng(0)
    base_flax = rng.normal(size=(ok_in, ok_out)).astype(np.float32)
    got = np.asarray(_adapt_kv_kernel(jnp.asarray(base_flax), k_in, k_out))
    # torch layout: weight = kernel.T on both sides
    want = torch_layout_reference_rule(base_flax.T, k_out, k_in).T
    np.testing.assert_array_equal(got, want)


def test_nonsquare_truncation_rejected():
    with pytest.raises(ValueError):
        _adapt_kv_kernel(jnp.zeros((32, 16)), 8, 16)


def test_self_adapter_reproduces_base_attention():
    """After init-from-frozen, the self adapter given the hidden states as its
    reference feature computes exactly the base self-attention."""
    heads, head_dim, D = 2, 8, 16
    attn = Attention(heads=heads, head_dim=head_dim)
    adapter = CrossViewAdapter(heads=heads, head_dim=head_dim)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 12, D))
    pa = attn.init(jax.random.PRNGKey(2), h)
    pc = adapter.init(jax.random.PRNGKey(3), h, h)

    tree = {"attn1": pa["params"], "adapter_self": pc["params"]}
    new = init_adapters_from_frozen(tree)

    base_out = attn.apply(pa, h)
    ad_out = adapter.apply({"params": new["adapter_self"]}, h, h)
    np.testing.assert_allclose(np.asarray(ad_out), np.asarray(base_out), atol=1e-6)


def test_self_adapter_reproduces_base_attention_flagship_width():
    """Same identity-at-init property at the REAL widest SD2.1 attention
    (heads 20, head_dim 64, D=1280) — the head-count/width regime the tiny
    test leaves unexercised."""
    heads, head_dim = 20, 64
    attn = Attention(heads=heads, head_dim=head_dim)
    adapter = CrossViewAdapter(heads=heads, head_dim=head_dim)
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 16, heads * head_dim))
    pa = attn.init(jax.random.PRNGKey(2), h)
    pc = adapter.init(jax.random.PRNGKey(3), h, h)

    tree = {"attn1": pa["params"], "adapter_self": pc["params"]}
    new = init_adapters_from_frozen(tree)

    base_out = attn.apply(pa, h)
    ad_out = adapter.apply({"params": new["adapter_self"]}, h, h)
    np.testing.assert_allclose(
        np.asarray(ad_out), np.asarray(base_out), atol=2e-5
    )


def test_cross_adapter_initialized_in_pipeline():
    """MVDPipeline.create applies the transform to every transformer block."""
    from mvd_tpu.config import TINY_MODEL
    from mvd_tpu.pipeline import MVDPipeline

    pipe = MVDPipeline.create(TINY_MODEL, jax.random.PRNGKey(0))

    found = []

    def walk(node, path=()):
        if not isinstance(node, dict):
            return
        if "attn1" in node and "adapter_self" in node:
            found.append(path)
            np.testing.assert_array_equal(
                np.asarray(node["adapter_self"]["to_q_ref"]["kernel"]),
                np.asarray(node["attn1"]["to_q"]["kernel"]),
            )
            np.testing.assert_array_equal(
                np.asarray(node["adapter_self"]["to_k_ref"]["kernel"]),
                np.asarray(node["attn1"]["to_k"]["kernel"]),
            )
            np.testing.assert_array_equal(
                np.asarray(node["adapter_cross"]["to_out_ref"]["bias"]),
                np.asarray(node["attn2"]["to_out"]["bias"]),
            )
            # cross K/V: adapted from the (text-dim) frozen kernel
            ck = np.asarray(node["adapter_cross"]["to_k_ref"]["kernel"])
            bk = np.asarray(node["attn2"]["to_k"]["kernel"])
            np.testing.assert_array_equal(
                ck, np.asarray(_adapt_kv_kernel(jnp.asarray(bk), *ck.shape))
            )
        for k, v in node.items():
            walk(v, path + (k,))

    walk(pipe.params["mvd"])
    assert len(found) >= 4, f"expected adapters in several blocks, found {len(found)}"


def test_opt_out_flag():
    import dataclasses

    from mvd_tpu.config import TINY_MODEL
    from mvd_tpu.pipeline import MVDPipeline

    cfg = dataclasses.replace(TINY_MODEL, adapter_init_from_frozen=False)
    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(0))

    mismatches = []

    def walk(node):
        if not isinstance(node, dict):
            return
        if "attn1" in node and "adapter_self" in node:
            a = np.asarray(node["adapter_self"]["to_q_ref"]["kernel"])
            b = np.asarray(node["attn1"]["to_q"]["kernel"])
            mismatches.append(not np.array_equal(a, b))
        for v in node.values():
            walk(v)

    walk(pipe.params["mvd"])
    assert any(mismatches)
