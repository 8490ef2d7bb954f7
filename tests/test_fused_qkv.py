"""MVD_FUSED_QKV=1 fuses projections sharing an input into one matmul
(layers._DenseParams / Attention / CrossViewAdapter).  Exact-math rewrite:
same param tree, numerically matching outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvd_tpu.nn.layers import Attention, BasicTransformerBlock, CrossViewAdapter


def _params_equal_tree(a, b):
    la = jax.tree_util.tree_structure(a)
    lb = jax.tree_util.tree_structure(b)
    assert la == lb


@pytest.mark.parametrize("cross", [False, True])
def test_attention_fused_matches_unfused(monkeypatch, cross):
    B, S, D, heads, hd = 2, 16, 32, 4, 8
    rng = jax.random.PRNGKey(0)
    hidden = jax.random.normal(rng, (B, S, D))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 24)) if cross else None

    mod = Attention(heads=heads, head_dim=hd, attention_impl="xla")

    monkeypatch.setenv("MVD_FUSED_QKV", "0")
    params = mod.init(jax.random.PRNGKey(2), hidden, ctx)
    base = mod.apply(params, hidden, ctx)

    monkeypatch.setenv("MVD_FUSED_QKV", "1")
    params_fused = mod.init(jax.random.PRNGKey(2), hidden, ctx)
    _params_equal_tree(params, params_fused)  # checkpoint-identical tree
    fused = mod.apply(params, hidden, ctx)  # SAME params through fused path

    np.testing.assert_allclose(np.asarray(base), np.asarray(fused), atol=1e-5)


def test_adapter_fused_matches_unfused(monkeypatch):
    B, S, Sk, D, heads, hd = 2, 16, 12, 32, 4, 8
    hidden = jax.random.normal(jax.random.PRNGKey(0), (B, S, D))
    ref = jax.random.normal(jax.random.PRNGKey(1), (B, Sk, D))

    mod = CrossViewAdapter(heads=heads, head_dim=hd, attention_impl="xla")

    monkeypatch.setenv("MVD_FUSED_QKV", "0")
    params = mod.init(jax.random.PRNGKey(2), hidden, ref)
    base = mod.apply(params, hidden, ref)

    monkeypatch.setenv("MVD_FUSED_QKV", "1")
    params_fused = mod.init(jax.random.PRNGKey(2), hidden, ref)
    _params_equal_tree(params, params_fused)
    fused = mod.apply(params, hidden, ref)

    np.testing.assert_allclose(np.asarray(base), np.asarray(fused), atol=1e-5)


def test_transformer_block_fused_grads_flow(monkeypatch):
    """The fused path must stay differentiable (training uses it when the
    flag is on) and gradients must match the unfused path."""
    B, S, D, heads, hd = 2, 8, 16, 2, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, D))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 24))
    mod = BasicTransformerBlock(heads=heads, head_dim=hd, attention_impl="xla")

    monkeypatch.setenv("MVD_FUSED_QKV", "0")
    params = mod.init(jax.random.PRNGKey(2), x, ctx)

    def loss(p):
        return jnp.sum(mod.apply(p, x, ctx) ** 2)

    g_base = jax.grad(loss)(params)

    monkeypatch.setenv("MVD_FUSED_QKV", "1")
    g_fused = jax.grad(loss)(params)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        ),
        g_base,
        g_fused,
    )
