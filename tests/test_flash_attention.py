"""Flash-attention kernel parity vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvd_tpu.kernels.flash_attention import attention_packed, flash_attention, xla_attention


def make_qkv(key, B=1, H=2, Sq=256, Sk=256, D=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, Sq, D), dtype)
    k = jax.random.normal(kk, (B, H, Sk, D), dtype)
    v = jax.random.normal(kv, (B, H, Sk, D), dtype)
    return q, k, v


@pytest.mark.parametrize("sq,sk", [(256, 256), (256, 128), (384, 256)])
def test_forward_matches_xla(sq, sk):
    q, k, v = make_qkv(jax.random.PRNGKey(0), Sq=sq, Sk=sk)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_forward_multi_kv_blocks():
    # multiple full K/V blocks exercise the fori_loop online-softmax merge
    q, k, v = make_qkv(jax.random.PRNGKey(1), Sq=128, Sk=256)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "sq,sk",
    [
        (128, 77),   # text cross-attention K/V (reference pipeline.py:54-60)
        (100, 200),  # q tail + k tail
        (300, 130),  # multi-block with tails on both
    ],
)
def test_forward_masked_tails(sq, sk):
    """Non-block-multiple lengths: padded K/V columns are masked to -inf
    inside the kernel (flash_attention.py tail handling)."""
    q, k, v = make_qkv(jax.random.PRNGKey(4), Sq=sq, Sk=sk)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_gradients_masked_tails():
    """Grads through the padded/masked path: padded q rows get dO=0, padded
    K/V rows are zero, so dq/dk/dv must equal the unpadded XLA reference."""
    q, k, v = make_qkv(jax.random.PRNGKey(5), B=1, H=1, Sq=150, Sk=77)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


def test_gradients_multi_blocks_both_axes():
    """nq=2, nk=3 with block 128: exercises the grid-streamed backward's
    scratch accumulation across BOTH the dq k-dimension and the dk/dv
    q-dimension (the whole-length-residency path OOM'd VMEM at S=9216)."""
    q, k, v = make_qkv(jax.random.PRNGKey(7), B=1, H=2, Sq=256, Sk=384)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


def test_gradients_match_xla():
    q, k, v = make_qkv(jax.random.PRNGKey(2), B=1, H=1, Sq=128, Sk=128)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


def test_scale_override():
    q, k, v = make_qkv(jax.random.PRNGKey(3), Sq=128, Sk=128)
    want = xla_attention(q, k, v, scale=0.5)
    got = flash_attention(q, k, v, scale=0.5, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


class TestPackedLayout:
    """attention_packed / flash_attention_packed on (B, S, H*D) — the
    transpose-free layout the UNet's non-joint attention sites use."""

    def _ref(self, q, k, v, heads):
        from mvd_tpu.kernels.flash_attention import xla_attention

        B, Sq, HD = q.shape
        Sk = k.shape[1]
        D = HD // heads
        split = lambda t, s: t.reshape(B, s, heads, D).transpose(0, 2, 1, 3)
        out = xla_attention(split(q, Sq), split(k, Sk), split(v, Sk))
        return out.transpose(0, 2, 1, 3).reshape(B, Sq, HD)

    def test_forward_matches_transposed_path(self):
        from mvd_tpu.kernels.flash_attention import flash_attention_packed

        rng = np.random.default_rng(0)
        heads, D = 3, 64
        for Sq, Sk in [(256, 256), (300, 77), (256, 200)]:
            q = jnp.asarray(rng.standard_normal((2, Sq, heads * D)), jnp.float32)
            k = jnp.asarray(rng.standard_normal((2, Sk, heads * D)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((2, Sk, heads * D)), jnp.float32)
            got = flash_attention_packed(
                q, k, v, heads, block_q=128, block_k=128, interpret=True
            )
            want = self._ref(q, k, v, heads)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
            )

    def test_grad_matches_transposed_path(self):
        from mvd_tpu.kernels.flash_attention import flash_attention_packed

        rng = np.random.default_rng(1)
        heads, D = 2, 64
        q = jnp.asarray(rng.standard_normal((1, 256, heads * D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 200, heads * D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 200, heads * D)), jnp.float32)
        f1 = lambda q, k, v: jnp.sum(
            flash_attention_packed(q, k, v, heads, block_q=128, block_k=128, interpret=True) ** 2
        )
        f2 = lambda q, k, v: jnp.sum(self._ref(q, k, v, heads) ** 2)
        g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4)

    def test_int8_forward_accuracy(self):
        """The int8 (SageAttention-style) kernel is a closed-out perf
        experiment (slower than bf16 on v5e at D=64 — see the kernel's
        header) but must stay CORRECT: ~34 dB vs the f32 reference at this
        shape, limited by the int8 P term. K gets a non-zero mean so the
        smoothing path is exercised."""
        from mvd_tpu.kernels.flash_attention import flash_attention_packed_int8

        rng = np.random.default_rng(3)
        heads, D, S = 2, 64, 256
        q = jnp.asarray(rng.standard_normal((1, S, heads * D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, S, heads * D)) + 0.7, jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, S, heads * D)), jnp.float32)
        got = flash_attention_packed_int8(
            q, k, v, heads, block_q=128, block_k=128, interpret=True
        )
        want = self._ref(q, k, v, heads)
        err = np.mean((np.asarray(got) - np.asarray(want)) ** 2)
        sig = np.mean(np.asarray(want) ** 2)
        snr_db = 10 * np.log10(sig / err)
        assert snr_db > 30.0, f"int8 attention SNR {snr_db:.1f} dB < 30"

    def test_int8_grad_straight_through(self):
        """impl="int8" survives jax.grad: the straight-through VJP feeds the
        int8 forward's (out, lse) to the bf16 flash backward, so gradients
        approximate the exact ones."""
        from mvd_tpu.kernels.flash_attention import flash_attention_packed_int8

        rng = np.random.default_rng(4)
        heads, D, S = 2, 64, 256
        q = jnp.asarray(rng.standard_normal((1, S, heads * D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, S, heads * D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, S, heads * D)), jnp.float32)
        f8 = lambda q, k, v: jnp.sum(
            flash_attention_packed_int8(
                q, k, v, heads, block_q=128, block_k=128, interpret=True
            ) ** 2
        )
        fr = lambda q, k, v: jnp.sum(self._ref(q, k, v, heads) ** 2)
        g8 = jax.grad(f8, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g8, gr):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b).max() / np.abs(b).max()
            assert rel < 0.15, f"straight-through grad rel err {rel:.3f}"

    def test_int8_fallback_on_untileable_shapes(self):
        """Sequence lengths that don't tile into whole blocks route to the
        (exact) bf16 packed kernel."""
        from mvd_tpu.kernels.flash_attention import flash_attention_packed_int8

        rng = np.random.default_rng(5)
        heads, D = 2, 64
        q = jnp.asarray(rng.standard_normal((1, 300, heads * D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 77, heads * D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 77, heads * D)), jnp.float32)
        got = flash_attention_packed_int8(
            q, k, v, heads, block_q=128, block_k=128, interpret=True
        )
        want = self._ref(q, k, v, heads)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_dispatch_xla_fallback(self):
        from mvd_tpu.kernels.flash_attention import attention_packed

        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.standard_normal((1, 64, 128)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 32, 128)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 32, 128)), jnp.float32)
        got = attention_packed(q, k, v, 2, impl="auto")  # short seq -> XLA
        want = self._ref(q, k, v, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_remat_policy_saves_flash_residuals():
    """Gradients through a remat'd block are identical whether the policy
    saves the flash residuals or recomputes everything — and with the
    save_only_these_names policy the named (out, lse) values are stored, so
    the backward pass does not re-run the forward kernel (numerics-equal by
    construction; this pins the checkpoint_name plumbing)."""
    import jax
    from jax.ad_checkpoint import checkpoint

    rng = np.random.default_rng(11)
    B, S, H, D = 1, 256, 2, 32
    q = jnp.asarray(rng.standard_normal((B, S, H * D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H * D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H * D)), jnp.float32)

    def block(q, k, v):
        out = attention_packed(q, k, v, H, impl="pallas_interpret")
        return jnp.sum(out**2)

    policy = jax.checkpoint_policies.save_only_these_names("flash_out", "flash_lse")
    g_plain = jax.grad(checkpoint(block))(q, k, v)
    g_saved = jax.grad(checkpoint(block, policy=policy))(q, k, v)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_saved), rtol=1e-6)
