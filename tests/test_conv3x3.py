"""Shifted-matmul conv vs XLA conv: forward + gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mvd_tpu.kernels.conv import conv3x3_shifted, use_shifted


def test_matches_torch_conv():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 6)).astype(np.float32)
    w = rng.standard_normal((3, 3, 6, 10)).astype(np.float32) * 0.1
    b = rng.standard_normal(10).astype(np.float32)
    got = np.asarray(conv3x3_shifted(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        torch.from_numpy(b),
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_gradients_match_xla_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 4))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 8)) * 0.1

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    g1 = jax.grad(lambda x, w: jnp.sum(jnp.sin(conv3x3_shifted(x, w))), (0, 1))(x, w)
    g2 = jax.grad(lambda x, w: jnp.sum(jnp.sin(xla_conv(x, w))), (0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_dispatch_policy():
    assert not use_shifted((1, 8, 8, 64), (3, 3, 64, 64), 1, "auto") or (
        jax.default_backend() == "tpu"
    )
    assert use_shifted((1, 8, 8, 512), (3, 3, 512, 512), 1, "shifted")
    assert not use_shifted((1, 8, 8, 512), (1, 1, 512, 512), 1, "shifted")
    assert not use_shifted((1, 8, 8, 512), (3, 3, 512, 512), 2, "shifted")
    assert not use_shifted((1, 8, 8, 512), (3, 3, 512, 512), 1, "xla")


def test_upsample_folded_matches_naive():
    """conv3x3_after_nearest_x2 == nearest-x2 then 3x3 SAME conv (the folded
    subpixel identity used by Upsample)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvd_tpu.nn.layers import conv3x3_after_nearest_x2

    B, H, W, C, O = 2, 5, 7, 8, 12
    kx, kk, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (B, H, W, C))
    k = jax.random.normal(kk, (3, 3, C, O)) * 0.2
    b = jax.random.normal(kb, (O,))

    up = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    up = up.reshape(B, 2 * H, 2 * W, C)
    want = jax.lax.conv_general_dilated(
        up, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b

    got = conv3x3_after_nearest_x2(x, k, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    from mvd_tpu.nn.layers import conv3x3_after_nearest_x2_transposed

    got_t = conv3x3_after_nearest_x2_transposed(x, k, b)
    assert got_t.shape == want.shape
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_upsample_transposed_grads_match_naive():
    """The lhs-dilated default is differentiable and its grads equal the
    materialized upsample-then-conv formulation's."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvd_tpu.nn.layers import conv3x3_after_nearest_x2_transposed

    B, H, W, C, O = 1, 4, 5, 3, 2
    kx, kk = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (B, H, W, C))
    k = jax.random.normal(kk, (3, 3, C, O)) * 0.2
    b = jnp.zeros((O,))

    def naive(x, k):
        up = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
        up = up.reshape(B, 2 * H, 2 * W, C)
        return jax.lax.conv_general_dilated(
            up, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    loss_n = lambda x, k: jnp.sum(jnp.sin(naive(x, k)))
    loss_t = lambda x, k: jnp.sum(jnp.sin(conv3x3_after_nearest_x2_transposed(x, k, b)))
    gn = jax.grad(loss_n, (0, 1))(x, k)
    gt = jax.grad(loss_t, (0, 1))(x, k)
    for a, c in zip(gn, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5, rtol=2e-5)


def test_upsample_module_env_paths_agree(monkeypatch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvd_tpu.nn.layers import Upsample

    m = Upsample(out_channels=6)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 3))
    params = m.init(jax.random.PRNGKey(2), x)
    got = m.apply(params, x)  # default: transposed
    monkeypatch.setenv("MVD_UPSAMPLE", "subpixel")
    want_sub = m.apply(params, x)
    monkeypatch.setenv("MVD_UPSAMPLE", "naive")
    want_naive = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_sub), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_naive), atol=2e-5, rtol=2e-5)
