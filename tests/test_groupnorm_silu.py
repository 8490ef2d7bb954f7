"""Fused GroupNorm+SiLU kernel vs XLA reference (interpret mode) and vs
torch.nn.functional.group_norm."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mvd_tpu.kernels.groupnorm_silu import groupnorm_silu, xla_groupnorm_silu


def test_xla_reference_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)

    got = xla_groupnorm_silu(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), num_groups=8,
        apply_silu=False,
    )
    want = torch.nn.functional.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 8,
        torch.from_numpy(scale), torch.from_numpy(bias),
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_pallas_kernel_matches_xla():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 16, 128)).astype(np.float32)
    scale = rng.standard_normal(128).astype(np.float32)
    bias = rng.standard_normal(128).astype(np.float32)
    for silu in (True, False):
        want = xla_groupnorm_silu(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 32, apply_silu=silu
        )
        got = groupnorm_silu(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 32,
            apply_silu=silu, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_pallas_kernel_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 256)), jnp.bfloat16)
    scale = jnp.ones(256, jnp.float32)
    bias = jnp.zeros(256, jnp.float32)
    want = xla_groupnorm_silu(x, scale, bias, 32)
    got = groupnorm_silu(x, scale, bias, 32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


def test_fallback_on_unaligned_channels():
    x = jnp.zeros((1, 4, 4, 40))  # 40 % 128 != 0 -> XLA path
    out = groupnorm_silu(x, jnp.ones(40), jnp.zeros(40), 8)
    assert out.shape == x.shape
