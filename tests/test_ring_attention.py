"""Ring attention vs unsharded attention on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mvd_tpu.kernels.flash_attention import xla_attention
from mvd_tpu.kernels.ring_attention import ring_attention
from mvd_tpu.mesh import make_mesh


def test_ring_attention_matches_full():
    mesh = make_mesh(view=8)
    B, H, S, D = 2, 2, 8 * 16, 32  # S sharded into 8 chunks of 16
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D))
    k = jax.random.normal(kk, (B, H, S, D))
    v = jax.random.normal(kv, (B, H, S, D))

    want = xla_attention(q, k, v)

    spec = P(None, None, "view", None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name="view"),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_ring_attention_gradients():
    mesh = make_mesh(view=4)
    B, H, S, D = 1, 1, 4 * 8, 16
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D))
    k = jax.random.normal(kk, (B, H, S, D))
    v = jax.random.normal(kv, (B, H, S, D))

    spec = P(None, None, "view", None)
    ring = shard_map(
        functools.partial(ring_attention, axis_name="view"),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )

    g_ring = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(ring(q, k, v))), argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(xla_attention(q, k, v))), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


def test_single_device_ring_is_plain_attention():
    mesh = make_mesh(view=1)
    B, H, S, D = 1, 2, 16, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D))
    spec = P(None, None, "view", None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name="view"),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    got = fn(q, q, q)
    want = xla_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
