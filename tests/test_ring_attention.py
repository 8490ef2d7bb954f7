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


def _packed(t):
    B, H, S, D = t.shape
    return t.transpose(0, 2, 1, 3).reshape(B, S, H * D)


def test_ring_attention_packed_matches_full_and_grads():
    """Packed-layout ring (the layout the sharded UNet feeds, no head
    transposes) vs unsharded attention — values and grads."""
    from mvd_tpu.kernels.ring_attention import ring_attention_packed

    mesh = make_mesh(view=4)
    B, H, S, D = 2, 2, 4 * 32, 16
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D))
    k = jax.random.normal(kk, (B, H, S, D))
    v = jax.random.normal(kv, (B, H, S, D))
    want = _packed(xla_attention(q, k, v))

    spec = P(None, "view", None)
    ring = shard_map(
        functools.partial(ring_attention_packed, heads=H, axis_name="view"),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    qp, kp, vp = _packed(q), _packed(k), _packed(v)
    got = jax.jit(ring)(qp, kp, vp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    g_ring = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(ring(q, k, v))), argnums=(0, 1, 2)
    )(qp, kp, vp)
    g_full = jax.grad(
        lambda q, k, v: jnp.sum(
            jnp.sin(_packed(xla_attention(q, k, v)))
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), _packed(np.asarray(b)), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name}",
        )


def test_ring_attention_flash_hop_interpret():
    """The Pallas flash (out, lse) per-hop path — forward AND backward
    kernels in interpret mode on the CPU mesh — vs unsharded attention."""
    from mvd_tpu.kernels.ring_attention import ring_attention_packed

    mesh = make_mesh(view=2)
    B, H, D = 1, 2, 64
    S = 2 * 256  # 256-token local shards, 128-aligned
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, S, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)
    want = _packed(xla_attention(q, k, v))

    spec = P(None, "view", None)
    # check_vma=False: pallas_call inside shard_map doesn't declare vma on
    # its out_shapes — same setting the production wrappers use
    # (parallel.py:sharded_denoise_fn)
    ring = shard_map(
        functools.partial(
            ring_attention_packed, heads=H, axis_name="view",
            impl="pallas_interpret",
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    qp, kp, vp = _packed(q), _packed(k), _packed(v)
    got = ring(qp, kp, vp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    g_ring = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(ring(q, k, v))), argnums=(0, 1, 2))(
        qp, kp, vp
    )
    g_full = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(_packed(xla_attention(q, k, v)))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), _packed(np.asarray(b)), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name}",
        )


def test_ring_attention_north_star_local_sequence():
    """Grad parity at the north-star LOCAL sequence length: 8-view 768² joint
    attention sharded 2-way = 9216 tokens per shard (VERDICT r2 weak #3 'done'
    criterion). XLA hops on CPU (the flash-hop kernels are covered in
    interpret mode above and at full scale by benchmarks/kernel_bench.py);
    what this pins is the ring merge + whole-ring VJP at real S."""
    from mvd_tpu.kernels.ring_attention import ring_attention_packed

    mesh = make_mesh(view=2)
    B, H, D = 1, 1, 64
    S = 2 * 9216
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    q = 0.3 * jax.random.normal(kq, (B, H, S, D), jnp.float32)
    k = 0.3 * jax.random.normal(kk, (B, H, S, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)

    spec = P(None, "view", None)
    ring = shard_map(
        functools.partial(ring_attention_packed, heads=H, axis_name="view"),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    qp, kp, vp = _packed(q), _packed(k), _packed(v)

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(ring(q, k, v)))

    def loss_full(q, k, v):
        return jnp.sum(jnp.sin(_packed(xla_attention(q, k, v))))

    got, g_ring = jax.jit(jax.value_and_grad(loss_ring, argnums=(0, 1, 2)))(qp, kp, vp)
    want, g_full = jax.jit(jax.value_and_grad(loss_full, argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for a, b, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), _packed(np.asarray(b)), atol=1e-4, rtol=1e-3,
            err_msg=f"d{name}",
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
