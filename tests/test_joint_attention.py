"""Joint multi-view attention: unsharded vs view-sharded (shard_map + ring)
parity on the virtual CPU mesh. Flat batch convention: row = b * V + v."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mvd_tpu.config import TINY_UNET
from mvd_tpu.mesh import make_mesh
from mvd_tpu.nn import UNet2DCondition


def _setup(num_views, view_axis=None):
    cfg = dataclasses.replace(
        TINY_UNET, num_views=num_views, view_axis=view_axis, with_adapters=False
    )
    return UNet2DCondition(cfg)


def test_joint_vs_single_view_differs():
    B, V, hw = 1, 2, TINY_UNET.sample_size
    sample = jax.random.normal(jax.random.PRNGKey(0), (B * V, hw, hw, 4))
    t = jnp.array(10)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B * V, 77, TINY_UNET.cross_attention_dim))

    single = _setup(1)
    joint = _setup(2)
    params = single.init(jax.random.PRNGKey(2), sample, t, ctx)
    out_single, _ = single.apply(params, sample, t, ctx)
    out_joint, _ = joint.apply(params, sample, t, ctx)
    assert out_single.shape == out_joint.shape
    assert not np.allclose(np.asarray(out_single), np.asarray(out_joint))


def test_view_sharded_matches_unsharded():
    """(B, V, ...) batch, V sharded over 2 devices, vs unsharded joint."""
    mesh = make_mesh(data=2, view=2)
    B, V, hw = 2, 2, TINY_UNET.sample_size
    sample = jax.random.normal(jax.random.PRNGKey(0), (B * V, hw, hw, 4))
    t = jnp.array(500)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B * V, 77, TINY_UNET.cross_attention_dim))

    joint = _setup(2)
    params = joint.init(jax.random.PRNGKey(2), sample, t, ctx)
    want, _ = joint.apply(params, sample, t, ctx)

    sharded_model = _setup(2, view_axis="view")

    def body(params, sample_bv, t, ctx_bv):
        s = sample_bv.reshape((-1,) + sample_bv.shape[2:])
        c = ctx_bv.reshape((-1,) + ctx_bv.shape[2:])
        out, _ = sharded_model.apply(params, s, t, c)
        return out.reshape(sample_bv.shape[:2] + out.shape[1:])

    bv = lambda nd: P("data", "view", *([None] * (nd - 2)))
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), bv(5), P(), bv(4)),
        out_specs=bv(5),
        check_vma=False,
    )
    sample_bv = sample.reshape(B, V, hw, hw, 4)
    ctx_bv = ctx.reshape(B, V, 77, -1)
    got = jax.jit(fn)(params, sample_bv, t, ctx_bv)
    got = got.reshape(B * V, hw, hw, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)
