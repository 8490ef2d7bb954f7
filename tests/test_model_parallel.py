"""Tensor-parallel param sharding over the 'model' mesh axis: sharded
forward matches replicated forward (GSPMD partitions the matmuls)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mvd_tpu.config import TINY_UNET
from mvd_tpu.mesh import make_mesh
from mvd_tpu.nn import UNet2DCondition
from mvd_tpu.parallel import model_parallel_shardings, shard_params_model_parallel


def test_model_parallel_forward_matches():
    mesh = make_mesh(model=2)
    model = UNet2DCondition(TINY_UNET)
    hw = TINY_UNET.sample_size
    sample = jax.random.normal(jax.random.PRNGKey(0), (1, hw, hw, 4))
    t = jnp.array(100)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, TINY_UNET.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(2), sample, t, ctx)

    want, _ = model.apply(params, sample, t, ctx)

    # low threshold so the tiny config actually shards something
    shardings = model_parallel_shardings(params, mesh, min_dim=64)
    n_sharded = sum(
        1
        for s in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda s: s.spec != P(), shardings,
                                   is_leaf=lambda x: isinstance(x, NamedSharding))
        )
        if s
    )
    assert n_sharded > 0

    sharded = shard_params_model_parallel(params, mesh, min_dim=64)

    @jax.jit
    def fwd(p, s, t, c):
        out, _ = model.apply(p, s, t, c)
        return out

    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        got = fwd(sharded, sample, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)
