"""Multi-slice (DCN) mesh construction + view-sharded execution on a fake
2-slice topology (SURVEY §2.4 elastic/multi-node row, §5.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvd_tpu.config import TINY_MODEL
from mvd_tpu.mesh import make_mesh, mesh_from_shape
from mvd_tpu.nn import MultiViewUNet
from mvd_tpu.parallel import for_view_sharding, sharded_denoise_fn
from mvd_tpu.pipeline import MVDPipeline


def test_multislice_grouping():
    devs = jax.devices()
    mesh = make_mesh(data=4, view=2, num_slices=2)
    arr = mesh.devices
    assert arr.shape == (4, 2, 1)
    # slice index is the outermost data-axis factor: data rows 0-1 hold the
    # first contiguous device group, rows 2-3 the second
    assert set(d.id for d in arr[:2].ravel()) == set(d.id for d in devs[:4])
    assert set(d.id for d in arr[2:].ravel()) == set(d.id for d in devs[4:8])


def test_multislice_requires_divisibility():
    with pytest.raises(ValueError, match="divisible by num_slices"):
        make_mesh(data=3, view=2, num_slices=2)


def test_mesh_from_shape_accepts_num_slices():
    mesh = mesh_from_shape({"data": 8, "view": 1, "num_slices": 2})
    assert mesh.shape == {"data": 8, "view": 1, "model": 1}


def test_view_sharded_denoise_on_multislice_mesh():
    """The ring cross-view attention (ICI-style collective) runs correctly on
    a 2-slice data axis: sharded output == unsharded reference."""
    mesh = make_mesh(data=2, view=2, num_slices=2)
    B, V = 2, 2
    hw = TINY_MODEL.unet.sample_size
    cfg_u = for_view_sharding(TINY_MODEL, num_views=V, view_devices=1)
    cfg_s = for_view_sharding(TINY_MODEL, num_views=V, view_devices=2)
    pipe = MVDPipeline.create(cfg_u, jax.random.PRNGKey(0))
    model_u = MultiViewUNet(cfg_u)
    model_s = MultiViewUNet(cfg_s)
    latents = jax.random.normal(jax.random.PRNGKey(1), (B, V, hw, hw, 4))
    text = jax.random.normal(
        jax.random.PRNGKey(2), (B, V, 77, TINY_MODEL.unet.cross_attention_dim)
    )
    t = jnp.asarray(500)

    want = model_u.apply(
        pipe.params["mvd"],
        latents.reshape((B * V,) + latents.shape[2:]),
        t,
        text.reshape(B * V, 77, -1),
        None,
        None,
        method=model_u.denoise,
    )
    den = sharded_denoise_fn(model_s, mesh)
    got = den(pipe.params["mvd"], latents, t, text, None, None, None)
    np.testing.assert_allclose(
        np.asarray(got).reshape(want.shape), np.asarray(want), atol=5e-4, rtol=5e-4
    )
