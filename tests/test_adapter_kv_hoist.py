"""Precomputed adapter K/V (hoisted out of the denoise loop) must match the
raw-feature path bit-for-bit in fp32."""

import jax
import jax.numpy as jnp
import numpy as np

from mvd_tpu.config import TINY_MODEL, TINY_UNET
from mvd_tpu.nn import MultiViewUNet


def test_precomputed_kv_matches_raw():
    model = MultiViewUNet(TINY_MODEL)
    B, hw = 2, TINY_UNET.sample_size
    sample = jax.random.normal(jax.random.PRNGKey(0), (B, hw, hw, 4))
    t = jnp.asarray(300)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, TINY_UNET.cross_attention_dim))
    cams = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    cams2 = cams.at[:, 0, 3].set(1.0)
    src = jax.random.normal(jax.random.PRNGKey(2), (B, hw, hw, 4))
    params = model.init(
        jax.random.PRNGKey(3), sample, t, ctx,
        source_camera=cams, target_camera=cams2, source_image_latents=src,
    )

    film_a, ref_a = model.apply(
        params, ctx, cams, cams2, src, method=model.prepare_conditioning
    )
    film_b, ref_b = model.apply(
        params, ctx, cams, cams2, src, precompute_kv=True,
        method=model.prepare_conditioning,
    )
    assert isinstance(next(iter(ref_b.values())), dict)

    out_a = model.apply(params, sample, t, ctx, film_a, ref_a, method=model.denoise)
    out_b = model.apply(params, sample, t, ctx, film_b, ref_b, method=model.denoise)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5, rtol=1e-5)
