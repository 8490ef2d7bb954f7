"""Shape/behavior tests for the Flax model stack on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvd_tpu.config import (
    TINY_CLIP,
    TINY_MODEL,
    TINY_UNET,
    TINY_VAE,
    CameraEncoderConfig,
)
from mvd_tpu.nn import (
    AutoencoderKL,
    CameraEncoder,
    CLIPTextEncoder,
    MultiViewUNet,
    UNet2DCondition,
    modulation_dims,
)


@pytest.fixture(scope="module")
def unet_setup():
    model = UNet2DCondition(TINY_UNET)
    B, hw = 2, TINY_UNET.sample_size
    sample = jnp.zeros((B, hw, hw, 4))
    t = jnp.array([10, 500])
    ctx = jnp.zeros((B, 77, TINY_UNET.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), sample, t, ctx)
    return model, params, sample, t, ctx


def test_unet_output_shape_and_features(unet_setup):
    model, params, sample, t, ctx = unet_setup
    out, feats = model.apply(params, sample, t, ctx)
    assert out.shape == sample.shape
    # feature names match the reference hook names (image_encoder.py:40-79)
    want = {f"down_block_{i}_attn_{j}" for i in range(3) for j in range(2)}
    want |= {"mid_block_attn_0"}
    want |= {f"up_block_{i}_attn_{j}" for i in range(1, 4) for j in range(3)}
    assert set(feats) == want
    # feature spatial dims: down halves, up doubles
    assert feats["down_block_0_attn_0"].shape[1] == TINY_UNET.sample_size
    assert feats["mid_block_attn_0"].shape[1] == TINY_UNET.sample_size // 8


def test_unet_ref_features_change_output(unet_setup):
    model, params, sample, t, ctx = unet_setup
    out0, feats = model.apply(params, sample, t, ctx)
    key = jax.random.PRNGKey(1)
    ref = {
        k: jax.random.normal(jax.random.fold_in(key, i), (v.shape[0], v.shape[1] * v.shape[2], v.shape[3]))
        for i, (k, v) in enumerate(feats.items())
    }
    out1, _ = model.apply(params, sample, t, ctx, ref_features=ref)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_unet_film_applies(unet_setup):
    model, params, sample, t, ctx = unet_setup
    out0, _ = model.apply(params, sample, t, ctx)
    film = {"mid": (jnp.full((2, 64), 2.0), jnp.zeros((2, 64)))}
    out1, _ = model.apply(params, sample, t, ctx, film=film)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(TINY_VAE)
    x = jnp.zeros((1, 64, 64, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (1, 8, 8, 4)
    y = vae.apply(params, z, method=vae.decode)
    assert y.shape == x.shape
    mean, logvar = vae.apply(params, x, method=vae.encode_moments)
    assert mean.shape == z.shape and logvar.shape == z.shape


def test_clip_text_shapes():
    enc = CLIPTextEncoder(TINY_CLIP)
    ids = jnp.zeros((2, 77), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids)
    out = enc.apply(params, ids)
    assert out.shape == (2, 77, TINY_CLIP.hidden_size)


def test_clip_causality():
    """Changing a later token must not affect earlier positions."""
    enc = CLIPTextEncoder(TINY_CLIP)
    ids = jnp.ones((1, 77), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids)
    out1 = enc.apply(params, ids)
    ids2 = ids.at[0, 50].set(7)
    out2 = enc.apply(params, ids2)
    np.testing.assert_allclose(
        np.asarray(out1[0, :50]), np.asarray(out2[0, :50]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out1[0, 50:]), np.asarray(out2[0, 50:]))


def test_camera_encoder_film_init_scale():
    """At init, FiLM scale ~= sigmoid(0.5)*2*strength and shift ~= 0
    (reference init, camera_encoder.py:93-105)."""
    cfg = CameraEncoderConfig(output_dim=48, hidden_dim=32, modulation_strength=0.2)
    dims = tuple(sorted(modulation_dims((32, 64, 64, 64), 4, 4).items()))
    enc = CameraEncoder(cfg, modulation_hidden_dims=dims)
    cams = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    cams2 = cams.at[:, :3, 3].set(jnp.array([[1.0, 0, 0], [0, 1.0, 0]]))
    params = enc.init(jax.random.PRNGKey(0), cams, cams2)
    emb, film = enc.apply(params, cams, cams2)
    assert emb.shape == (2, 48)
    assert set(dict(dims)) == set(film)
    scale, shift = film["mid"]
    assert scale.shape == (2, 64)
    expected = 1.0 / (1.0 + np.exp(-0.5)) * 2.0 * 0.2
    np.testing.assert_allclose(np.asarray(scale).mean(), expected, atol=0.02)
    np.testing.assert_allclose(np.asarray(shift), 0.0, atol=0.05)


def test_multiview_unet_end_to_end():
    model = MultiViewUNet(TINY_MODEL)
    B, hw = 2, TINY_UNET.sample_size
    sample = jnp.zeros((B, hw, hw, 4))
    t = jnp.array(100)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, TINY_UNET.cross_attention_dim))
    cams = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    src_lat = jax.random.normal(jax.random.PRNGKey(2), (B, hw, hw, 4))
    params = model.init(
        jax.random.PRNGKey(0), sample, t, ctx,
        source_camera=cams, target_camera=cams, source_image_latents=src_lat,
    )
    out = model.apply(
        params, sample, t, ctx,
        source_camera=cams, target_camera=cams, source_image_latents=src_lat,
    )
    assert out.shape == sample.shape
    # conditioning off -> different output
    out_uncond = model.apply(params, sample, t, ctx)
    assert not np.allclose(np.asarray(out), np.asarray(out_uncond))


def test_multiview_unet_cfg_batch():
    """2B latents with B conditioning tensors (CFG) must work."""
    model = MultiViewUNet(TINY_MODEL)
    B, hw = 1, TINY_UNET.sample_size
    sample = jnp.zeros((2 * B, hw, hw, 4))
    t = jnp.array(100)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2 * B, 77, TINY_UNET.cross_attention_dim))
    cams = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    src_lat = jnp.zeros((B, hw, hw, 4))
    params = model.init(
        jax.random.PRNGKey(0), sample, t, ctx,
        source_camera=cams, target_camera=cams, source_image_latents=src_lat,
    )
    out = model.apply(
        params, sample, t, ctx,
        source_camera=cams, target_camera=cams, source_image_latents=src_lat,
    )
    assert out.shape == sample.shape


@pytest.mark.parametrize("mode", ["flash_conv", "flash_conv_dots"])
def test_remat_policy_modes_grad_equal(mode, monkeypatch):
    """All MVD_REMAT_POLICY modes give bit-identical UNet gradients — the
    policy only changes what is SAVED across the remat boundary (conv
    outputs / matmul outputs), never the math (nn/unet.py:_remat_policy)."""
    import dataclasses

    from mvd_tpu.nn.unet import UNet2DCondition as UNet

    cfg = dataclasses.replace(TINY_UNET, remat=True)
    model = UNet(cfg)
    B, hw = 1, cfg.sample_size
    sample = jax.random.normal(jax.random.PRNGKey(1), (B, hw, hw, 4))
    t = jnp.array([7])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 77, cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), sample, t, ctx)

    def loss(p):
        return jnp.sum(model.apply(p, sample, t, ctx)[0] ** 2)

    monkeypatch.setenv("MVD_REMAT_POLICY", "none")
    g_none = jax.grad(loss)(params)
    monkeypatch.setenv("MVD_REMAT_POLICY", mode)
    g_mode = jax.grad(loss)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_none), jax.tree_util.tree_leaves(g_mode)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
