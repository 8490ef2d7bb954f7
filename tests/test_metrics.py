"""Metric tests: PSNR/SSIM vs closed forms and torch, FID math properties,
tower architectures + converters."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mvd_tpu.metrics.fid import FID, RunningMoments, frechet_distance
from mvd_tpu.metrics.image import psnr, psnr_per_image, ssim
from mvd_tpu.metrics.towers import (
    AlexNetFeatures,
    CLIPVisionEncoder,
    LPIPS,
    PerceptualLoss,
    VGG16Features,
    vgg16_from_torch,
)


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01, data_range 2 -> 10*log10(4/0.01) = 26.02
    np.testing.assert_allclose(float(psnr(a, b)), 26.0206, atol=1e-3)
    assert psnr_per_image(a, b).shape == (1,)


def test_ssim_identity_and_bounds():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3), minval=-1, maxval=1)
    assert float(ssim(x, x)) > 0.9999
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1)
    v = float(ssim(x, y))
    assert -1.0 <= v < 0.5


def test_ssim_matches_separable_numpy_reference():
    """Pin SSIM against a direct numpy implementation. The jax version runs
    its Gaussian windows through conv_general_dilated, which on TPU defaults
    to bf16 passes — the E[x²]−μ² variance terms then catastrophically
    cancel (0.78 true SSIM read as 0.06 on-chip) until Precision.HIGHEST is
    forced. This reference keeps the numerics pinned on every backend."""
    from scipy.signal import convolve2d  # in-image scipy

    rng = np.random.default_rng(3)
    # smooth natural-ish images: offset + low-frequency structure (the
    # cancellation-hostile regime: large μ², small σ²)
    def make(seed):
        r = np.random.default_rng(seed)
        base = r.normal(0.7, 0.02, (1, 24, 24, 1)).astype(np.float32)
        return np.clip(base, 0, 1)

    a, b = make(1), make(2)
    win = np.outer(*(2 * [np.exp(-((np.arange(11) - 5) ** 2) / 4.5)]))
    win = (win / win.sum()).astype(np.float32)

    def f2d(x):
        return convolve2d(x[0, :, :, 0], win[::-1, ::-1], mode="valid")[None, :, :, None]

    c1, c2 = (0.01) ** 2, (0.03) ** 2
    mu_a, mu_b = f2d(a), f2d(b)
    sa = f2d(a * a) - mu_a**2
    sb = f2d(b * b) - mu_b**2
    sab = f2d(a * b) - mu_a * mu_b
    ref = float(
        (((2 * mu_a * mu_b + c1) * (2 * sab + c2)) /
         ((mu_a**2 + mu_b**2 + c1) * (sa + sb + c2))).mean()
    )
    got = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_running_moments_match_numpy():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((100, 5))
    rm = RunningMoments(5)
    for chunk in np.split(data, 4):
        rm.update(chunk)
    np.testing.assert_allclose(rm.mean, data.mean(0), atol=1e-10)
    np.testing.assert_allclose(rm.cov, np.cov(data.T), atol=1e-10)


def test_frechet_distance_properties():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((6, 6))
    cov = a @ a.T + np.eye(6)
    mu = rng.standard_normal(6)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-5
    # equal covariance, shifted mean: FID = ||dmu||^2
    mu2 = mu + 1.0
    np.testing.assert_allclose(
        frechet_distance(mu, cov, mu2, cov), 6.0, rtol=1e-4
    )


def test_fid_end_to_end_with_dummy_extractor():
    extractor = lambda imgs: np.asarray(imgs).reshape(len(imgs), -1)[:, :8]
    fid = FID(extractor)
    rng = np.random.default_rng(2)
    same = rng.uniform(0, 1, (64, 2, 2, 3))
    fid.update(same[:32], real=True)
    fid.update(same[32:], real=False)
    low = fid.compute()
    fid.reset()
    fid.update(rng.uniform(0, 1, (32, 2, 2, 3)), real=True)
    fid.update(rng.uniform(0.5, 1.5, (32, 2, 2, 3)), real=False)
    high = fid.compute()
    assert high > low


def test_vgg16_converter_structure():
    model = VGG16Features()
    want = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # synthetic torchvision-style sd
    sd = {}
    tv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [c for c in [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]]
    in_ch = 3
    for tv_i, c in zip(tv_indices, chans):
        sd[f"features.{tv_i}.weight"] = np.zeros((c, in_ch, 3, 3), np.float32)
        sd[f"features.{tv_i}.bias"] = np.zeros((c,), np.float32)
        in_ch = c
    got = vgg16_from_torch(sd)
    from flax.traverse_util import flatten_dict

    fw, fg = flatten_dict(want), flatten_dict(got)
    assert set(fw) == set(fg)
    for k in fw:
        assert fw[k].shape == fg[k].shape, k


def test_perceptual_loss_runs_with_random_weights():
    model = VGG16Features()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pl = PerceptualLoss(params)
    assert pl.available
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), minval=-1, maxval=1)
    assert float(pl(x, x)) < 1e-6
    y = -x
    assert float(pl(x, y)) > 0


def test_lpips_runs_with_random_weights():
    backbone = AlexNetFeatures()
    params = backbone.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    lins = {f"relu_{i}": np.abs(np.random.default_rng(i).standard_normal(c)).astype(np.float32)
            for i, c in enumerate([64, 192, 384, 256, 256])}
    lp = LPIPS("alex", params, lins)
    assert lp.available
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), minval=-1, maxval=1)
    assert float(lp(x, x)) < 1e-6
    assert float(lp(x, -x)) > 0


def test_clip_vision_tiny():
    enc = CLIPVisionEncoder(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        patch_size=8, image_size=32, projection_dim=16,
    )
    x = jnp.zeros((2, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 16)
