"""DDIM inversion (diffusion/schedules.py:ddim_inverse_step, MVDPipeline.invert).

The reference has no inversion path; correctness is pinned (a) algebraically
— for epsilon-prediction the inverse step undoes ddim_step exactly given the
same model output — and (b) end-to-end: inverting an image and resampling
with deterministic DDIM reconstructs it far better than an unrelated sample.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvd_tpu.config import TINY_MODEL
from mvd_tpu.camera import orbit_cameras
from mvd_tpu.diffusion import (
    NoiseSchedule,
    ddim_inverse_step,
    ddim_step,
    inference_timesteps,
)
from mvd_tpu.pipeline import MVDPipeline


def test_exact_inverse_for_epsilon():
    """With epsilon parameterization and a shared model output, the inverse
    step is the exact algebraic inverse of the sampling step."""
    sch = NoiseSchedule.create(prediction_type="epsilon")
    steps = 10
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
    for i in (0, 3, 7):  # timesteps whose predecessor is >= 0 and the last
        t = jnp.asarray(int(inference_timesteps(sch, steps)[i]), jnp.int32)
        down = ddim_step(sch, eps, t, x, steps)
        back = ddim_inverse_step(sch, eps, t, down, steps)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_inverse_reaches_unit_noise_level():
    """Inverting pure-x0 predictions walks the clean sample up to the
    schedule's noise level at the top timestep."""
    sch = NoiseSchedule.create(prediction_type="epsilon")
    steps = 20
    asc = inference_timesteps(sch, steps)[::-1]
    x = jnp.ones((1, 4, 4, 4), jnp.float32)
    eps = jnp.zeros_like(x)  # model says "no noise present"
    for t_host in asc:
        x = ddim_inverse_step(sch, eps, jnp.asarray(int(t_host), jnp.int32), x, steps)
    ac_top = float(sch.alphas_cumprod[int(asc[-1])])
    np.testing.assert_allclose(np.asarray(x), np.sqrt(ac_top), rtol=1e-4)


@pytest.fixture(scope="module")
def pipe():
    return MVDPipeline.create(TINY_MODEL, jax.random.PRNGKey(0))


def _smooth_image(hw):
    y, x = np.mgrid[0:hw, 0:hw].astype(np.float32) / (hw - 1)
    img = np.stack([0.3 + 0.4 * x, 0.5 * y, 0.8 - 0.5 * x * y], axis=-1)
    return img[None]  # (1, hw, hw, 3) in [0,1]


def test_roundtrip_reconstruction(pipe):
    """Invert -> DDIM-resample recovers the input better than an unrelated
    sample. The comparison target is the VAE's own mean-encode/decode
    roundtrip — with RANDOM-init weights the VAE reconstruction floor
    (MSE ~0.076 on this image) dominates any image-space comparison, and the
    random UNet's v-field is chaotic so the O(step) inversion drift is much
    larger than it would be for a trained model (measured here:
    recon-vs-target 0.064 vs baseline 0.095). The algebraic correctness of
    the step itself is pinned exactly in test_exact_inverse_for_epsilon."""
    hw = TINY_MODEL.unet.sample_size * 8
    img = _smooth_image(hw)
    steps = 20
    inv = pipe.invert(img, "a chair", num_inference_steps=steps)
    lat = inv["latents"]
    assert lat.shape == (1, hw // 8, hw // 8, 4)
    assert np.isfinite(lat).all()

    recon = pipe(
        "a chair", latents=jnp.asarray(lat), num_inference_steps=steps,
        guidance_scale=1.0, sampler="ddim",
    )["images"]
    # unrelated deterministic sample from a random initial latent
    baseline = pipe(
        "a chair", num_inference_steps=steps, guidance_scale=1.0,
        sampler="ddim", seed=123,
    )["images"]
    # what perfect latent recovery would decode to
    mean, _ = pipe.vae.apply(
        pipe.compute_params["vae"], jnp.asarray(img * 2 - 1),
        method=pipe.vae.encode_moments,
    )
    target = np.clip(
        np.asarray(pipe.vae.apply(pipe.compute_params["vae"], mean,
                                  method=pipe.vae.decode)) / 2 + 0.5, 0, 1)
    err_recon = float(np.mean((recon - target) ** 2))
    err_base = float(np.mean((baseline - target) ** 2))
    assert err_recon < err_base * 0.8, (err_recon, err_base)


def test_invert_with_conditioning(pipe):
    hw = TINY_MODEL.unet.sample_size * 8
    cams = orbit_cameras(2)
    out = pipe.invert(
        _smooth_image(hw),
        "a chair",
        num_inference_steps=4,
        source_camera=cams[0],
        target_camera=cams[1],
        source_images=np.zeros((1, hw, hw, 3), np.float32),
        ref_scale=0.5,
    )
    assert np.isfinite(out["latents"]).all()
