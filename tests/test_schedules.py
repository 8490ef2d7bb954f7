"""Parity tests for noise schedules / SNR math against independent torch
implementations of the same published formulas (DDPM, Min-SNR, ShiftSNR)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mvd_tpu.diffusion import (
    NoiseSchedule,
    add_noise,
    compute_snr,
    ddim_step,
    ddpm_step,
    get_velocity,
    inference_timesteps,
    make_shifted_schedule,
    min_snr_weight,
    pred_original_sample,
    snr_to_betas,
)


def torch_schedule(T=1000, bs=0.00085, be=0.012):
    betas = torch.linspace(bs**0.5, be**0.5, T, dtype=torch.float64) ** 2
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    return betas, alphas_cumprod


@pytest.fixture(scope="module")
def sched():
    return NoiseSchedule.create()


def test_betas_and_alphas_cumprod_match_torch(sched):
    betas, ac = torch_schedule()
    np.testing.assert_allclose(np.asarray(sched.betas), betas.numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), ac.numpy(), rtol=1e-4
    )


def test_snr_matches_closed_form(sched):
    _, ac = torch_schedule()
    t = np.array([0, 1, 10, 500, 999])
    want = (ac[t] / (1 - ac[t])).numpy()
    got = np.asarray(compute_snr(sched, jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_snr_to_betas_roundtrip(sched):
    t = jnp.arange(1000)
    snr = compute_snr(sched, t)
    betas = snr_to_betas(snr)
    round_trip = NoiseSchedule.create(betas=np.asarray(betas))
    np.testing.assert_allclose(
        np.asarray(round_trip.alphas_cumprod),
        np.asarray(sched.alphas_cumprod),
        rtol=2e-3,
        atol=1e-7,
    )


def test_shifted_schedule_scales_snr(sched):
    shifted = make_shifted_schedule(sched, shift_scale=6.0, mode="default")
    t = jnp.arange(1000)
    ratio = compute_snr(sched, t) / compute_snr(shifted, t)
    np.testing.assert_allclose(np.asarray(ratio), 6.0, rtol=5e-2)


def test_interpolated_shift_endpoints(sched):
    """t=0 keeps the original SNR; t=T-1 gets the full shift
    (reference scheduler.py:100-120)."""
    shifted = make_shifted_schedule(sched, shift_scale=6.0, mode="interpolated")
    t = jnp.arange(1000)
    snr0 = compute_snr(sched, t)
    snr1 = compute_snr(shifted, t)
    np.testing.assert_allclose(float(snr1[0]), float(snr0[0]), rtol=2e-2)
    np.testing.assert_allclose(float(snr1[999]), float(snr0[999]) / 6.0, rtol=5e-2)


def test_min_snr_weight(sched):
    t = jnp.asarray([0, 500, 999])
    snr = compute_snr(sched, t)
    w = min_snr_weight(sched, t, gamma=5.0)
    want = np.minimum(np.asarray(snr), 5.0) / np.asarray(snr)
    np.testing.assert_allclose(np.asarray(w), want, rtol=1e-6)
    assert float(w[0]) < 1.0  # high-SNR early timesteps get down-weighted
    assert float(w[2]) == 1.0  # low-SNR late timesteps untouched


def test_add_noise_and_velocity_match_torch(sched):
    _, ac = torch_schedule()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    n = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([10, 900])

    sa = ac[t].sqrt().float().numpy().reshape(-1, 1, 1, 1)
    so = (1 - ac[t]).sqrt().float().numpy().reshape(-1, 1, 1, 1)
    want_noisy = sa * x + so * n
    want_v = sa * n - so * x

    got_noisy = add_noise(sched, jnp.asarray(x), jnp.asarray(n), jnp.asarray(t))
    got_v = get_velocity(sched, jnp.asarray(x), jnp.asarray(n), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got_noisy), want_noisy, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), want_v, rtol=1e-4, atol=1e-5)


def test_pred_original_sample_inverts_velocity(sched):
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 8, 8)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((2, 4, 8, 8)).astype(np.float32))
    t = jnp.asarray([100, 800])
    xt = add_noise(sched, x0, n, t)
    v = get_velocity(sched, x0, n, t)
    x0_hat = pred_original_sample(sched, v, xt, t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_inference_timesteps_leading(sched):
    ts = inference_timesteps(sched, 20)
    assert ts.shape == (20,)
    assert ts[0] == 951 and ts[-1] == 1  # leading spacing + steps_offset 1
    assert np.all(np.diff(ts) == -50)


def test_ddim_denoises_toward_x0(sched):
    """With a perfect v-prediction oracle, DDIM recovers x0 from pure noise."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 4, 8, 8)) * 0.5
    steps = inference_timesteps(sched, 20)
    lat = jax.random.normal(jax.random.PRNGKey(1), x0.shape)

    for t in steps:
        t = jnp.asarray(t)
        eps = pred_eps_from_state(sched, lat, x0, t)
        sa = jnp.sqrt(sched.alphas_cumprod[t])
        so = jnp.sqrt(1 - sched.alphas_cumprod[t])
        v = sa * eps - so * x0
        lat = ddim_step(sched, v, t, lat, num_inference_steps=20)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x0), atol=1e-3)


def pred_eps_from_state(sched, xt, x0, t):
    sa = jnp.sqrt(sched.alphas_cumprod[t])
    so = jnp.sqrt(1 - sched.alphas_cumprod[t])
    return (xt - sa * x0) / so


def test_ddpm_step_runs_and_reduces_noise(sched):
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 4, 8, 8))
    steps = inference_timesteps(sched, 20)
    lat = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    for i, t in enumerate(steps):
        t = jnp.asarray(t)
        eps = pred_eps_from_state(sched, lat, x0, t)
        sa = jnp.sqrt(sched.alphas_cumprod[t])
        so = jnp.sqrt(1 - sched.alphas_cumprod[t])
        v = sa * eps - so * x0
        lat = ddpm_step(sched, v, t, lat, jax.random.fold_in(key, i), 20)
    assert float(jnp.abs(lat).mean()) < 0.2
