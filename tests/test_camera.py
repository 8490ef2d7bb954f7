"""Camera math parity vs an independent torch implementation of the same
relative-transform / look-at formulas (reference camera_encoder.py:107-120,
utils.py:51-85)."""

import numpy as np
import torch
import jax.numpy as jnp

from mvd_tpu.camera import (
    look_at_camera,
    orbit_cameras,
    positional_encoding,
    relative_transform,
    to_homogeneous,
)


def torch_relative(source, target):
    sR, sT = source[:, :3, :3], source[:, :3, 3]
    tR, tT = target[:, :3, :3], target[:, :3, 3]
    R = torch.bmm(tR, sR.transpose(1, 2))
    T = tT - torch.bmm(R, sT.unsqueeze(2)).squeeze(2)
    return R, T


def random_pose(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = q
    m[:3, 3] = rng.standard_normal(3)
    return m


def test_relative_transform_matches_torch():
    rng = np.random.default_rng(0)
    src = np.stack([random_pose(rng) for _ in range(4)])
    tgt = np.stack([random_pose(rng) for _ in range(4)])
    R, T = relative_transform(jnp.asarray(src), jnp.asarray(tgt))
    wR, wT = torch_relative(torch.from_numpy(src), torch.from_numpy(tgt))
    np.testing.assert_allclose(np.asarray(R), wR.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T), wT.numpy(), atol=1e-5)


def test_relative_transform_identity():
    cam = np.stack([random_pose(np.random.default_rng(1))])
    R, T = relative_transform(jnp.asarray(cam), jnp.asarray(cam))
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None], atol=1e-6)
    np.testing.assert_allclose(np.asarray(T), 0.0, atol=1e-6)


def test_positional_encoding_layout():
    """Matches the reference layout: per-coordinate [sin(f0..fP), cos(f0..fP)]
    flattened coordinate-major (camera_encoder.py:144-151)."""
    x = np.array([[0.3, -1.2, 2.0]], dtype=np.float32)
    P = 170  # (1024//2)//3, the SD2.1 config value
    enc = np.asarray(positional_encoding(jnp.asarray(x), P, max_freq=10.0))
    assert enc.shape == (1, 3 * 2 * P)
    freqs = np.exp(np.linspace(0, np.log(10.0), P))
    want_first = np.sin(x[0, 0] * freqs)
    np.testing.assert_allclose(enc[0, :P], want_first, rtol=1e-5)
    want_cos = np.cos(x[0, 0] * freqs)
    np.testing.assert_allclose(enc[0, P : 2 * P], want_cos, rtol=1e-5)


def test_look_at_camera_matches_torch_reference_form():
    pos = np.array([1.5, -0.5, 1.0])
    cam = look_at_camera(pos)
    assert cam.shape == (3, 4)
    R = cam[:, :3]
    # orthonormal rotation
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(cam[:, 3], pos, atol=1e-6)
    # third column is -forward (camera looks at origin)
    forward = -pos / np.linalg.norm(pos)
    np.testing.assert_allclose(R[:, 2], -forward, atol=1e-5)


def test_orbit_cameras():
    cams = orbit_cameras(8, radius=1.8, elevation_deg=30.0)
    assert cams.shape == (8, 4, 4)
    radii = np.linalg.norm(cams[:, :3, 3], axis=-1)
    np.testing.assert_allclose(radii, 1.8, rtol=1e-5)
    np.testing.assert_allclose(cams[:, 3], np.tile([0, 0, 0, 1], (8, 1)), atol=0)


def test_to_homogeneous():
    cam = look_at_camera([0.0, 2.0, 0.5])
    h = to_homogeneous(cam)
    assert h.shape == (4, 4)
    np.testing.assert_allclose(h[3], [0, 0, 0, 1])
