"""Camera math as pure JAX functions.

Rebuild of the reference's camera utilities:
  * relative source->target transform (reference src/models/camera_encoder.py:
    107-120),
  * NeRF-style positional encoding of translations (camera_encoder.py:137-158
    — with one deliberate deviation: the reference resamples a random Gaussian
    projection matrix on EVERY call, which is nondeterministic by
    construction; here the projection matrix is a proper parameter created at
    init from a PRNG key, which is the correct functional-JAX answer and is
    documented as a deviation for parity),
  * look-at camera construction (reference src/utils.py:51-85).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def relative_transform(source_camera: jnp.ndarray, target_camera: jnp.ndarray):
    """R_rel = R_t @ R_s^T,  T_rel = T_t - R_rel @ T_s.

    Accepts [..., 4, 4] or [..., 3, 4] camera-to-world matrices; returns
    (R [..., 3, 3], T [..., 3]).
    """
    sR = source_camera[..., :3, :3]
    sT = source_camera[..., :3, 3]
    tR = target_camera[..., :3, :3]
    tT = target_camera[..., :3, 3]
    rel_R = tR @ jnp.swapaxes(sR, -1, -2)
    rel_T = tT - jnp.einsum("...ij,...j->...i", rel_R, sT)
    return rel_R, rel_T


def positional_encoding_freqs(pos_enc_dim: int, max_freq: float = 10.0) -> jnp.ndarray:
    """Log-spaced frequencies exp(linspace(0, log(max_freq), D))."""
    return jnp.exp(jnp.linspace(0.0, float(np.log(max_freq)), pos_enc_dim))


def positional_encoding(
    x: jnp.ndarray, pos_enc_dim: int, max_freq: float = 10.0
) -> jnp.ndarray:
    """sin/cos encoding of each coordinate at log-spaced frequencies.

    x: [B, D_in] -> [B, D_in * 2 * pos_enc_dim] (sin||cos per coordinate,
    matching the reference's concat-then-flatten layout,
    camera_encoder.py:144-151).
    """
    freqs = positional_encoding_freqs(pos_enc_dim, max_freq)
    angles = x[..., None] * freqs  # [B, D_in, P]
    enc = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)  # [B, D_in, 2P]
    return enc.reshape(x.shape[:-1] + (-1,))


def ray_grid(h: int, w: int, fov_deg: float = 54.43) -> jnp.ndarray:
    """Unit camera-space ray directions on an (h, w) pixel-center grid.

    Camera convention matches ``look_at_camera`` / the Blender render rig
    (reference blender_script.py:1041-1058): x right, y up, looking down -z.
    The default FOV is the rig's 35 mm lens on Blender's default 36 mm
    sensor: 2·atan(18/35) ≈ 54.43°. Returns (h, w, 3) float32.
    """
    half = float(np.tan(np.deg2rad(fov_deg) / 2.0))
    # pixel centers, y up (row 0 is the TOP of the image)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
    x, y = jnp.meshgrid(xs * half, ys * half, indexing="xy")
    d = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def ray_grid_from_intrinsics(K: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Unit camera-space rays from a pinhole intrinsics matrix.

    K: (..., 3, 3) with (fx, fy, cx, cy) in PIXELS of the (h, w) grid; the
    y-up/-z-forward convention of ``ray_grid``. Returns (..., h, w, 3).
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    u = jnp.arange(w, dtype=jnp.float32) + 0.5
    v = jnp.arange(h, dtype=jnp.float32) + 0.5
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    x = (uu - cx[..., None, None]) / fx[..., None, None]
    y = (cy[..., None, None] - vv) / fy[..., None, None]
    d = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def plucker_ray_map(
    source_camera: jnp.ndarray,
    target_camera: jnp.ndarray,
    h: int,
    w: int,
    fov_deg: float = 54.43,
) -> jnp.ndarray:
    """Per-pixel Plücker ray map of the TARGET view expressed in the SOURCE
    camera frame — the north star's intrinsics/extrinsics → ray-map
    conditioning (BASELINE.json configs[2]), computed in-jit from the camera
    tensors the batch already carries.

    For camera-to-world matrices (x_world = R x_cam + T), the target camera's
    pixel rays in the source frame are::

        d = R_sᵀ R_t · d_cam(u, v)          (unit direction)
        o = R_sᵀ (T_t − T_s)                 (ray origin)

    and the map stacks (d, o × d) — 6 channels. Invariant under any global
    rigid transform applied to BOTH cameras (tests/test_raymap.py pins
    this), so the conditioning sees only the relative geometry — the same
    invariance the FiLM camera encoder's relative transform has
    (reference camera_encoder.py:107-120). source == target gives the
    canonical grid (d = d_cam, moment = 0), which is what the source-view
    feature-extraction pass feeds.

    source_camera/target_camera: (..., 4, 4) or (..., 3, 4). Returns
    (..., h, w, 6) float32.
    """
    sR = source_camera[..., :3, :3]
    sT = source_camera[..., :3, 3]
    tR = target_camera[..., :3, :3]
    tT = target_camera[..., :3, 3]
    rel_R = jnp.swapaxes(sR, -1, -2) @ tR  # R_sᵀ R_t: target cam -> source frame
    o = jnp.einsum("...ji,...j->...i", sR, tT - sT)  # R_sᵀ (T_t - T_s)
    d_cam = ray_grid(h, w, fov_deg)  # (h, w, 3)
    d = jnp.einsum("...ij,hwj->...hwi", rel_R, d_cam)
    o = jnp.broadcast_to(o[..., None, None, :], d.shape)
    m = jnp.cross(o, d)
    return jnp.concatenate([d, m], axis=-1).astype(jnp.float32)


def look_at_camera(
    position, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)
) -> np.ndarray:
    """3x4 camera-to-world [R|t] with columns (right, up, -forward) and the
    camera position as translation (reference src/utils.py:51-85). Host-side
    numpy — used by the infer CLI to build fixed viewpoints."""
    position = np.asarray(position, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)

    forward = target - position
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, up)
    right = right / np.linalg.norm(right)
    cam_up = np.cross(right, forward)

    mat = np.zeros((3, 4), dtype=np.float32)
    mat[:, 0] = right
    mat[:, 1] = cam_up
    mat[:, 2] = -forward
    mat[:, 3] = position
    return mat


def to_homogeneous(cam: np.ndarray) -> np.ndarray:
    """[3,4] -> [4,4] with a (0,0,0,1) bottom row."""
    if cam.shape[-2:] == (4, 4):
        return cam
    bottom = np.zeros(cam.shape[:-2] + (1, 4), dtype=cam.dtype)
    bottom[..., 0, 3] = 1.0
    return np.concatenate([cam, bottom], axis=-2)


def orbit_cameras(
    num_views: int,
    radius: float = 1.8,
    elevation_deg: float = 20.0,
    start_azimuth_deg: float = 0.0,
) -> np.ndarray:
    """Ring of ``num_views`` look-at cameras around the origin, mirroring the
    Blender render rig's fixed elevation/azimuth rings
    (reference src/data/rendering/blender_script.py:1041-1058)."""
    elev = np.deg2rad(elevation_deg)
    cams = []
    for i in range(num_views):
        az = np.deg2rad(start_azimuth_deg + 360.0 * i / num_views)
        pos = (
            radius * np.cos(elev) * np.cos(az),
            radius * np.cos(elev) * np.sin(az),
            radius * np.sin(elev),
        )
        cams.append(to_homogeneous(look_at_camera(pos)))
    return np.stack(cams)
