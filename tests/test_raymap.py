"""Ray-map conditioning (BASELINE config 3): grid geometry, rigid-transform
invariance, output-preserving injection, and a view-sharded train step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvd_tpu.camera import (
    orbit_cameras,
    plucker_ray_map,
    ray_grid,
    ray_grid_from_intrinsics,
)
from mvd_tpu.config import TINY_MODEL


def test_ray_grid_geometry():
    h, w, fov = 6, 8, 60.0
    d = np.asarray(ray_grid(h, w, fov))
    assert d.shape == (h, w, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    assert np.all(d[..., 2] < 0)  # looking down -z
    assert np.all(d[0, :, 1] > 0) and np.all(d[-1, :, 1] < 0)  # y up at top
    assert np.all(d[:, 0, 0] < 0) and np.all(d[:, -1, 0] > 0)  # x right
    # edge pixel-center tangent matches the FOV
    half = np.tan(np.deg2rad(fov) / 2)
    edge = d[0, -1]
    np.testing.assert_allclose(-edge[0] / edge[2], half * (1 - 1 / w), rtol=1e-5)


def test_ray_grid_from_intrinsics_matches_fov_grid():
    h, w, fov = 8, 8, 54.43
    half = np.tan(np.deg2rad(fov) / 2)
    f = (w / 2.0) / half
    K = jnp.asarray([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(ray_grid_from_intrinsics(K, h, w)),
        np.asarray(ray_grid(h, w, fov)),
        atol=1e-6,
    )


def test_plucker_identity_is_canonical_grid():
    cams = jnp.asarray(orbit_cameras(3))
    rm = np.asarray(plucker_ray_map(cams, cams, 8, 8))
    assert rm.shape == (3, 8, 8, 6)
    grid = np.asarray(ray_grid(8, 8))
    for b in range(3):
        np.testing.assert_allclose(rm[b, ..., :3], grid, atol=1e-5)
        np.testing.assert_allclose(rm[b, ..., 3:], 0.0, atol=1e-5)


def _random_rigid(key):
    m = jax.random.normal(key, (3, 3))
    q, r = jnp.linalg.qr(m)
    q = q * jnp.sign(jnp.diag(r))  # proper-ish rotation (det +/-1 -> fix)
    q = q * jnp.linalg.det(q)  # ensure det=+1
    t = jax.random.normal(jax.random.fold_in(key, 1), (3,))
    M = jnp.eye(4).at[:3, :3].set(q).at[:3, 3].set(t)
    return M


def test_plucker_invariant_under_global_rigid_transform():
    """Applying one rigid transform to BOTH cameras must not change the map
    (only relative geometry conditions the model — same invariance as the
    FiLM relative transform, reference camera_encoder.py:107-120)."""
    cams = jnp.asarray(orbit_cameras(4))
    src, tgt = cams[:2], cams[2:]
    want = np.asarray(plucker_ray_map(src, tgt, 6, 6))
    M = _random_rigid(jax.random.PRNGKey(7))
    got = np.asarray(plucker_ray_map(M @ src, M @ tgt, 6, 6))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_plucker_changes_with_relative_pose():
    cams = jnp.asarray(orbit_cameras(4))
    a = np.asarray(plucker_ray_map(cams[:1], cams[1:2], 6, 6))
    b = np.asarray(plucker_ray_map(cams[:1], cams[2:3], 6, 6))
    assert np.abs(a - b).max() > 1e-2


def test_zero_pad_conv_in():
    from mvd_tpu.checkpoint import zero_pad_conv_in

    k = np.random.default_rng(0).normal(size=(3, 3, 4, 8)).astype(np.float32)
    tree = {"conv_in": {"kernel": k, "bias": np.zeros(8, np.float32)}}
    out = zero_pad_conv_in(tree, 6)
    assert out["conv_in"]["kernel"].shape == (3, 3, 10, 8)
    np.testing.assert_array_equal(out["conv_in"]["kernel"][:, :, :4], k)
    np.testing.assert_array_equal(out["conv_in"]["kernel"][:, :, 4:], 0.0)
    # input tree untouched
    assert tree["conv_in"]["kernel"].shape == (3, 3, 4, 8)


def _set_conv_in_kernel(params, kernel):
    p = jax.tree_util.tree_map(lambda x: x, params)  # deep-ish copy
    p = {**p, "params": {**p["params"]}}
    p["params"]["unet"] = {**p["params"]["unet"]}
    p["params"]["unet"]["conv_in"] = {
        **p["params"]["unet"]["conv_in"], "kernel": kernel
    }
    return p


def test_ray_conditioning_zero_init_preserves_output():
    """Rays-on model with zeroed extra conv_in rows == rays-off model: the
    injection is purely additive (what makes zero_pad_conv_in's pretrained
    warm start output-preserving)."""
    from mvd_tpu.nn import MultiViewUNet

    cfg_off = TINY_MODEL
    cfg_on = dataclasses.replace(TINY_MODEL, use_ray_conditioning=True)
    hw = TINY_MODEL.unet.sample_size
    B = 2
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.normal(size=(B, hw, hw, 4)), jnp.float32)
    ctx = jnp.asarray(
        rng.normal(size=(B, 77, TINY_MODEL.unet.cross_attention_dim)), jnp.float32
    )
    cams = jnp.asarray(orbit_cameras(2 * B), jnp.float32)
    src_cam, tgt_cam = cams[:B], cams[B:]
    src_lat = jnp.asarray(rng.normal(size=(B, hw, hw, 4)), jnp.float32)
    t = jnp.asarray(500, jnp.int32)

    model_on = MultiViewUNet(cfg_on)
    kwargs = dict(
        source_camera=src_cam, target_camera=tgt_cam,
        source_image_latents=src_lat,
    )
    params_on = model_on.init(jax.random.PRNGKey(0), sample, t, ctx, **kwargs)
    k_on = params_on["params"]["unet"]["conv_in"]["kernel"]
    assert k_on.shape[2] == 10  # 4 latents + 6 ray channels
    params_on = _set_conv_in_kernel(params_on, k_on.at[:, :, 4:, :].set(0.0))

    model_off = MultiViewUNet(cfg_off)
    params_off = _set_conv_in_kernel(params_on, k_on[:, :, :4, :])
    out_on = model_on.apply(params_on, sample, t, ctx, **kwargs)
    out_off = model_off.apply(params_off, sample, t, ctx, **kwargs)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), atol=2e-6
    )
    # and with NON-zero ray rows, the output actually responds to the rays
    params_live = _set_conv_in_kernel(
        params_on, k_on.at[:, :, 4:, :].set(0.05)
    )
    out_live = model_on.apply(params_live, sample, t, ctx, **kwargs)
    assert np.abs(np.asarray(out_live) - np.asarray(out_on)).max() > 1e-5


def test_infer_cli_with_rays(tmp_path):
    """--use-ray-conditioning samples end-to-end through the jitted pipeline
    (ray map riding the film dict through the denoise scan + CFG tiling)."""
    import os

    from mvd_tpu.cli.infer import main

    out = str(tmp_path / "inf")
    main([
        "--tiny", "--use-ray-conditioning", "--num-images", "1",
        "--num-steps", "2", "--output-dir", out, "--prompt", "a chair",
    ])
    assert os.path.exists(os.path.join(out, "generated_00.png"))


@pytest.mark.slow
def test_ray_conditioning_view_sharded_train_step():
    """--use-ray-conditioning trains under view sharding (VERDICT r2 #4
    'done' criterion): one finite train step on the 8-device CPU mesh with
    the ray map riding the film dict through shard_map."""
    from mvd_tpu.config import LossConfig, OptimizerConfig, TrainConfig
    from mvd_tpu.mesh import make_mesh
    from mvd_tpu.parallel import for_view_sharding
    from mvd_tpu.pipeline import MVDPipeline
    from mvd_tpu.train import TrainState, make_optimizer, make_train_step

    num_views, view_devices = 2, 2
    mesh = make_mesh(data=4, view=view_devices)
    model_cfg = for_view_sharding(
        dataclasses.replace(TINY_MODEL, use_ray_conditioning=True),
        num_views=num_views, view_devices=view_devices,
    )
    pipe = MVDPipeline.create(model_cfg, jax.random.PRNGKey(0))
    cfg = TrainConfig(
        model=model_cfg, loss=LossConfig(), optimizer=OptimizerConfig(),
        batch_size=4, num_views=num_views,
    )
    tx = make_optimizer(cfg.optimizer, pipe.params["mvd"], total_steps=10)
    state = TrainState.create(pipe.params["mvd"], tx)
    frozen = {"vae": pipe.params["vae"], "text_encoder": pipe.params["text_encoder"]}
    step_fn = make_train_step(pipe, pipe.schedule, cfg, mesh=mesh, view_sharded=True)

    B, V = 4, num_views
    hw = model_cfg.unet.sample_size * 8
    rng = np.random.default_rng(0)
    cams = orbit_cameras(2 * V).astype(np.float32)
    batch = {
        "source_image": jnp.asarray(rng.uniform(-1, 1, (B, V, hw, hw, 3)), jnp.float32),
        "target_image": jnp.asarray(rng.uniform(-1, 1, (B, V, hw, hw, 3)), jnp.float32),
        "source_camera": jnp.tile(jnp.asarray(cams[:V])[None], (B, 1, 1, 1)),
        "target_camera": jnp.tile(jnp.asarray(cams[V:])[None], (B, 1, 1, 1)),
        "input_ids": jnp.ones((B, V, 77), jnp.int32),
    }
    state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["noise_loss"]))
    assert np.isfinite(float(metrics["grad_norm/total"]))
