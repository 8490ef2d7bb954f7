"""Full-scale train-step timing on one TPU chip.

Mirrors the measured-facts config (CLAUDE.md): SD2.1 MultiViewUNet, batch 2
pairs at 512², remat on, bf16 compute, adapters+camera-encoder trainable
(~119M params). Host-transfer barrier (axon-safe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dataclasses

    from mvd_tpu.config import LossConfig, ModelConfig, OptimizerConfig, TrainConfig, UNetConfig
    from mvd_tpu.pipeline import MVDPipeline
    from mvd_tpu.train import TrainState, make_optimizer, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    remat = os.environ.get("MVD_BENCH_REMAT", "1") != "0"
    if on_tpu:
        model_cfg = ModelConfig(
            unet=UNetConfig(remat=remat, attention_impl="auto"), dtype="bfloat16"
        )
        # MVD_BENCH_RES=768 measures the reference's training resolution
        # (train_config.yaml image_size: 768); MVD_BENCH_BATCH sizes per-chip
        # batch (v5e-1 has 16 GB HBM vs the reference's 80 GB A100s).
        B = int(os.environ.get("MVD_BENCH_BATCH", "2"))
        res = int(os.environ.get("MVD_BENCH_RES", "512"))
    else:
        from mvd_tpu.config import TINY_MODEL

        model_cfg = TINY_MODEL
        B, res = 2, TINY_MODEL.unet.sample_size * 8

    model_cfg = dataclasses.replace(
        model_cfg, unet=dataclasses.replace(model_cfg.unet, sample_size=res // 8)
    )
    print("init...", file=sys.stderr, flush=True)
    pipe = MVDPipeline.create(model_cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(pipe.params)

    cfg = TrainConfig(
        model=model_cfg, loss=LossConfig(), optimizer=OptimizerConfig(),
        batch_size=B, num_views=1, image_size=res,
    )
    tx = make_optimizer(cfg.optimizer, pipe.params["mvd"], total_steps=1000)
    state = TrainState.create(pipe.params["mvd"], tx)
    frozen = {"vae": pipe.params["vae"], "text_encoder": pipe.params["text_encoder"]}
    step_fn = make_train_step(pipe, pipe.schedule, cfg)

    rng = np.random.default_rng(0)
    # MVD_BENCH_LATENT_CACHE=1 feeds precomputed posterior moments instead
    # of pixels (cli/precompute_latents.py corpus cache) — the encoder-free
    # train step (data/latent_cache.py).
    latent_cache = os.environ.get("MVD_BENCH_LATENT_CACHE", "0") == "1"
    lat = res // 8
    batch = {
        "source_camera": jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1, 1)),
        "target_camera": jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1, 1)),
        "input_ids": jnp.ones((B, 1, 77), jnp.int32),
    }
    if latent_cache:
        batch["source_moments"] = jnp.asarray(
            rng.standard_normal((B, 1, 2, lat, lat, 4)), jnp.float32
        )
        batch["target_moments"] = jnp.asarray(
            rng.standard_normal((B, 1, 2, lat, lat, 4)), jnp.float32
        )
    else:
        batch["source_image"] = jnp.asarray(
            rng.uniform(-1, 1, (B, 1, res, res, 3)), jnp.float32
        )
        batch["target_image"] = jnp.asarray(
            rng.uniform(-1, 1, (B, 1, res, res, 3)), jnp.float32
        )
    print("compile...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(1))
    print(
        f"first step (compile) {time.perf_counter() - t0:.1f}s "
        f"loss={float(metrics['noise_loss']):.4f}",
        file=sys.stderr, flush=True,
    )

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(i + 2))
    _ = float(metrics["noise_loss"])  # host barrier
    dt = (time.perf_counter() - t0) / iters
    print(
        f"train step: {dt * 1e3:.1f} ms/step  ({B / dt:.2f} samples/sec/chip)  "
        f"batch {B} pairs @ {res}^2, remat={'on' if remat else 'OFF'}, "
        f"latent_cache={'on' if latent_cache else 'off'}, "
        f"backend={jax.default_backend()}"
    )


if __name__ == "__main__":
    main()
