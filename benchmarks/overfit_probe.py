"""Full-scale on-chip training-convergence probe.

Trains the REAL SD2.1-width MultiViewUNet (adapters + camera encoder
trainable, ~119M params) on ONE fixed latent-cache batch with fresh
noise/timesteps every step. If the optimizer masking, Min-SNR weighting,
schedule arithmetic, and gradient flow are all correct at full scale, the
noise loss must fall well below its step-0 value; tiny-model convergence is
covered in tests/, but this is the only check that exercises the full-width
trainable partition on the chip itself.

Default: 512², batch 2, latent-cache path (the fast encoder-free step),
remat on — ~177 ms/step wall incl. the per-step host sync, so 300 steps is
~1 min of stepping on top of the ~6-7 min init+compile. Prints the loss
every 25 steps and a PASS/FAIL verdict (final 50-step mean < 0.5x the
first-10-step mean). Earlier probe variants fed pure-Gaussian "latents":
those are unlearnable by a frozen UNet + adapters and plateau at ~0.26
noise loss at either lr 1e-5 or 1e-4 — the smooth deterministic targets
below are what make convergence-vs-stall unambiguous.

Reference behavior being evidenced: the reference trains this exact
partition (frozen base UNet, trainable adapters/camera encoder —
/root/reference/src/training/training.py:53-93) and its only convergence
evidence is watching train/noise_loss fall in W&B.

    MVD_PROBE_STEPS=300 python benchmarks/overfit_probe.py
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
    steps = int(os.environ.get("MVD_PROBE_STEPS", "300"))
    if on_tpu:
        model_cfg = ModelConfig(
            unet=UNetConfig(remat=True, attention_impl="auto"), dtype="bfloat16"
        )
        B, res = 2, 512
    else:
        from mvd_tpu.config import TINY_MODEL

        model_cfg = TINY_MODEL
        B, res = 2, TINY_MODEL.unet.sample_size * 8
        steps = min(steps, 60)

    model_cfg = dataclasses.replace(
        model_cfg, unet=dataclasses.replace(model_cfg.unet, sample_size=res // 8)
    )
    print("init...", file=sys.stderr, flush=True)
    pipe = MVDPipeline.create(model_cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(pipe.params)

    # Probe lr: the reference's 1e-5 is sized for 100k-step corpus training;
    # at 300 steps it only moves the loss ~30%. 1e-4 makes the pass/fail
    # verdict decisive while still testing the same masked-AdamW + cosine
    # path (MVD_PROBE_LR=1e-5 reproduces the reference-default trajectory).
    lr = float(os.environ.get("MVD_PROBE_LR", "1e-4"))
    cfg = TrainConfig(
        model=model_cfg, loss=LossConfig(),
        optimizer=OptimizerConfig(learning_rate=lr),
        batch_size=B, num_views=1, image_size=res,
    )
    tx = make_optimizer(cfg.optimizer, pipe.params["mvd"], total_steps=max(steps, 1000))
    state = TrainState.create(pipe.params["mvd"], tx)
    frozen = {"vae": pipe.params["vae"], "text_encoder": pipe.params["text_encoder"]}
    step_fn = make_train_step(pipe, pipe.schedule, cfg)

    lat = res // 8
    # One FIXED batch of SMOOTH, near-deterministic latents at a realistic
    # scale (raw SD latents have std ≈ 1/scaling_factor before the sf
    # multiply). Pure-noise targets are unlearnable by a frozen UNet +
    # adapters and plateau the probe at ~0.26; smooth distinct patterns per
    # (sample, channel) make convergence-vs-stall unambiguous.
    amp = 1.0 / cfg.model.vae.scaling_factor
    ys, xs = np.meshgrid(
        np.linspace(0, 2 * np.pi, lat, dtype=np.float32),
        np.linspace(0, 2 * np.pi, lat, dtype=np.float32),
        indexing="ij",
    )

    def moments(offset: float) -> jnp.ndarray:
        mean = np.stack(
            [
                np.stack(
                    [
                        np.sin((b + 1) * ys + c + offset)
                        * np.cos((c + 1) * xs + b + offset)
                        for c in range(4)
                    ],
                    axis=-1,
                )
                for b in range(B)
            ]
        )  # (B, lat, lat, 4)
        mean = amp * mean / max(mean.std(), 1e-6)
        logvar = np.full_like(mean, -12.0)  # σ ≈ 0.0025: deterministic x₀
        return jnp.asarray(np.stack([mean, logvar], axis=1)[:, None], jnp.float32)

    batch = {
        "source_camera": jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1, 1)),
        "target_camera": jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1, 1)),
        "input_ids": jnp.ones((B, 1, 77), jnp.int32),
        "source_moments": moments(0.0),
        "target_moments": moments(1.3),
    }

    print("compile...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(1))
    first = float(metrics["noise_loss"])
    print(f"first step (compile) {time.perf_counter() - t0:.1f}s loss={first:.4f}",
          file=sys.stderr, flush=True)

    # Per-step host sync costs a tunnel round-trip (~30 ms) but the per-step
    # loss is noisy across sampled timesteps, so the verdict needs every value.
    losses = [first]
    t0 = time.perf_counter()
    for i in range(1, steps):
        state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(i + 1))
        losses.append(float(metrics["noise_loss"]))
        if i % 25 == 0 or i == steps - 1:
            print(f"step {i:4d}  noise_loss={losses[-1]:.4f}  "
                  f"(25-step mean {np.mean(losses[-25:]):.4f})", flush=True)
    dt = (time.perf_counter() - t0) / max(steps - 1, 1)

    # Head anchors near step 0 (the first window also captures fast early
    # learning, which would dilute the baseline); tail averages wide because
    # per-step loss varies a lot across sampled timesteps.
    head = float(np.mean(losses[: min(10, len(losses))]))
    w = min(50, max(len(losses) // 4, 1))
    tail = float(np.mean(losses[-w:]))
    ok = tail < 0.5 * head
    print(
        f"overfit probe: loss {head:.4f} -> {tail:.4f} over {steps} steps "
        f"({dt * 1e3:.1f} ms/step, backend={jax.default_backend()}) "
        f"[{'PASS' if ok else 'FAIL'}: final<0.5x first]"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
