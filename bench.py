"""Benchmark: 4-view 512² SD2.1 multi-view generation throughput, one chip.

Runs the full jitted pipeline (CLIP text encode -> conditioning prep with
the frozen feature-extractor UNet -> 20-step DDPM scan with camera FiLM +
image cross-attention adapters -> VAE decode) at full SD2.1 scale in
bfloat16 and reports images/sec with ``block_until_ready`` timing — the
TPU equivalent of the reference's val.py perf_counter harness
(reference val.py:331-347).

Baseline: the reference publishes no numbers (BASELINE.md). The comparison
constant below is an engineering estimate of the torch reference on one
A100: SD2.1 UNet at 512² is ~0.7 TFLOP/pass; the reference runs TWO UNet
passes per step (frozen feature extractor re-run every step,
mvd_unet.py:269-316) in fp32/TF32 under diffusers' eager loop — measured
SD2.x numbers on A100 put that at ~2 UNet-its/sec for batch 4, i.e. ~20
steps x 2 passes -> ~4 s per 4-image batch ≈ 1.0 img/sec. The north-star
target is 5x A100 on 8 chips = 0.625 img/sec/chip; vs_baseline reports our
single-chip img/sec against the 1.0 img/sec A100 estimate (so 0.625 ≈
on-track for the 8-chip target).
"""

import json
import sys
import time

A100_IMG_PER_SEC_EST = 1.0  # see module docstring
NUM_STEPS = 20
NUM_VIEWS = 4
RES = 512


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvd_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from mvd_tpu.utils.backend import require_backend

    # Bounded probe: the axon tunnel can make TPU backend init raise OR hang.
    on_tpu = require_backend()
    if not on_tpu:
        print("bench: TPU backend unusable (probe failed); CPU fallback", file=sys.stderr)

    import dataclasses

    from mvd_tpu.camera import orbit_cameras
    from mvd_tpu.config import TINY_MODEL, ModelConfig, UNetConfig
    from mvd_tpu.pipeline import MVDPipeline

    if on_tpu:
        cfg = ModelConfig(
            unet=UNetConfig(remat=False, attention_impl="auto"),
            dtype="bfloat16",
        )
        res = RES
    else:  # smoke fallback so the bench always emits a line
        cfg = TINY_MODEL
        res = TINY_MODEL.unet.sample_size * 8

    print("bench: initializing params...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(pipe.params)
    init_s = time.perf_counter() - t0
    print(f"bench: init done in {init_s:.1f}s; compiling pipeline...", file=sys.stderr, flush=True)

    cams = orbit_cameras(NUM_VIEWS)
    # call-invariant: upload once (a 12.6MB host->device transfer per call
    # costs a tunnel round-trip; the pipeline accepts device arrays without
    # pulling them back)
    src = jax.device_put(np.zeros((1, res, res, 3), np.float32))
    kwargs = dict(
        num_inference_steps=NUM_STEPS,
        guidance_scale=1.0,
        height=res,
        width=res,
        source_camera=np.tile(cams[:1], (NUM_VIEWS, 1, 1)),
        target_camera=cams,
        source_images=src,
        ref_scale=1.0,
    )
    prompts = ["a 3d object"] * NUM_VIEWS

    def sync(x):
        # host transfer as the completion barrier: on tunneled/async device
        # backends block_until_ready can return before execution finishes
        return float(jnp.sum(x))

    t0 = time.perf_counter()
    out = pipe(prompts, seed=0, output_type="jnp", **kwargs)
    sync(out["images"])
    compile_s = time.perf_counter() - t0
    print(f"bench: first call {compile_s:.1f}s; timing...", file=sys.stderr, flush=True)

    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = pipe(prompts, seed=i + 1, output_type="jnp", **kwargs)
        sync(out["images"])
    dt = time.perf_counter() - t0

    img_per_sec = n_runs * NUM_VIEWS / dt
    steps_per_sec = n_runs * NUM_STEPS / dt

    result = {
        "metric": f"img/sec, {NUM_VIEWS}-view {res}² SD2.1 multi-view generation, "
        f"{NUM_STEPS}-step DDPM, 1 chip ({jax.default_backend()})",
        "value": round(img_per_sec, 4),
        "unit": "img/sec",
        "vs_baseline": round(img_per_sec / A100_IMG_PER_SEC_EST, 4),
        "baseline_note": (
            "baseline is an ENGINEERING ESTIMATE (~1.0 img/sec, torch "
            "reference on one A100; the reference publishes no numbers and "
            "was never run — see module docstring + BASELINE.md), not a "
            "measurement"
        ) if on_tpu else (
            "CPU SMOKE FALLBACK (TPU tunnel unusable at bench time): tiny "
            "model on host CPU — value NOT comparable to the recorded TPU "
            "numbers (see STATUS.md / docs/PERFORMANCE.md for those)"
        ),
        "detail": {
            "steps_per_sec_per_chip": round(steps_per_sec, 4),
            "sec_per_4view_batch": round(dt / n_runs, 4),
            "init_sec": round(init_s, 2),
            "first_call_sec": round(compile_s, 2),
            "backend": jax.default_backend(),
            "full_scale": on_tpu,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
