"""A/B bench: exact sampling vs encoder-propagation fast sampling.

Full-scale SD2.1 4-view 512², 20-step DDPM, one chip. Reports img/sec for
encoder_reuse in {1, 2, 3} plus the pixel-space delta of the approximation
vs the exact trajectory (same seed). See docs/PERFORMANCE.md and
tests/test_encoder_reuse.py; technique: "Faster Diffusion" (arXiv
2312.09608).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mvd_tpu.camera import orbit_cameras
from mvd_tpu.config import TINY_MODEL, ModelConfig, UNetConfig
from mvd_tpu.pipeline import MVDPipeline
from mvd_tpu.utils import enable_compilation_cache

NUM_STEPS = 20
NUM_VIEWS = 4
RES = 512


def main():
    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = ModelConfig(unet=UNetConfig(remat=False, attention_impl="auto"), dtype="bfloat16")
        res = RES
    else:
        cfg = TINY_MODEL
        res = TINY_MODEL.unet.sample_size * 8

    print("init...", file=sys.stderr, flush=True)
    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(pipe.params)

    cams = orbit_cameras(NUM_VIEWS)
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
    sync = lambda x: float(jnp.sum(x))

    results = {}
    ref_img = None
    for k in (1, 2, 3):
        print(f"compile k={k}...", file=sys.stderr, flush=True)
        out = pipe(prompts, seed=0, output_type="jnp", encoder_reuse=k, **kwargs)
        sync(out["images"])
        img0 = np.asarray(out["images"])
        if k == 1:
            ref_img = img0
        n = 3
        t0 = time.perf_counter()
        for i in range(n):
            out = pipe(prompts, seed=i + 1, output_type="jnp", encoder_reuse=k, **kwargs)
            sync(out["images"])
        dt = time.perf_counter() - t0
        mae = float(np.abs(img0 - ref_img).mean())
        results[f"encoder_reuse={k}"] = {
            "img_per_sec": round(n * NUM_VIEWS / dt, 4),
            "sec_per_batch": round(dt / n, 4),
            "mean_abs_pixel_delta_vs_exact": round(mae, 6),
        }
        print(json.dumps({f"encoder_reuse={k}": results[f"encoder_reuse={k}"]}), flush=True)

    print(json.dumps({"backend": jax.default_backend(), "results": results}))


if __name__ == "__main__":
    main()
