"""A/B bench: exact sampling vs the opt-in fast-sampling modes.

Full-scale SD2.1 4-view 512², one chip. Reports img/sec for
encoder_reuse in {1, 2, 3} (20-step DDPM; "Faster Diffusion", arXiv
2312.09608) plus DPM-Solver++(2M) at 10 steps (arXiv 2211.01095 — ~half
the UNet evaluations at matched quality), with the pixel-space delta of
each mode vs the exact 20-step trajectory (same seed). See
docs/PERFORMANCE.md, tests/test_encoder_reuse.py, tests/test_dpm_solver.py.
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
    from mvd_tpu.utils.backend import require_backend

    on_tpu = require_backend()  # bounded probe: tunnel-down init can hang
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

    # (label, pipeline-call overrides); first entry is the exact baseline
    modes = [
        ("encoder_reuse=1", {"encoder_reuse": 1}),
        ("encoder_reuse=2", {"encoder_reuse": 2}),
        ("encoder_reuse=3", {"encoder_reuse": 3}),
        ("dpmpp_2m@10steps", {"sampler": "dpmpp_2m", "num_inference_steps": 10}),
        ("dpmpp_2m@10steps+reuse2", {"sampler": "dpmpp_2m",
                                     "num_inference_steps": 10,
                                     "encoder_reuse": 2}),
    ]
    results = {}
    ref_img = None
    for label, over in modes:
        print(f"compile {label}...", file=sys.stderr, flush=True)
        kw = {**kwargs, **over}
        out = pipe(prompts, seed=0, output_type="jnp", **kw)
        sync(out["images"])
        img0 = np.asarray(out["images"])
        if ref_img is None:
            ref_img = img0
        n = 3
        t0 = time.perf_counter()
        for i in range(n):
            out = pipe(prompts, seed=i + 1, output_type="jnp", **kw)
            sync(out["images"])
        dt = time.perf_counter() - t0
        mae = float(np.abs(img0 - ref_img).mean())
        results[label] = {
            "img_per_sec": round(n * NUM_VIEWS / dt, 4),
            "sec_per_batch": round(dt / n, 4),
            "mean_abs_pixel_delta_vs_exact": round(mae, 6),
        }
        print(json.dumps({label: results[label]}), flush=True)

    print(json.dumps({"backend": jax.default_backend(), "results": results}))


if __name__ == "__main__":
    main()
