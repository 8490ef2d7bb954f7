"""Inference batch-scaling: img/sec at 4/8/16-view batches, one chip.

The north-star metric is aggregate v5e-8 throughput; batch scaling is the
lever that amortizes the fixed per-call costs (the ~30 ms axon dispatch
latency per host sync, the CLIP text encode, the conditioning prep) over
more images. bench.py pins the canonical 4-view number; this reports the
scaling curve (VERDICT r2 'next' #9).

Run on a TPU host from the repo root:
    python benchmarks/batch_scaling.py [--res 512] [--steps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--views", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvd_tpu.camera import orbit_cameras
    from mvd_tpu.config import ModelConfig, UNetConfig
    from mvd_tpu.pipeline import MVDPipeline

    cfg = ModelConfig(
        unet=UNetConfig(remat=False, attention_impl="auto"), dtype="bfloat16"
    )
    res = args.res

    print("init params...", file=sys.stderr, flush=True)
    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(pipe.params)

    src = jax.device_put(np.zeros((1, res, res, 3), np.float32))

    def sync(x):
        return float(jnp.sum(x))  # host transfer = completion barrier (axon)

    rows = []
    for V in args.views:
        cams = orbit_cameras(V)
        kwargs = dict(
            num_inference_steps=args.steps,
            guidance_scale=1.0,
            height=res,
            width=res,
            source_camera=np.tile(cams[:1], (V, 1, 1)),
            target_camera=cams,
            source_images=src,
            ref_scale=1.0,
        )
        prompts = ["a 3d object"] * V
        t0 = time.perf_counter()
        out = pipe(prompts, seed=0, output_type="jnp", **kwargs)
        sync(out["images"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.runs):
            out = pipe(prompts, seed=i + 1, output_type="jnp", **kwargs)
            sync(out["images"])
        dt = (time.perf_counter() - t0) / args.runs
        row = {
            "views": V,
            "img_per_sec": round(V / dt, 4),
            "sec_per_batch": round(dt, 4),
            "first_call_sec": round(compile_s, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"res": res, "steps": args.steps, "scaling": rows}))


if __name__ == "__main__":
    main()
