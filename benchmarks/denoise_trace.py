"""Capture a jax.profiler trace of the full-scale denoise step and print the
top device ops, aggregated by kind — tells us exactly where the 85 ms goes
(conv vs attention vs fusions vs copies)."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mvd_tpu.camera import orbit_cameras
    from mvd_tpu.config import ModelConfig, UNetConfig
    from mvd_tpu.pipeline import MVDPipeline

    NUM_VIEWS = int(os.environ.get("MVD_TRACE_VIEWS", "4"))
    RES = int(os.environ.get("MVD_TRACE_RES", "512"))
    hw = RES // 8
    cfg = ModelConfig(
        unet=UNetConfig(remat=False, attention_impl="auto"), dtype="bfloat16"
    )
    print("init...", file=sys.stderr, flush=True)
    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(pipe.params)
    B = NUM_VIEWS

    ids = jnp.ones((B, 77), jnp.int32)
    lat = jnp.zeros((B, hw, hw, 4), jnp.float32)
    cams = jnp.asarray(np.tile(orbit_cameras(NUM_VIEWS), (1, 1, 1)), jnp.float32)
    text = jax.jit(lambda p, i: pipe.text_encoder.apply(p, i))(
        pipe.params["text_encoder"], ids
    )
    prep = jax.jit(
        lambda p, t, sc, tc, sl: pipe.mvd_unet.apply(
            p, t, sc, tc, sl, precompute_kv=True,
            method=pipe.mvd_unet.prepare_conditioning,
        )
    )
    mvd_params = pipe.compute_params["mvd"]  # the sampling path's pre-cast tree
    film, ref = prep(mvd_params, text, cams, cams, lat)

    den = jax.jit(
        lambda p, s, t, e, f, r: pipe.mvd_unet.apply(
            p, s, t, e, f, r, jnp.float32(1.0), method=pipe.mvd_unet.denoise
        )
    )
    out = den(mvd_params, lat, jnp.asarray(500), text, film, ref)
    float(jnp.sum(out))
    print("tracing...", file=sys.stderr, flush=True)

    trace_dir = "/tmp/denoise_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = den(mvd_params, lat, jnp.asarray(500), text, film, ref)
            float(jnp.sum(out))

    traces = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find the device (TPU) process/threads: device op events carry "dur"
    # and names like "fusion.123", "convolution.5" etc.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    agg_n = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if not dev_pids and not any(
            k in name for k in ("fusion", "convolution", "dot", "copy", "custom",
                                "reduce", "transpose", "scatter", "gather", "all-")
        ):
            continue
        kind = name.split(".")[0].rstrip("0123456789")
        agg[kind] += e["dur"]
        agg_n[kind] += 1
        total += e["dur"]
    print(f"\nprocesses: {pid_names}")
    print(f"total device-op time over 3 steps: {total / 1e3:.2f} ms")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{k:32s} {v / 3e3:8.2f} ms/step  x{agg_n[k] // 3}")

    # top individual ops
    ops = defaultdict(float)
    op_args = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e and (not dev_pids or e.get("pid") in dev_pids):
            name = e.get("name", "")
            ops[name] += e["dur"]
            if name not in op_args and e.get("args"):
                op_args[name] = e["args"]
    print("\ntop 25 ops:")
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{k[:70]:70s} {v / 3e3:8.3f} ms/step")

    print("\ntop 15 copy/convert events (with args):")
    shown = 0
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1]):
        if not any(s in k for s in ("copy", "convert", "transpose", "bitcast")):
            continue
        a = op_args.get(k, {})
        detail = a.get("long_name") or a.get("tf_op") or a.get("shape") or str(a)[:160]
        print(f"{k[:40]:40s} {v / 3e3:7.3f} ms/step  {str(detail)[:120]}")
        shown += 1
        if shown >= 15:
            break


if __name__ == "__main__":
    main()
