"""Capture a jax.profiler trace of the full-scale train step and print the
top device ops aggregated by kind — where do the ~185 ms/step go
(forward vs backward convs/attention/fusions, optimizer, copies)."""

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
    import dataclasses

    from mvd_tpu.config import LossConfig, ModelConfig, OptimizerConfig, TrainConfig, UNetConfig
    from mvd_tpu.pipeline import MVDPipeline
    from mvd_tpu.train import TrainState, make_optimizer, make_train_step

    B, res = 2, 512
    model_cfg = ModelConfig(
        unet=UNetConfig(remat=True, attention_impl="auto"), dtype="bfloat16"
    )
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
    batch = {
        "source_image": jnp.asarray(rng.uniform(-1, 1, (B, 1, res, res, 3)), jnp.float32),
        "target_image": jnp.asarray(rng.uniform(-1, 1, (B, 1, res, res, 3)), jnp.float32),
        "source_camera": jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1, 1)),
        "target_camera": jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1, 1)),
        "input_ids": jnp.ones((B, 1, 77), jnp.int32),
    }
    print("compile...", file=sys.stderr, flush=True)
    state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(1))
    _ = float(metrics["noise_loss"])

    print("tracing...", file=sys.stderr, flush=True)
    trace_dir = "/tmp/train_trace"
    os.system(f"rm -rf {trace_dir}")
    NIT = 3
    with jax.profiler.trace(trace_dir):
        for i in range(NIT):
            state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(i + 2))
            _ = float(metrics["noise_loss"])

    traces = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
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
    print(f"total device-op time over {NIT} steps: {total / 1e3:.2f} ms")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{k:32s} {v / NIT / 1e3:8.2f} ms/step  x{agg_n[k] // NIT}")

    ops = defaultdict(float)
    op_args = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e and (not dev_pids or e.get("pid") in dev_pids):
            name = e.get("name", "")
            ops[name] += e["dur"]
            if name not in op_args and e.get("args"):
                op_args[name] = e["args"]
    print("\ntop 30 ops:")
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{k[:70]:70s} {v / NIT / 1e3:8.3f} ms/step")

    print("\ntop 15 copy/convert events (with args):")
    shown = 0
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1]):
        if not any(s in k for s in ("copy", "convert", "transpose", "bitcast")):
            continue
        a = op_args.get(k, {})
        detail = a.get("long_name") or a.get("tf_op") or a.get("shape") or str(a)[:160]
        print(f"{k[:40]:40s} {v / NIT / 1e3:7.3f} ms/step  {str(detail)[:120]}")
        shown += 1
        if shown >= 15:
            break


if __name__ == "__main__":
    main()
