"""Trace the VAE decoder at 4x512² — where do its ~220 ms go?"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from mvd_tpu.config import ModelConfig
    from mvd_tpu.nn import AutoencoderKL

    cfg = ModelConfig(dtype="bfloat16")
    vae = AutoencoderKL(cfg.vae, dtype=jnp.bfloat16)
    hw = 64
    z = jnp.zeros((4, hw, hw, 4), jnp.float32)
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))
    out = dec(params, z)
    float(jnp.sum(out))
    trace_dir = "/tmp/vae_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            float(jnp.sum(dec(params, z)))

    traces = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev = {p for p, n in pid_names.items() if "TPU" in n}
    cat = defaultdict(float)
    op = defaultdict(lambda: [0.0, "", 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in dev:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        a = e.get("args") or {}
        cat[a.get("hlo_category", "?")] += e["dur"]
        rec = op[name]
        rec[0] += e["dur"]
        rec[1] = (a.get("tf_op", "") + " | " + a.get("long_name", ""))[:160]
        rec[2] = int(a.get("model_flops", 0) or 0)
        total += e["dur"]
    print(f"total {total / 3e3:.2f} ms/step")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {k:28s} {v / 3e3:8.2f} ms")
    print("\ntop 15 ops:")
    for k, (d, info, fl) in sorted(op.items(), key=lambda kv: -kv[1][0])[:15]:
        tf = fl / (d / 3e6) / 1e12 if d else 0
        print(f"{k[:28]:28s} {d / 3e3:7.2f} ms  {tf:6.1f} TF/s  {info[:110]}")


if __name__ == "__main__":
    main()
