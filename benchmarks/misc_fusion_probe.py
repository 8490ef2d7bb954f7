"""Probe: is the denoise step's ~12 ms "misc fusions" bucket bandwidth-bound?

The 42 ms 4-view 512² denoise trace splits into flash kernels 19.6 ms,
convs 6.9 ms, and ~12 ms spread across the 16 transformer blocks' LayerNorms,
GEGLU FFs, and linear projections (docs/PERFORMANCE.md). Before building a
fused LN->matmul Pallas kernel, measure what XLA already achieves on the
isolated chains at the hot shapes:

  * LN alone               -> bytes moved / time vs HBM peak
  * LN -> qkv matmul       -> does XLA fuse the LN into the matmul's prologue
  * LN -> GEGLU -> proj    -> the FF chain

v5e HBM peak is ~820 GB/s; if the chains run at >=60-70% of that, the bucket
is bandwidth-bound and a hand-fused kernel's ceiling is the leftover few ms
(close out); if they run far below, there's a fusion gap worth a kernel.

Run: python benchmarks/misc_fusion_probe.py   (TPU env)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

HBM_PEAK_GBS = 820.0  # v5e


def sync_time(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def ln(x, s, b):
    m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
    return ((x - m) * jax.lax.rsqrt(v + 1e-5) * s + b).astype(x.dtype)


def main():
    print("backend:", jax.default_backend())
    # the UNet's transformer-block shapes at 4-view 512²
    shapes = [(4, 4096, 320), (4, 1024, 640), (4, 256, 1280)]
    for B, S, C in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, S, C), jnp.bfloat16)
        s = jnp.ones((C,), jnp.bfloat16)
        b = jnp.zeros((C,), jnp.bfloat16)
        w_qkv = jax.random.normal(key, (C, 3 * C), jnp.bfloat16) * 0.02
        w_ff1 = jax.random.normal(key, (C, 8 * C), jnp.bfloat16) * 0.02
        w_ff2 = jax.random.normal(key, (4 * C, C), jnp.bfloat16) * 0.02

        t_ln = sync_time(jax.jit(ln), x, s, b)
        bytes_ln = 2 * B * S * C * 2  # read + write bf16
        eff_ln = bytes_ln / (t_ln / 1e3) / 1e9

        t_lnmm = sync_time(jax.jit(lambda x, s, b, w: ln(x, s, b) @ w), x, s, b, w_qkv)
        t_mm = sync_time(jax.jit(lambda x, w: x @ w), x, w_qkv)

        def ff(x, s, b, w1, w2):
            h = ln(x, s, b) @ w1
            a, g = jnp.split(h, 2, -1)
            return (a * jax.nn.gelu(g)) @ w2

        t_ff = sync_time(jax.jit(ff), x, s, b, w_ff1, w_ff2)
        # FF flops: S*C*8C*2 + S*4C*C*2
        fl = (B * S * C * 8 * C * 2 + B * S * 4 * C * C * 2) / 1e12
        print(
            f"  (B{B},S{S},C{C}): LN {t_ln:.3f} ms ({eff_ln:.0f} GB/s, "
            f"{100*eff_ln/HBM_PEAK_GBS:.0f}% peak) | qkv-matmul {t_mm:.3f} | "
            f"LN+qkv {t_lnmm:.3f} (LN adds {t_lnmm-t_mm:+.3f}) | "
            f"LN+GEGLU-FF {t_ff:.3f} ms ({fl/(t_ff/1e3):.1f} TF/s)"
        )
    # the per-call axon dispatch floor (~0.6-0.8 ms) rides every number
    # above; deltas between rows are the meaningful signal.
    tiny = jax.jit(lambda x: x + 1)
    t_floor = sync_time(tiny, jnp.zeros((8, 128), jnp.float32))
    print(f"  dispatch floor (tiny op): {t_floor:.3f} ms — subtract from rows")


if __name__ == "__main__":
    main()
