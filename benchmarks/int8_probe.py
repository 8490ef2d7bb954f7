"""Probe: does int8 beat bf16 at flash attention's matmul shapes on this chip?

The flash kernel is bound by the chip's D=64 matmul rate (CLAUDE.md measured
facts: matmul-only ablation 55 TF/s, full flash ~62-66 TF/s effective per
matmul). v5e advertises 2x int8 MACs/cycle vs bf16. If that holds at the
D=64 contraction, a SageAttention-style int8 QK^T (+ optionally int8 P.V)
roughly halves the attention time that dominates the denoise step.

This probe times the matmul-only chain shaped exactly like the flash
forward's inner loop (qk -> cast -> pv with an f32/i32 accumulator, no
softmax), bf16 vs int8, using the fa_variants.py scan-feedback timing loop
so the axon tunnel floor is amortized. An earlier version of this probe
reduced the qk scores into a (block_q, heads) scratch with narrow-lane VPU
sums and measured 21.8 TF/s for BOTH dtypes — that was the reduce, not the
matmul. Do not reintroduce per-row reductions here.

Run on the TPU host: python benchmarks/int8_probe.py

Measured (v5e-1, 2026-08-18), chain = qk+pv at the flash block shapes,
flops = 4*B*H*S*S*D:

    bf16->f32: 1.81-1.92 ms  44.7-49.1 TF/s   (best: bq1024 bk1024 unpacked)
    int8->i32: 1.32-1.49 ms  57.8-64.9 TF/s   (best: bq1024 bk1024 unpacked)

i.e. int8 is 1.32x bf16 at the D=64 contraction — NOT the advertised 2x
(the MXU only loads 64 of its 128 contraction rows at D=64 either way).
Packed (H*D=320-lane) layout matches unpacked within a few %. For scale:
the production packed flash kernel (with softmax) runs 2.0 ms at this
shape, so its matmul floor is ~90% of its runtime and an int8 path caps
out around 2.0 -> ~1.6-1.7 ms (-17%) before quantization overheads.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HEADS, S, D = 4, 5, 4096, 64
BLOCK_Q, BLOCK_K = 512, 512


def _chain_kernel(q_ref, k_ref, v_ref, o_ref, acc, *, nk, acc_dtype):
    """qk -> cast -> pv, no softmax. Mirrors the flash inner loop's matmuls."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=acc_dtype
    )
    p = s.astype(q.dtype)  # stand-in for the softmax's exp output cast
    acc[:] += jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype
    ).astype(acc.dtype)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = acc[:]


def build_chain(dtype, acc_dtype, block_q=BLOCK_Q, block_k=BLOCK_K):
    bh = B * HEADS
    nq = S // block_q
    nk = S // block_k
    out_dtype = jnp.float32 if acc_dtype == jnp.float32 else jnp.int32
    f = pl.pallas_call(
        functools.partial(_chain_kernel, nk=nk, acc_dtype=acc_dtype),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, S, D), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), out_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )
    q = jnp.ones((bh, S, D), dtype)
    k = jnp.ones((bh, S, D), dtype)
    v = jnp.ones((bh, S, D), dtype)
    return f, (q, k, v)


def sync_time(fn, *args, iters=40):
    """Scan with a data-dependent (~zero) feedback into the first operand, so
    XLA can't skip iterations; one host sync total (axon-safe)."""

    @jax.jit
    def loop(*a):
        q = a[0]

        def body(h, _):
            out = fn(h, *a[1:])
            t = jnp.sum(out.astype(jnp.float32)) * 1e-30
            h = (q.astype(jnp.float32) + t).astype(q.dtype)
            return h, None

        h, _ = jax.lax.scan(body, q, None, length=iters)
        return h

    float(jnp.sum(loop(*args).astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    float(jnp.sum(loop(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    bh = B * HEADS
    flops = 2 * 2 * bh * S * S * D  # qk + pv
    print(f"backend={jax.default_backend()}  bh={bh} S{S} D{D} "
          f"blocks {BLOCK_Q}x{BLOCK_K}")
    for label, dt, at in [
        ("bf16->f32", jnp.bfloat16, jnp.float32),
        ("int8->i32", jnp.int8, jnp.int32),
    ]:
        try:
            f, args = build_chain(dt, at)
            sec = sync_time(f, *args)
            print(f"  chain {label}: {sec*1e3:.3f} ms  "
                  f"{flops/sec/1e12:.1f} TF/s")
        except Exception as e:  # noqa: BLE001
            print(f"  chain {label}: FAILED {str(e)[:300]}")


if __name__ == "__main__":
    main()
