"""Prototype flash-attention variants at the pipeline's hot shape.

Current kernel: grid (bh, nq), fori_loop over k blocks inside -> the
s->exp->pv dependency chain serializes MXU and VPU. Variant: 3D grid
(bh, nq, nk) with online-softmax state carried in VMEM scratch, so Mosaic
pipelines k-block loads and can overlap compute across grid steps.
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvd_tpu.kernels.flash_attention import flash_attention as fa_current
from mvd_tpu.kernels.flash_attention import xla_attention


def _grid_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_s, l_s, *, scale, nk):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m_prev = m_s[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_s[:] = alpha * l_s[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_s[:] = m_new

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc[:] / l_s[:]).astype(o_ref.dtype)
        lse_ref[0] = m_s[:] + jnp.log(l_s[:])


def fa_grid(q, k, v, scale=None, block_q=512, block_k=512):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    bh = B * H
    qr = q.reshape(bh, Sq, D)
    kr = k.reshape(bh, Sk, D)
    vr = v.reshape(bh, Sk, D)
    nq = Sq // block_q
    nk = Sk // block_k
    out, lse = pl.pallas_call(
        functools.partial(_grid_kernel, scale=float(scale), nk=nk),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((bh, Sq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qr, kr, vr)
    return out.reshape(B, H, Sq, D)


def sync_time(fn, *args, iters=40):
    @jax.jit
    def loop(*a):
        q = a[0]

        def body(h, _):
            out = fn(h, *a[1:])
            h = q * (1.0 + jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(q.dtype)
            return h, None

        h, _ = jax.lax.scan(body, q, None, length=iters)
        return h

    float(jnp.sum(loop(*args)))
    t0 = time.perf_counter()
    float(jnp.sum(loop(*args)))
    return (time.perf_counter() - t0) / iters


def main():
    x0 = jnp.ones((8, 128), jnp.bfloat16)
    floor = sync_time(lambda a: a + 1.0, x0)
    print(f"floor {floor*1e3:.3f} ms")
    for (B, H, S, D) in [(4, 5, 4096, 64), (4, 10, 1024, 64), (4, 20, 256, 64)]:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)
        fl = 4 * B * H * S * S * D
        want = np.asarray(xla_attention(q, k, v), np.float32)
        got = np.asarray(fa_grid(q, k, v, block_q=min(512, S), block_k=min(512, S)), np.float32)
        err = np.abs(got - want).max()
        t0 = sync_time(fa_current, q, k, v) - floor
        print(f"B{B} H{H} S{S}: current {t0*1e3:7.3f} ms ({fl/t0/1e12:6.1f} TF/s)")
        for bq, bk in [(512, 512), (256, 512), (512, 1024), (1024, 512), (256, 256)]:
            if bq > S or bk > S:
                continue
            t = sync_time(
                lambda a, b, c, bq=bq, bk=bk: fa_grid(a, b, c, block_q=bq, block_k=bk),
                q, k, v,
            ) - floor
            print(f"B{B} H{H} S{S}: grid {bq}/{bk} {t*1e3:7.3f} ms ({fl/t/1e12:6.1f} TF/s)  maxerr {err:.5f}")


if __name__ == "__main__":
    main()
