"""Kernel microbenchmarks: Pallas vs XLA on the framework's hot ops.

Run on a TPU host:
    python benchmarks/kernel_bench.py

Reports flash attention (the SD2.1 self/adapter attention shapes), the
fused GroupNorm+SiLU kernel, and a full denoise UNet forward, using a host
transfer as the completion barrier (async-dispatch-proof).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync_time(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_attention():
    from mvd_tpu.kernels.flash_attention import (
        flash_attention,
        flash_attention_packed,
        flash_attention_packed_int8,
        xla_attention,
    )

    print("== attention (B,H,S,D) ==")
    shapes = [
        (4, 5, 4096, 64, 4096),   # down_0 self/adapter @512²
        (4, 10, 1024, 64, 1024),  # down_1
        (4, 20, 256, 64, 256),    # down_2
        (4, 10, 1024, 64, 77),    # text cross-attention
    ]
    for B, H, Sq, D, Sk in shapes:
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (B, H, Sq, D), jnp.bfloat16)
        kk = jax.random.normal(k, (B, H, Sk, D), jnp.bfloat16)
        v = jax.random.normal(k, (B, H, Sk, D), jnp.bfloat16)
        t_x = sync_time(jax.jit(xla_attention), q, kk, v)
        if Sk % 128 == 0 and Sq % 128 == 0:
            t_p = sync_time(jax.jit(lambda q, k, v: flash_attention(q, k, v, block_q=min(512, Sq), block_k=min(512, Sk))), q, kk, v)
            pack = lambda t, s: t.transpose(0, 2, 1, 3).reshape(B, s, H * D)
            qp, kp, vp = pack(q, Sq), pack(kk, Sk), pack(v, Sk)
            t_pk = sync_time(jax.jit(lambda q, k, v: flash_attention_packed(q, k, v, H)), qp, kp, vp)
            t_i8 = sync_time(jax.jit(lambda q, k, v: flash_attention_packed_int8(q, k, v, H)), qp, kp, vp)
            print(f"  q{Sq}xk{Sk} h{H}: pallas {t_p:.3f} | packed {t_pk:.3f} | int8 {t_i8:.3f} | xla {t_x:.3f} ms")
        else:
            print(f"  q{Sq}xk{Sk} h{H}: pallas n/a | xla {t_x:.3f} ms")


def bench_ring_hop():
    """Per-hop cost of the view-sharded ring attention at north-star LOCAL
    sequence lengths (kernels/ring_attention.py): the hop is the packed
    flash (out, lse) forward — O(block) memory, so it must run at any
    S_local without the old einsum hop's (S_local², f32) logits (340 MB at
    9216). One real chip can't host a >1-device ring, so this measures the
    per-hop kernel the ring schedules; ring cost ≈ n_hops × hop (ppermute
    overlaps compute over ICI).

    Shapes: 8-view 768² joint attention = 73728 global tokens; sharded
    8-way -> 9216 local, 2-way -> 36864 local.
    """
    from mvd_tpu.kernels.flash_attention import _flash_bwd, _flash_fwd_packed

    print("== ring attention per-hop (packed flash out+lse, level-0 heads) ==")
    for B, H, S, D in [(1, 5, 9216, 64), (2, 5, 9216, 64), (1, 5, 36864, 64)]:
        key = jax.random.PRNGKey(0)
        HD = H * D
        q = jax.random.normal(key, (B, S, HD), jnp.bfloat16)
        k = jax.random.normal(key, (B, S, HD), jnp.bfloat16)
        v = jax.random.normal(key, (B, S, HD), jnp.bfloat16)
        scale = 1.0 / (D ** 0.5)
        fwd = jax.jit(
            lambda q, k, v: _flash_fwd_packed(
                q, k, v, H, scale, 512, 1024, S, False
            )[0]
        )
        t_f = sync_time(fwd, q, k, v)
        # hop backward: flash bwd kernels with the (global) lse
        tr = lambda t: t.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        def bwd(q, kk, vv):
            out, lse = _flash_fwd_packed(q, kk, vv, H, scale, 512, 1024, S, False)
            dq, dk, dv = _flash_bwd(
                scale, 512, 1024, False,
                (tr(q), tr(kk), tr(vv), tr(out), lse.transpose(0, 2, 1)),
                tr(out),
            )
            return dq
        t_b = sync_time(jax.jit(bwd), q, k, v)
        tf = 4 * B * H * S * S * D / (t_f / 1e3) / 1e12
        print(
            f"  B{B} S_local={S}: hop fwd {t_f:.2f} ms ({tf:.1f} TF/s) | "
            f"hop fwd+bwd {t_b:.2f} ms"
        )


def bench_groupnorm():
    from mvd_tpu.kernels.groupnorm_silu import groupnorm_silu, xla_groupnorm_silu

    print("== fused GroupNorm+SiLU (NHWC) ==")
    for shape in [(8, 32, 32, 640), (8, 16, 16, 1280), (8, 64, 64, 640)]:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        s = jnp.ones(shape[-1])
        b = jnp.zeros(shape[-1])
        t_x = sync_time(jax.jit(lambda x, s, b: xla_groupnorm_silu(x, s, b, 32)), x, s, b)
        try:
            t_p = sync_time(
                jax.jit(lambda x, s, b: groupnorm_silu(x, s, b, 32, force=True)), x, s, b
            )
            print(f"  {shape}: pallas {t_p:.3f} ms | xla {t_x:.3f} ms")
        except Exception as e:
            print(f"  {shape}: pallas failed ({type(e).__name__}) | xla {t_x:.3f} ms")


def bench_denoise():
    from mvd_tpu.config import ModelConfig, UNetConfig
    from mvd_tpu.nn import MultiViewUNet

    print("== denoise forward (4-view 512², adapters+FiLM) ==")
    B, hw = 4, 64
    sample = jax.random.normal(jax.random.PRNGKey(1), (B, hw, hw, 4))
    t = jnp.asarray(500)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 1024))
    cams = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    src = jax.random.normal(jax.random.PRNGKey(3), (B, hw, hw, 4))
    cfg = ModelConfig(unet=UNetConfig(remat=False, attention_impl="auto"), dtype="bfloat16")
    model = MultiViewUNet(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), sample, t, ctx,
        source_camera=cams, target_camera=cams, source_image_latents=src,
    )
    prep = jax.jit(
        lambda p, c, sc, tc, sl: model.apply(p, c, sc, tc, sl, method=model.prepare_conditioning)
    )
    film, feats = prep(params, ctx, cams, cams, src)
    den = jax.jit(
        lambda p, s, t, c, f, r: model.apply(p, s, t, c, f, r, method=model.denoise)
    )
    ms = sync_time(den, params, sample, t, ctx, film, feats)
    print(f"  denoise: {ms:.1f} ms  ({1000/ms:.1f} steps/sec/chip)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench_attention()
    bench_ring_hop()
    bench_groupnorm()
    bench_denoise()
