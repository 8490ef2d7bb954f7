"""Profile UNet/VAE conv shapes on TPU: XLA conv vs im2col-matmul variants.

Measures achieved TFLOP/s per shape to find where the MXU is underfed
(round-1 estimate: convs at ~15% MXU are the biggest pipeline lever).

Run on the TPU host: python benchmarks/conv_profile.py
"""

import time

import jax
import jax.numpy as jnp

PEAK_BF16_TFLOPS = 394.0  # v5e chip


def sync_time(fn, *args, iters=30):
    """Per-op time measured inside ONE jitted scan that chains iterations
    through a data dependency — a per-dispatch harness would measure the
    axon tunnel's ~1.3 ms dispatch latency instead of kernel time."""
    x, rest = args[0], args[1:]

    @jax.jit
    def loop(x, *rest):
        def body(h, _):
            out = fn(h, *rest)
            # feed a scalar back into the input to forbid loop-invariant
            # hoisting without changing the op's shape
            # FULL reduce: a sliced feedback (out[..., :1, :1]) lets XLA push
            # the slice through the conv/dot and skip ~all of the work —
            # round-1's "convs at 15% MXU" numbers were this artifact
            h = x * (1.0 + jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(x.dtype)
            return h, None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return h

    out = loop(x, *rest)
    float(jnp.sum(out))  # compile + sync
    t0 = time.perf_counter()
    out = loop(x, *rest)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def xla_conv_bf16acc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def im2col_conv(x, w):
    # 3x3 SAME conv as 9 shifted matmuls accumulated (avoids materializing
    # the 9x activation blowup of true im2col).
    B, H, W, C = x.shape
    kh, kw, _, O = w.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, W, O), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            patch = jax.lax.dynamic_slice(xp, (0, i, j, 0), (B, H, W, C))
            out = out + jnp.einsum(
                "bhwc,co->bhwo", patch, w[i, j],
                preferred_element_type=jnp.float32,
            )
    return out.astype(x.dtype)


def im2col_true(x, w):
    # True im2col: extract patches -> one big matmul.
    B, H, W, C = x.shape
    kh, kw, _, O = w.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = []
    for i in range(kh):
        for j in range(kw):
            cols.append(jax.lax.dynamic_slice(xp, (0, i, j, 0), (B, H, W, C)))
    patches = jnp.concatenate(cols, axis=-1)  # (B,H,W,9C)
    wf = w.transpose(0, 1, 2, 3).reshape(kh * kw * C, O)
    out = jnp.einsum("bhwk,ko->bhwo", patches, wf, preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def main():
    print(f"backend: {jax.default_backend()}")
    # (B, H, W, Cin, Cout, k) — UNet @ 64² latents (512² images), plus VAE decode
    shapes = [
        ("unet down0", 4, 64, 64, 320, 320, 3),
        ("unet down1", 4, 32, 32, 640, 640, 3),
        ("unet down2", 4, 16, 16, 1280, 1280, 3),
        ("unet mid  ", 4, 8, 8, 1280, 1280, 3),
        ("unet up1  ", 4, 32, 32, 1280, 640, 3),
        ("unet in1x1", 4, 64, 64, 320, 640, 1),
        ("vae dec hi", 1, 512, 512, 128, 128, 3),
        ("vae dec mi", 1, 256, 256, 256, 256, 3),
        ("vae dec lo", 1, 128, 128, 512, 512, 3),
        ("big batch ", 16, 64, 64, 320, 320, 3),
    ]
    for name, B, H, W, Ci, Co, k in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, H, W, Ci), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, Ci, Co), jnp.bfloat16) * 0.02
        flops = 2 * B * H * W * Ci * Co * k * k
        t_x = sync_time(jax.jit(xla_conv), x, w)
        t_b = sync_time(jax.jit(xla_conv_bf16acc), x, w)
        row = (
            f"{name} B{B} {H}x{W}x{Ci}->{Co} k{k}: "
            f"xla_f32acc {t_x*1e3:7.3f} ms ({flops/t_x/1e12:6.1f} TF/s, {flops/t_x/1e12/PEAK_BF16_TFLOPS*100:4.1f}%) | "
            f"xla_bf16acc {t_b*1e3:7.3f} ms ({flops/t_b/1e12:6.1f} TF/s, {flops/t_b/1e12/PEAK_BF16_TFLOPS*100:4.1f}%)"
        )
        if k == 3:
            t_s = sync_time(jax.jit(im2col_conv), x, w)
            t_t = sync_time(jax.jit(im2col_true), x, w)
            row += (
                f" | shift9 {t_s*1e3:7.3f} ms ({flops/t_s/1e12/PEAK_BF16_TFLOPS*100:4.1f}%)"
                f" | im2col {t_t*1e3:7.3f} ms ({flops/t_t/1e12/PEAK_BF16_TFLOPS*100:4.1f}%)"
            )
        print(row, flush=True)


if __name__ == "__main__":
    main()
