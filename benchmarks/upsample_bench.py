"""Compare formulations of `nearest-x2 upsample -> 3x3 SAME conv` at the VAE
decoder's shapes. The folded-subpixel path (current default) killed the
materialized upsample, but its phase slice/stack interleave still shows up as
~6 ms of data-formatting in the 4x512² decode trace. Candidate: a single
transposed conv (lhs_dilation=2) with the 3x3 kernel folded into 4x4 —
emits the interleaved output directly.

Methodology: full-reduce feedback (see CLAUDE.md — sliced feedback lets XLA
skip the op), host-transfer barrier, tunnel floor subtracted implicitly by
comparing formulations at the same call count.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync_time(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


_R = np.array([[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], np.float32)


def upsample_conv_transposed(x, kernel, bias):
    """nearest-x2 + 3x3 SAME conv as ONE lhs-dilated conv with a folded 4x4
    kernel (exact up to f32 tap re-association)."""
    r = jnp.asarray(_R, kernel.dtype)
    k4 = jnp.einsum("ar,rsio,bs->abio", r, kernel, r)
    y = jax.lax.conv_general_dilated(
        x,
        k4.astype(x.dtype),
        (1, 1),
        ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


def naive(x, kernel, bias):
    B, H, W, C = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    up = up.reshape(B, H * 2, W * 2, C)
    y = jax.lax.conv_general_dilated(
        up, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


def check_equiv():
    from mvd_tpu.nn.layers import conv3x3_after_nearest_x2

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 8, 8, 5), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 5, 7), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (7,), jnp.float32)
    ref = naive(x, w, b)
    got_fold = conv3x3_after_nearest_x2(x, w, b)
    got_tr = upsample_conv_transposed(x, w, b)
    print("fold  max err:", float(jnp.abs(ref - got_fold).max()))
    print("trans max err:", float(jnp.abs(ref - got_tr).max()))
    # TPU f32 convs take bf16 MXU passes -> ~1e-1 abs err on randn scale
    tol = 1e-4 if jax.default_backend() == "cpu" else 0.3
    assert jnp.abs(ref - got_tr).max() < tol, "transposed formulation wrong"


def main():
    from mvd_tpu.nn.layers import conv3x3_after_nearest_x2

    check_equiv()
    shapes = [
        (4, 64, 64, 512, 512),    # vae up_0_upsample
        (4, 128, 128, 512, 512),  # vae up_1_upsample
        (4, 256, 256, 256, 256),  # vae up_2_upsample
        (4, 16, 16, 1280, 1280),  # unet up level 1->2
        (4, 32, 32, 640, 640),    # unet
    ]
    for B, H, W, C, O in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, O), jnp.bfloat16)
        b = jnp.zeros((O,), jnp.bfloat16)
        t_fold = sync_time(jax.jit(conv3x3_after_nearest_x2), x, w, b)
        t_tr = sync_time(jax.jit(upsample_conv_transposed), x, w, b)
        t_nv = sync_time(jax.jit(naive), x, w, b)
        print(
            f"({B},{H}x{W},{C}->{O}): fold {t_fold:7.2f} ms  "
            f"transposed {t_tr:7.2f} ms  naive {t_nv:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
