"""Segment-level timing of the full-scale pipeline on TPU: where do the
milliseconds go? (text encode / VAE encode / conditioning prep / one denoise
step / VAE decode, plus a UNet-internals split: attention vs conv+rest.)

Run with the default env (axon TPU). Informs the conv-MFU work (VERDICT r1
task 2): XLA convs at ~15% MXU were flagged as the biggest perf lever.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, *args, n=5, warmup=1, **kw):
    for _ in range(warmup):
        sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        sync(out)
    return (time.perf_counter() - t0) / n


def main():
    from mvd_tpu.config import ModelConfig, UNetConfig
    from mvd_tpu.pipeline import MVDPipeline
    from mvd_tpu.camera import orbit_cameras

    NUM_VIEWS, RES = 4, 512
    hw = RES // 8
    cfg = ModelConfig(
        unet=UNetConfig(remat=False, attention_impl="auto"), dtype="bfloat16"
    )
    print("init...", file=sys.stderr, flush=True)
    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(pipe.params)
    B = NUM_VIEWS

    ids = jnp.ones((B, 77), jnp.int32)
    imgs = jnp.zeros((B, RES, RES, 3), jnp.float32)
    lat = jnp.zeros((B, hw, hw, 4), jnp.float32)
    cams = jnp.asarray(np.tile(orbit_cameras(NUM_VIEWS), (1, 1, 1)), jnp.float32)

    results = {}

    te = jax.jit(lambda p, i: pipe.text_encoder.apply(p, i))
    results["text_encode"] = timeit(te, pipe.params["text_encoder"], ids)
    text = te(pipe.params["text_encoder"], ids)

    venc = jax.jit(
        lambda p, x, r: pipe.vae.apply(p, x, r, True, method=pipe.vae.encode)
    )
    results["vae_encode_512"] = timeit(
        venc, pipe.params["vae"], imgs, jax.random.PRNGKey(0)
    )

    prep = jax.jit(
        lambda p, t, sc, tc, sl: pipe.mvd_unet.apply(
            p, t, sc, tc, sl, precompute_kv=True,
            method=pipe.mvd_unet.prepare_conditioning,
        )
    )
    results["prepare_conditioning"] = timeit(
        prep, pipe.params["mvd"], text, cams, cams, lat
    )
    film, ref = prep(pipe.params["mvd"], text, cams, cams, lat)

    den = jax.jit(
        lambda p, s, t, e, f, r: pipe.mvd_unet.apply(
            p, s, t, e, f, r, jnp.float32(1.0), method=pipe.mvd_unet.denoise
        )
    )
    results["denoise_step"] = timeit(
        den, pipe.params["mvd"], lat, jnp.asarray(500), text, film, ref
    )

    vdec = jax.jit(lambda p, z: pipe.vae.apply(p, z, method=pipe.vae.decode))
    results["vae_decode_512"] = timeit(vdec, pipe.params["vae"], lat)

    # UNet without any attention dispatch cost attribution is hard from the
    # outside; time the denoise with XLA attention for the attn share.
    import dataclasses

    cfg_x = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, attention_impl="xla")
    )
    from mvd_tpu.nn import MultiViewUNet

    unet_x = MultiViewUNet(cfg_x)
    den_x = jax.jit(
        lambda p, s, t, e, f, r: unet_x.apply(
            p, s, t, e, f, r, jnp.float32(1.0), method=unet_x.denoise
        )
    )
    results["denoise_step_xla_attn"] = timeit(
        den_x, pipe.params["mvd"], lat, jnp.asarray(500), text, film, ref
    )

    total_20 = (
        results["text_encode"]
        + results["vae_encode_512"]
        + results["prepare_conditioning"]
        + 20 * results["denoise_step"]
        + results["vae_decode_512"]
    )
    for k, v in results.items():
        print(f"{k:28s} {v * 1e3:9.2f} ms")
    print(f"{'sum(1 call, 20 steps)':28s} {total_20 * 1e3:9.2f} ms "
          f"-> {B / total_20:.3f} img/sec")


if __name__ == "__main__":
    main()
