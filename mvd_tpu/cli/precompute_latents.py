"""Precompute the VAE latent-moment cache for a rendered corpus.

Encodes every view of every object zip through the (frozen) VAE encoder
once and stores the posterior moments on disk (data/latent_cache.py), so
training runs encoder-free batches: pass ``--latent-cache-dir`` (or the
``latent_cache_dir`` YAML key) to ``mvd-train`` afterwards. The reference
re-encodes source+target pixels inside every training step
(training.py:173-177); this tool amortizes that work to one corpus pass.

Usage::

    mvd-precompute-latents --dataset-path /data/objaverse \
        --image-size 512 [--checkpoint outputs/.../params] [--out DIR]
"""

from __future__ import annotations

import argparse
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset-path", required=True)
    p.add_argument(
        "--image-size",
        type=int,
        default=None,
        help="encode resolution (default: the --config YAML's image_size, "
        "or 768 without --config)",
    )
    p.add_argument(
        "--out",
        default=None,
        help="cache directory (default <dataset>/.mvd_latent_cache/<size>)",
    )
    p.add_argument(
        "--checkpoint",
        default=None,
        help="orbax params dir holding the converted SD VAE weights; "
        "omitting it uses RANDOM VAE weights (smoke tests only)",
    )
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument(
        "--dtype",
        default="float32",
        choices=["float32", "float16"],
        help="cache STORAGE dtype; float16 halves the cache size",
    )
    p.add_argument(
        "--compute-dtype",
        default=None,
        choices=["float32", "bfloat16"],
        help="VAE COMPUTE dtype for the encode pass. Default: the model "
        "config's dtype (bfloat16 for the flagship), matching what in-step "
        "pixel training computes — so cached moments equal pixel-path "
        "moments at the training config's numerics. bf16 is also ~8x "
        "faster on the MXU than f32 conv operands.",
    )
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--tiny", action="store_true", help="tiny debug VAE")
    p.add_argument(
        "--config",
        default=None,
        help="training YAML whose model (vae_config overrides, compute "
        "dtype) the encode pass should match — required when the VAE is "
        "not flagship-width (e.g. config/evidence_256.yaml)",
    )
    return p


def main(argv=None):
    from . import apply_platform_env

    apply_platform_env()
    args = build_argparser().parse_args(argv)

    import jax

    from ..config import TINY_MODEL, ModelConfig
    from ..data.latent_cache import corpus_zips, precompute_latent_cache
    from ..nn.vae import AutoencoderKL

    if args.config:
        from ..config import train_config_from_yaml

        tc = train_config_from_yaml(args.config)
        cfg = tc.model
        if args.image_size is None:
            args.image_size = tc.image_size
    else:
        cfg = TINY_MODEL if args.tiny else ModelConfig()
    if args.image_size is None:
        args.image_size = 768
    import jax.numpy as _jnp

    compute_dtype = _jnp.dtype(args.compute_dtype or cfg.dtype)
    vae = AutoencoderKL(cfg.vae, dtype=compute_dtype)
    hw = min(cfg.vae.sample_size, 64)
    import jax.numpy as jnp

    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, cfg.vae.in_channels))
    )
    if args.checkpoint:
        from ..checkpoint import load_params

        # restore template-free and take the VAE subtree (the full-pipeline
        # template isn't needed just to read frozen VAE weights)
        loaded = load_params(args.checkpoint, None)
        vae_params = jax.tree_util.tree_map(jnp.asarray, loaded["vae"])
    else:
        print(
            "WARNING: no --checkpoint given — encoding with RANDOM VAE "
            "weights (only useful for smoke tests)"
        )

    zips = corpus_zips(args.dataset_path)
    if not zips:
        raise SystemExit(f"no corpus zips under {args.dataset_path!r}")
    out = args.out or os.path.join(
        args.dataset_path, ".mvd_latent_cache", str(args.image_size)
    )
    stats = precompute_latent_cache(
        vae,
        vae_params,
        zips,
        out,
        image_size=args.image_size,
        batch_size=args.batch_size,
        dtype=args.dtype,
        overwrite=args.overwrite,
        compute_dtype=str(compute_dtype),
    )
    print(
        f"latent cache at {out}: {stats['zips']} zips encoded "
        f"({stats['views']} views), {stats['skipped']} already cached"
    )


if __name__ == "__main__":
    main()
