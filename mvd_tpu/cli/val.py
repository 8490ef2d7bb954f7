"""Validation/benchmark CLI (mirrors reference val.py:568-630)."""

from __future__ import annotations

import argparse
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Validation metric sweep")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--dataset-path", type=str, default=None)
    p.add_argument("--output-dir", type=str, default="outputs/validation")
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--num-steps", type=int, default=20)
    p.add_argument("--guidance-scale", type=float, default=1.0)
    p.add_argument("--ref-scale", type=float, default=0.1)
    p.add_argument("--image-size", type=int, default=768)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--vgg-weights", default=None, help="torch vgg16 .pth")
    p.add_argument("--lpips-weights", default=None, help="lpips package .pth")
    p.add_argument("--clip-vision-weights", default=None,
                   help="transformers CLIPVisionModel .bin/.pth")
    p.add_argument("--inception-weights", default=None,
                   help="pytorch-fid InceptionV3 .pth (standard FID)")
    p.add_argument("--fid", action="store_true", help="FID-VGG (needs --vgg-weights)")
    p.add_argument("--sampler", type=str, default=None,
                   choices=["ddpm", "ddim", "dpmpp_2m"],
                   help="override the config sampler")
    p.add_argument("--encoder-reuse", type=int, default=1,
                   help="k>1: approximate encoder-propagation fast sampling")
    return p


def main(argv=None):
    from . import apply_platform_env

    apply_platform_env()
    args = build_argparser().parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses

    import jax

    from ..config import TINY_MODEL, ModelConfig
    from ..data.objaverse import ObjaverseDataModule
    from ..metrics.harness import run_validation
    from ..pipeline import MVDPipeline

    cfg = TINY_MODEL if args.tiny else ModelConfig()
    size = cfg.unet.sample_size * 8 if args.tiny else args.image_size
    if not args.tiny:
        unet = dataclasses.replace(cfg.unet, sample_size=size // 8, remat=False)
        cfg = dataclasses.replace(cfg, unet=unet)

    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        if args.checkpoint.endswith(".ckpt"):
            from ..checkpoint import convert_lightning_checkpoint

            mvd_params, _ = convert_lightning_checkpoint(args.checkpoint)
            pipe.params = {**pipe.params, "mvd": mvd_params}
        else:
            from ..checkpoint import load_params

            pipe.params = load_params(args.checkpoint, pipe.params)

    dataset_path = args.dataset_path or os.environ.get("MVD_DATASET_PATH", "")
    dm = ObjaverseDataModule(
        dataset_path,
        pipe.tokenizer,
        image_size=size,
        batch_size=args.batch_size,
        dataset_samples=args.num_samples,
    )
    max_batches = (
        None if args.num_samples is None else max(1, args.num_samples // args.batch_size)
    )
    from ..metrics.load_towers import load_towers

    towers = load_towers(
        vgg_weights=args.vgg_weights,
        lpips_weights=args.lpips_weights,
        clip_vision_weights=args.clip_vision_weights,
        inception_weights=args.inception_weights,
        with_fid=args.fid,
    )
    overall = run_validation(
        pipe,
        dm.loader("test"),
        args.output_dir,
        num_inference_steps=args.num_steps,
        guidance_scale=args.guidance_scale,
        ref_scale=args.ref_scale,
        max_batches=max_batches,
        towers=towers,
        sampler=args.sampler,
        encoder_reuse=args.encoder_reuse,
    )
    for k, v in overall.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
