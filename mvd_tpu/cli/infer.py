"""Inference CLI (mirrors reference infer.py:160-191 flags + behavior).

Loads a checkpoint (orbax params dir, or a torch Lightning .ckpt which is
converted on the fly with the reference's key remap), builds the hard-coded
look-at source/target cameras (reference infer.py:97-103), runs N
generations, and writes source/generated/side-by-side PNGs
(infer.py:140-155).

Faithful-behavior note: the reference rescales the pipeline's [0,1] output
by (x+1)/2 AGAIN, squashing results into [0.5,1] (infer.py:126-127 — a
bug kept out of this rebuild; pass --reference-rescale-quirk to reproduce).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Multi-view inference")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--image-path", type=str, required=False, default=None)
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--output-dir", type=str, default="outputs/inference")
    p.add_argument("--num-images", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=20)
    p.add_argument("--guidance-scale", type=float, default=1.0)
    p.add_argument("--ref-scale", type=float, default=1.0)
    p.add_argument("--image-size", type=int, default=768)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--reference-rescale-quirk", action="store_true")
    p.add_argument(
        "--encoder-reuse", type=int, default=1,
        help="k>1 enables approximate encoder-propagation fast sampling "
        "(skip the UNet down path at k-1 of every k steps; arXiv 2312.09608)",
    )
    p.add_argument(
        "--sampler", type=str, default=None,
        choices=["ddpm", "ddim", "dpmpp_2m"],
        help="override the config sampler (dpmpp_2m: 2nd-order DPM-Solver++ "
        "— ~10 steps where DDIM needs 20-50)",
    )
    p.add_argument(
        "--use-ray-conditioning", action="store_true",
        help="sample a model trained with Plücker ray-map conditioning "
        "(extra conv_in channels; zero-padded when loading a converted "
        "checkpoint trained without them)",
    )
    p.add_argument(
        "--invert-init", action="store_true",
        help="initialize generation from the DDIM inversion of the source "
        "image (under the source camera) instead of random noise — "
        "structure-preserving novel views (arXiv 2508.10688)",
    )
    return p


def main(argv=None):
    from . import apply_platform_env

    apply_platform_env()
    args = build_argparser().parse_args(argv)

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses

    import jax

    from ..camera import look_at_camera, to_homogeneous
    from ..config import TINY_MODEL, ModelConfig
    from ..pipeline import MVDPipeline
    from ..utils import load_image, save_image, side_by_side

    cfg = TINY_MODEL if args.tiny else ModelConfig()
    if not args.tiny:
        unet = dataclasses.replace(cfg.unet, sample_size=args.image_size // 8, remat=False)
        cfg = dataclasses.replace(cfg, unet=unet)
    if args.use_ray_conditioning:
        cfg = dataclasses.replace(cfg, use_ray_conditioning=True)

    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(args.seed))
    if args.checkpoint:
        if args.checkpoint.endswith(".ckpt"):
            from ..checkpoint import convert_lightning_checkpoint

            mvd_params, skipped = convert_lightning_checkpoint(args.checkpoint)
            if args.use_ray_conditioning:
                # converted reference checkpoints have a 4-channel conv_in;
                # zero-pad the 6 ray rows (output-preserving at load)
                from ..checkpoint import zero_pad_conv_in

                inner = dict(mvd_params["params"])
                inner["unet"] = zero_pad_conv_in(inner["unet"])
                if "image_encoder_unet" in inner:
                    inner["image_encoder_unet"] = zero_pad_conv_in(
                        inner["image_encoder_unet"]
                    )
                mvd_params = {**mvd_params, "params": inner}
            pipe.params = {**pipe.params, "mvd": mvd_params}
            if skipped:
                print(f"converter skipped {len(skipped)} dead reference params")
        else:
            from ..checkpoint import load_params

            pipe.params = load_params(args.checkpoint, pipe.params)

    size = args.image_size if not args.tiny else cfg.unet.sample_size * 8
    if args.image_path:
        src_img = load_image(args.image_path, size)[None]  # [-1,1]
    else:
        src_img = np.zeros((1, size, size, 3), np.float32)

    # hard-coded look-at cameras (reference infer.py:97-103 / utils.py:51-85)
    source_cam = to_homogeneous(look_at_camera([2.0, 0.0, 0.5]))
    target_cam = to_homogeneous(look_at_camera([0.0, 2.0, 0.5]))

    os.makedirs(args.output_dir, exist_ok=True)
    save_image(src_img[0], os.path.join(args.output_dir, "source.png"))

    init_latents = None
    if args.invert_init:
        import jax.numpy as jnp

        inv = pipe.invert(
            (src_img + 1) / 2,
            args.prompt,
            num_inference_steps=args.num_steps,
            # the image IS the source view: invert under the source camera
            source_camera=source_cam,
            target_camera=source_cam,
            source_images=(src_img + 1) / 2,
            ref_scale=args.ref_scale,
        )
        init_latents = jnp.asarray(inv["latents"])

    for i in range(args.num_images):
        out = pipe(
            args.prompt,
            num_inference_steps=args.num_steps,
            guidance_scale=args.guidance_scale,
            height=size,
            width=size,
            source_camera=source_cam,
            target_camera=target_cam,
            source_images=(src_img + 1) / 2,
            ref_scale=args.ref_scale,
            seed=args.seed + i,
            encoder_reuse=args.encoder_reuse,
            sampler=args.sampler,
            latents=init_latents,
        )
        img = np.asarray(out["images"][0])
        if args.reference_rescale_quirk:
            img = (img + 1) / 2  # reproduces infer.py:126-127
        save_image(img, os.path.join(args.output_dir, f"generated_{i:02d}.png"))
        sheet = side_by_side([(src_img[0] + 1) / 2, img])
        save_image(sheet, os.path.join(args.output_dir, f"comparison_{i:02d}.png"))
    print(f"wrote {args.num_images} generations to {args.output_dir}")


if __name__ == "__main__":
    main()
