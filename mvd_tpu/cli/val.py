"""Validation/benchmark CLI (mirrors reference val.py:568-630)."""

from __future__ import annotations

import argparse
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Validation metric sweep")
    p.add_argument("--config", type=str, default=None,
                   help="training YAML; the model is built with its "
                        "arch/scheduler/conditioning settings (flagship "
                        "SD2.1 shape when omitted)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Lightning .ckpt, a save_params dir, or a Trainer "
                        "run dir (checkpoints/ restored at the latest step)")
    p.add_argument("--vae-params", type=str, default=None,
                   help="save_params dir holding a pretrained 'vae' "
                        "partition (e.g. tools/pretrain_vae.py output)")
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


def _is_run_dir(path: str) -> bool:
    """A Trainer run dir / checkpoints dir / orbax step dir (vs a flat
    save_params dir, which holds ocdbt manifests rather than step dirs)."""
    if not os.path.isdir(path):
        return False
    base = os.path.basename(os.path.abspath(path).rstrip(os.sep))
    if os.path.isdir(os.path.join(path, "checkpoints")):
        return True
    return base == "checkpoints" or base.isdigit() or any(
        e.isdigit() and os.path.isdir(os.path.join(path, e))
        for e in os.listdir(path)
    )


def _restore_run_dir(train_cfg, pipe, path: str) -> int:
    """Restore the trained 'mvd' partition from a Trainer run dir
    (benchmarks/view_synthesis_eval.py restore_run semantics)."""
    from ..checkpoint import CheckpointManager, resolve_resume_path
    from ..config import TrainConfig
    from ..train import TrainState, make_optimizer

    cfg = train_cfg or TrainConfig()
    ckpt_dir, step = resolve_resume_path(path)
    tx = make_optimizer(
        cfg.optimizer,
        pipe.params["mvd"],
        total_steps=max(1, cfg.max_steps or 1000),
        train_denoising_unet=cfg.train_denoising_unet,
        grad_accum_steps=cfg.grad_accum_steps,
    )
    template = TrainState.create(pipe.params["mvd"], tx)
    mgr = CheckpointManager(ckpt_dir)
    state, _ = mgr.restore(template, step)
    mgr.close()
    if state is None:
        raise SystemExit(f"no checkpoint found under {path}")
    pipe.params = {**pipe.params, "mvd": state.params}
    return int(state.step)


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

    train_cfg = None
    if args.config:
        # honor the YAML's architecture/scheduler/conditioning — --config
        # used to be parsed but never read, exactly the dead-knob class
        # this framework makes real (reference mvd_unet.py:401 vs 420-421)
        from ..config import train_config_from_yaml

        train_cfg = train_config_from_yaml(args.config)
        cfg = train_cfg.model
        size = args.image_size if args.image_size != 768 else train_cfg.image_size
    elif args.tiny:
        cfg = TINY_MODEL
        size = cfg.unet.sample_size * 8
    else:
        cfg = ModelConfig()
        size = args.image_size
    if not args.tiny:
        unet = dataclasses.replace(cfg.unet, sample_size=size // 8, remat=False)
        cfg = dataclasses.replace(cfg, unet=unet)

    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(0))
    if args.vae_params:
        from ..checkpoint import load_params

        loaded = load_params(args.vae_params)
        pipe.params = {**pipe.params, "vae": loaded["vae"]}
    if args.checkpoint:
        if args.checkpoint.endswith(".ckpt"):
            from ..checkpoint import convert_lightning_checkpoint

            mvd_params, _ = convert_lightning_checkpoint(args.checkpoint)
            pipe.params = {**pipe.params, "mvd": mvd_params}
        elif _is_run_dir(args.checkpoint):
            step = _restore_run_dir(train_cfg, pipe, args.checkpoint)
            print(f"restored run checkpoint at step {step}")
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
