"""Training CLI (mirrors reference train.py:227-258 flags).

Usage:
    mvd-train --config config/train_config.yaml --dataset-path /data/objaverse
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import jax


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the multi-view diffusion model")
    p.add_argument("--config", type=str, default=None, help="YAML config path")
    p.add_argument("--dataset-path", type=str, default=None)
    p.add_argument("--dataset-format", type=str, default=None,
                   choices=("objaverse", "co3d"),
                   help="corpus layout: rendered-zip shards (reference "
                        "contract) or CO3D-style multi-view sequence shards")
    p.add_argument("--resume", type=str, default=None, help="checkpoint dir to resume")
    p.add_argument("--output-dir", type=str, default="outputs")
    p.add_argument("--wandb-id", type=str, default=None)
    p.add_argument("--run-name", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--num-views", type=int, default=1,
                   help=">1 enables joint multi-view training")
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--mesh-view", type=int, default=1,
                   help="view-parallel mesh size (ring cross-view attention)")
    p.add_argument("--num-slices", type=int, default=1,
                   help=">1 builds a multi-slice (DCN) mesh: the data axis "
                        "spans slices, view/model stay within a slice (ICI)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host: coordinator address host:port "
                        "(or set MVD_COORDINATOR; SLURM multi-task "
                        "allocations auto-detect)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count (MVD_NUM_PROCESSES)")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's rank (MVD_PROCESS_ID)")
    p.add_argument("--latent-cache-dir", type=str, default=None,
                   help="precomputed VAE latent-moment cache "
                   "(cli/precompute_latents.py); train batches skip the "
                   "per-step VAE encode")
    p.add_argument("--use-ray-conditioning", action="store_true",
                   help="concat per-pixel Plücker ray maps (target rays in "
                        "the source frame, computed in-jit from the batch "
                        "cameras) to the UNet input channels")
    p.add_argument("--init-params", type=str, default=None,
                   help="orbax params dir (checkpoint.save_params layout) whose "
                        "top-level components (vae / text_encoder / mvd) replace "
                        "the fresh init — e.g. a corpus-pretrained VAE from "
                        "tools/pretrain_vae.py standing in for the reference's "
                        "HF-pretrained VAE (mvd_unet.py:411-415)")
    p.add_argument("--tiny", action="store_true", help="tiny model (smoke test)")
    p.add_argument("--debug-nans", action="store_true")
    return p


def main(argv=None):
    from . import apply_platform_env

    apply_platform_env()
    args = build_argparser().parse_args(argv)

    # multi-host bootstrap BEFORE the first backend touch: after this,
    # jax.devices() is the global device list and the mesh spans hosts
    # (reference DDPStrategy+SLURMEnvironment equivalent, train.py:175-186)
    from ..distributed import initialize as distributed_initialize, is_primary

    distributed_initialize(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from ..config import TINY_MODEL, TrainConfig, train_config_from_yaml
    from ..data.objaverse import ObjaverseDataModule
    from ..data.tokenizer import load_tokenizer
    from ..mesh import make_mesh
    from ..parallel import for_view_sharding
    from ..pipeline import MVDPipeline
    from ..utils import MetricLogger, enable_nan_debugging

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    if args.debug_nans:
        enable_nan_debugging()

    cfg = train_config_from_yaml(args.config) if args.config else TrainConfig()
    if args.tiny:
        cfg = dataclasses.replace(cfg, model=TINY_MODEL, image_size=TINY_MODEL.unet.sample_size * 8)
    if args.batch_size:
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    if args.image_size:
        cfg = dataclasses.replace(cfg, image_size=args.image_size)
    if args.max_steps:
        cfg = dataclasses.replace(cfg, max_steps=args.max_steps)
    cfg = dataclasses.replace(cfg, num_views=args.num_views)
    if args.use_ray_conditioning:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, use_ray_conditioning=True)
        )

    n_dev = jax.device_count()
    mesh_view = args.mesh_view
    mesh_data = args.mesh_data or max(1, n_dev // mesh_view)
    mesh = make_mesh(data=mesh_data, view=mesh_view, num_slices=args.num_slices)
    view_sharded = mesh_view > 1
    model_cfg = cfg.model
    if args.num_views > 1:
        model_cfg = for_view_sharding(cfg.model, args.num_views, mesh_view)
        cfg = dataclasses.replace(cfg, model=model_cfg)

    # latent size must match the training resolution
    unet = dataclasses.replace(model_cfg.unet, sample_size=cfg.image_size // 8)
    model_cfg = dataclasses.replace(model_cfg, unet=unet)
    cfg = dataclasses.replace(cfg, model=model_cfg)

    pipe = MVDPipeline.create(model_cfg, jax.random.PRNGKey(cfg.seed))

    if args.init_params:
        # Component-wise pretrained init: the reference always starts from
        # HF-pretrained VAE/text/UNet weights (mvd_unet.py:411-415); offline,
        # the equivalent is params exported by save_params (e.g. a VAE
        # pretrained on the corpus by tools/pretrain_vae.py, or a converted
        # torch checkpoint re-exported). Only components present in the
        # saved tree are replaced; shapes must match the configured widths.
        from ..checkpoint import load_params

        loaded = load_params(args.init_params)
        merged = dict(pipe.params)
        for comp, tree in loaded.items():
            if comp not in merged:
                raise SystemExit(
                    f"--init-params component {comp!r} not in pipeline params "
                    f"(have {sorted(merged)})"
                )
            tmpl = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), merged[comp])
            got = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), tree)
            if tmpl != got:
                raise SystemExit(
                    f"--init-params component {comp!r} does not match the "
                    "configured architecture (shape/dtype mismatch)"
                )
            merged[comp] = tree
            logging.getLogger(__name__).info(
                "initialized %r from %s", comp, args.init_params
            )
        # reassign (not mutate): the pipeline's compute-dtype param cache is
        # keyed on the params object's identity
        pipe.params = merged

    dataset_path = args.dataset_path or os.environ.get("MVD_DATASET_PATH", "")
    from ..config import data_config_from_yaml, DataConfig

    data_cfg = data_config_from_yaml(args.config) if args.config else DataConfig()
    # batch_size is PER data-parallel device, mirroring the reference's
    # per-DDP-rank DataLoader batch (reference train_config.yaml batch_size 6
    # x num_gpus 4 = 24 global); the global batch fed to the loader is
    # therefore always divisible by the mesh's data axis.
    global_batch = cfg.batch_size * mesh_data
    latent_cache_dir = args.latent_cache_dir or data_cfg.latent_cache_dir
    if latent_cache_dir:
        # The cache must have been ENCODED at this config's compute numerics
        # — bf16 vs f32 moments differ by encode error, and training would
        # silently mix them with the pixel path's statistics otherwise.
        from ..data.latent_cache import read_meta

        cache_meta = read_meta(latent_cache_dir) or {}
        cache_cd = cache_meta.get("compute_dtype")
        if cache_cd and cache_cd != cfg.model.dtype:
            raise SystemExit(
                f"latent cache at {latent_cache_dir!r} was encoded at "
                f"compute_dtype={cache_cd} but the model config computes in "
                f"{cfg.model.dtype}; rebuild the cache (mvd-precompute-latents "
                f"--compute-dtype {cfg.model.dtype}) or change model dtype"
            )
        if cache_meta and not cache_cd:
            logging.getLogger(__name__).warning(
                "latent cache at %s predates compute_dtype tracking; cannot "
                "verify its encoder numerics match model dtype %s",
                latent_cache_dir, cfg.model.dtype,
            )
    dm = ObjaverseDataModule(
        dataset_path,
        pipe.tokenizer,
        image_size=cfg.image_size,
        batch_size=global_batch,
        max_views_per_object=data_cfg.max_views_per_object,
        dataset_samples=data_cfg.dataset_samples,
        num_workers=data_cfg.num_workers,
        views_per_sample=max(1, args.num_views),
        seed=cfg.seed,
        dataset_format=args.dataset_format or data_cfg.dataset_format,
        latent_cache_dir=latent_cache_dir,
        process_count=jax.process_count(),
        process_index=jax.process_index(),
    )
    dm.setup()

    from ..train.loop import Trainer

    # experiment-identity recovery BEFORE the logger is built: the W&B run
    # id rides in the checkpoint meta, so a resumed run continues the same
    # W&B run (reference train.py:64-103's run-id-from-ckpt dance)
    wandb_id = args.wandb_id
    if args.resume and not wandb_id:
        from ..checkpoint import peek_checkpoint_meta

        wandb_id = peek_checkpoint_meta(args.resume).get("wandb_run_id")

    logger = MetricLogger(
        os.path.join(args.output_dir, "logs"),
        run_name=args.run_name,
        run_id=wandb_id,
        config={"config": str(cfg)},
        enabled=is_primary(),
    )
    trainer = Trainer(
        cfg,
        pipe,
        dm,
        mesh=mesh,
        view_sharded=view_sharded,
        output_dir=args.output_dir,
        logger=logger,
        resume_from=args.resume,
    )
    trainer.fit(resume=bool(args.resume))
    return trainer


if __name__ == "__main__":
    main()
