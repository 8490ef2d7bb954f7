"""Training loop orchestration.

The functional replacement for reference src/training/training.py's
LightningModule + train.py's Trainer wiring:
  * epoch loop over the prefetching loader, jitted train step,
  * periodic validation: noise-loss metrics over the val split plus a full
    20-step generation pass with PNG comparison triptychs
    (training.py:264-396: guidance 1.0, ref_scale 0.1),
  * orbax checkpoints every N steps with top-k on val/noise_loss +
    dataset RNG state (train.py:154-162, objaverse_dataset.py:302-337),
  * W&B/JSONL metric streaming incl. per-group grad norms
    (training.py:557-701),
  * wall-clock budget guard (reference Timer(147h), train.py:164-170).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..metrics.image import psnr, ssim
from ..utils import MetricLogger, create_output_dirs, save_image, side_by_side
from ..utils.logging import reuse_output_dirs

logger = logging.getLogger(__name__)
from .state import TrainState, count_params, make_optimizer, trainable_mask
from .step import make_eval_fn, make_train_step


def fetch_metrics(metrics: Dict[str, Any]) -> Dict[str, float]:
    """Device metric dict -> host floats with ONE transfer (per-leaf pulls
    are ruinous over remote/tunneled device backends)."""
    keys = [k for k, v in metrics.items() if hasattr(v, "dtype")]
    rest = {k: v for k, v in metrics.items() if not hasattr(v, "dtype")}
    if not keys:
        return dict(rest)
    stacked = np.asarray(jnp.stack([metrics[k].astype(jnp.float32) for k in keys]))
    return {**rest, **{k: float(v) for k, v in zip(keys, stacked)}}


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        pipe,
        datamodule,
        mesh=None,
        view_sharded: bool = False,
        output_dir: Optional[str] = None,
        logger: Optional[MetricLogger] = None,
        max_duration_hours: float = 147.0,
        image_metric_fns: Optional[Dict[str, Any]] = None,
        resume_from: Optional[str] = None,
    ):
        self.cfg = cfg
        self.pipe = pipe
        self.dm = datamodule
        self.mesh = mesh
        self.view_sharded = view_sharded
        if view_sharded and pipe.mesh is None:
            pipe.mesh = mesh  # route validation generation through shard_map
        # --resume DIR re-enters the given run dir and points the checkpoint
        # manager there, so the restored step is actually found and the
        # resubmitted job keeps appending to the same run (reference
        # train.py:205-209 Trainer.fit(ckpt_path=...) semantics; the r2 bug
        # was minting a fresh timestamped dir here and restoring from it)
        self.resume_from = resume_from
        self._resume_step: Optional[int] = None
        # multi-host: one process per host (mvd_tpu/distributed.py); the
        # primary mints the timestamped run dir and broadcasts it so every
        # process checkpoints into the SAME path (orbax coordinates the
        # multi-host save across processes)
        from ..distributed import broadcast_str, global_batch, is_primary

        self._multiprocess = jax.process_count() > 1
        if self._multiprocess and mesh is None:
            raise ValueError("multi-process training requires a mesh")
        self._put_batch = (
            (lambda b: global_batch(mesh, b)) if self._multiprocess else (lambda b: b)
        )
        if resume_from:
            from ..checkpoint import resolve_resume_path

            ckpt_dir, self._resume_step = resolve_resume_path(resume_from)
            self.dirs = reuse_output_dirs(os.path.dirname(ckpt_dir))
        elif self._multiprocess:
            root = broadcast_str(
                create_output_dirs(output_dir or cfg.output_dir)["root"]
                if is_primary()
                else None
            )
            self.dirs = reuse_output_dirs(root)
        else:
            self.dirs = create_output_dirs(output_dir or cfg.output_dir)
        self.logger = logger or MetricLogger(
            self.dirs["logs"], config={"cfg": str(cfg)}, enabled=is_primary()
        )
        self.max_duration_s = max_duration_hours * 3600

        self.train_loader = datamodule.loader("train")
        self.val_loader = datamodule.loader("val")

        if len(self.train_loader) == 0:
            raise ValueError(
                "train loader is empty (0 batches) — check dataset_path "
                f"(dataset has {len(getattr(self.train_loader, 'ds', []))} "
                "samples; batch_size/views_per_sample may exceed it). "
                "A silent zero-step 'run' would otherwise exit successfully."
            )
        steps_per_epoch = max(1, len(self.train_loader))
        total = cfg.max_steps or steps_per_epoch * cfg.max_epochs
        self.total_steps = total

        tx = make_optimizer(
            cfg.optimizer,
            pipe.params["mvd"],
            total_steps=total,
            train_denoising_unet=cfg.train_denoising_unet,
            grad_accum_steps=cfg.grad_accum_steps,
        )
        self.state = TrainState.create(pipe.params["mvd"], tx)
        self.frozen = {
            "vae": pipe.params["vae"],
            "text_encoder": pipe.params["text_encoder"],
        }
        if self._multiprocess:
            # params/opt state were initialized per-process (identical seed);
            # multi-process jit needs them as global replicated arrays
            from ..distributed import replicate_to_mesh

            self.state = replicate_to_mesh(mesh, self.state)
            self.frozen = replicate_to_mesh(mesh, self.frozen)
        mask = trainable_mask(pipe.params["mvd"], cfg.train_denoising_unet)
        self.logger.log(
            {
                "params/trainable": count_params(pipe.params["mvd"], mask, "trainable"),
                "params/total": count_params(pipe.params["mvd"]),
            },
            step=0,
        )

        from .state import make_lr_schedule

        self._lr_schedule = make_lr_schedule(cfg.optimizer, total)
        self.step_fn = make_train_step(
            pipe, pipe.schedule, cfg, mesh=mesh, view_sharded=view_sharded
        )
        # grad-free eval over (B, V, ...) batches — shard_map'd when the
        # model's view axis is sharded (a bare jitted loss would hit an
        # unbound axis name there)
        self.loss_fn = make_eval_fn(
            pipe, pipe.schedule, cfg, mesh=mesh, view_sharded=view_sharded
        )
        # no-grad in-training metric tower (reference losses.py:209-273 +
        # training.py:250-255), run every cfg.metrics_log_interval steps;
        # image_metric_fns adds perceptual/CLIP tower metrics when weights
        # exist. jit is lazy — never compiled if the interval never fires.
        self.image_metric_fns = image_metric_fns
        self.recon_metrics_fn = make_eval_fn(
            pipe, pipe.schedule, cfg, mesh=mesh, view_sharded=view_sharded,
            with_recon_metrics=True, image_metric_fns=image_metric_fns,
        )

        from ..checkpoint import CheckpointManager

        self.ckpt = CheckpointManager(
            self.dirs["checkpoints"],
            max_to_keep=cfg.max_checkpoints,
            save_interval_steps=cfg.checkpoint_every_steps,
        )

    # ------------------------------------------------------------------
    def resume(self, step: Optional[int] = None) -> bool:
        state, meta = self.ckpt.restore(self.state, step)
        if state is None:
            return False
        if self.mesh is not None:
            # orbax restores arrays COMMITTED to one device; the train step's
            # batch is sharded over the mesh, and jit refuses to mix a
            # committed single-device input with mesh-sharded ones — so
            # replicate the restored state over the mesh explicitly (same
            # placement a fresh init reaches implicitly)
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(self.mesh, PartitionSpec())
            if self._multiprocess:
                # every process restored the full value; assemble the global
                # replicated array from the per-process copies (device_put
                # cannot target non-addressable devices)
                state = jax.tree_util.tree_map(
                    lambda x: jax.make_array_from_process_local_data(
                        repl, np.asarray(x)
                    ),
                    state,
                )
            else:
                state = jax.device_put(state, repl)
        self.state = state
        if meta and meta.get("dataset_state"):
            self.dm.load_state_dict(meta["dataset_state"])
        # experiment-identity recovery: continue the same W&B run
        # (reference train.py:64-103's run-id-from-checkpoint dance)
        if meta and meta.get("wandb_run_id") and self.logger.run_id is None:
            self.logger.run_id = meta["wandb_run_id"]
        return True

    # ------------------------------------------------------------------
    def fit(self, resume: bool = False):
        if resume or self.resume_from:
            restored = self.resume(self._resume_step)
            if not restored and self.resume_from:
                # a requested resume that finds no checkpoint must be LOUD:
                # the elastic chain (scripts/auto_train.sh) depends on this
                # path actually continuing the run, not restarting it
                logger.error(
                    "--resume %s requested but no checkpoint found under %s; "
                    "training starts from step 0 IN THAT RUN DIR",
                    self.resume_from,
                    self.dirs["checkpoints"],
                )
            elif restored:
                logger.info(
                    "resumed from step %d (%s)",
                    int(self.state.step),
                    self.dirs["checkpoints"],
                )
        rng = jax.random.PRNGKey(self.cfg.seed)
        start = time.time()
        step = int(self.state.step)
        last_val: Dict[str, float] = {}
        # a resume that already hit max_steps must not take extra steps
        stop = bool(self.cfg.max_steps and step >= self.cfg.max_steps)
        # fractional val_check_interval validates mid-epoch
        # (reference train.py:197 semantics)
        steps_per_epoch = max(1, len(self.train_loader))
        val_every = (
            max(1, int(steps_per_epoch * self.cfg.val_check_interval))
            if self.cfg.val_check_interval < 1.0
            else None
        )
        trained_any = False
        last_saved_step = -1
        for epoch in range(self.cfg.max_epochs):
            if stop:
                break
            for batch in self.train_loader:
                # multi-host: stitch this process's loader block into the
                # global mesh-sharded batch (no-op single-process)
                batch = self._put_batch(batch)
                rng, step_rng = jax.random.split(rng)
                t0 = time.perf_counter()
                self.state, metrics = self.step_fn(
                    self.state, self.frozen, batch, step_rng
                )
                trained_any = True
                hists = {k: metrics[k] for k in metrics if k.startswith("hist/")}
                metrics = {
                    k: v for k, v in metrics.items() if not k.startswith("hist/")
                }
                step = int(self.state.step)
                if step % self.cfg.log_every_steps == 0:
                    metrics = fetch_metrics(metrics)
                    metrics = {f"train/{k}": v for k, v in metrics.items()}
                    metrics["train/step_time_s"] = time.perf_counter() - t0
                    metrics["train/lr"] = float(self._lr_schedule(step))
                    metrics["epoch"] = epoch
                    self.logger.log(metrics, step=step)
                if (
                    self.cfg.metrics_log_interval
                    and step % self.cfg.metrics_log_interval == 0
                ):
                    # aux reconstruction metrics on the training batch
                    # (reference training.py:250-255)
                    _, rm = self.recon_metrics_fn(
                        self.state.params, self.frozen, batch, step_rng
                    )
                    rm = fetch_metrics(rm)
                    aux = {
                        f"train/{k}": v
                        for k, v in rm.items()
                        if k.startswith(("latent_recon", "pixel_recon", "ssim"))
                        or k in (self.image_metric_fns or {})
                    }
                    self.logger.log(aux, step=step)
                    if hists:
                        # per-group raw-gradient histograms
                        # (reference training.py:603-647)
                        self.logger.log_histograms(
                            {
                                k[len("hist/") :]: np.asarray(v)
                                for k, v in hists.items()
                            },
                            step=step,
                        )
                # val BEFORE save: a save at a step that also validates must
                # carry THAT step's metrics, not the previous val's (the
                # in-loop metric a checkpoint carries is otherwise always one
                # val stale, which skews the top-k ranking)
                if val_every and step % val_every == 0:
                    # a crash/OOM inside the (generation-including) validate
                    # pass at a checkpoint boundary must not also lose the
                    # step's checkpoint — fall back to the previous val's
                    # metrics and keep going to the save below
                    try:
                        last_val = self.validate(epoch, rng)
                    except Exception:
                        logger.exception(
                            "in-loop validation failed at step %d; saving "
                            "with the previous validation's metrics", step,
                        )
                if step % self.cfg.checkpoint_every_steps == 0:
                    if self.ckpt.save(
                        step,
                        self.state,
                        dataset_state=self.dm.state_dict(),
                        extra={"wandb_run_id": self.logger.run_id},
                        metrics=last_val or None,
                    ):
                        last_saved_step = step
                if self.cfg.max_steps and step >= self.cfg.max_steps:
                    stop = True
                    break
                if time.time() - start > self.max_duration_s:
                    stop = True
                    break
            last_val = self.validate(epoch, rng)
        # final checkpoint — skipped when a resume restored a finished run
        # and took zero steps (the state on disk IS this state; re-saving
        # would needlessly delete-and-rewrite the latest step, and an
        # elastic resubmit of a completed run must exit cleanly), and when
        # the in-loop save already wrote THIS step (re-saving would take the
        # delete-then-rewrite path — wasteful, and under multi-host the
        # two managers' delete barriers can desync against the first save's
        # async finalize)
        if max(step, 1) == last_saved_step:
            pass
        elif trained_any or self.ckpt.latest_step() is None:
            self.ckpt.save(
                max(step, 1),
                self.state,
                dataset_state=self.dm.state_dict(),
                extra={"wandb_run_id": self.logger.run_id},
                metrics=last_val or None,
                force=True,
            )
        else:
            logger.info(
                "no training steps taken (resumed at step %d, already "
                "complete); keeping the existing checkpoint", step
            )
        self.ckpt.wait()
        return self.state

    # ------------------------------------------------------------------
    def validate(
        self,
        epoch: int,
        rng,
        max_batches: int = 8,
        generate: bool = True,
        gen_batches: int = 4,
    ) -> Dict[str, float]:
        losses = []
        gen_pool = []
        for i, batch in enumerate(self.val_loader):
            if i >= max_batches:
                break
            if len(gen_pool) < gen_batches:
                gen_pool.append(batch)
            rng, r = jax.random.split(rng)
            loss, m = self.loss_fn(
                self.state.params, self.frozen, self._put_batch(batch), r
            )
            losses.append(float(loss))
        out: Dict[str, float] = {}
        if losses:
            out["val/noise_loss"] = float(np.mean(losses))

        if generate and self._multiprocess:
            # Multi-host: generation runs on the PRIMARY process only, as a
            # host-local pass (the reference renders validation images under
            # DDP per rank and logs rank-0's, training.py:300-343). Params
            # are globally REPLICATED over the mesh (replicate_to_mesh), so
            # process 0 holds a complete addressable copy — fetch it to host
            # and drive the unsharded single-process pipeline on process 0's
            # local gen batches. Other processes skip straight past; they
            # re-synchronize at the next global collective (jit programs over
            # the global mesh are the only cross-process sync points).
            from ..distributed import is_primary

            if is_primary() and gen_pool:
                out.update(self._generation_metrics(gen_pool, epoch, local=True))
            generate = False
        if generate and gen_pool:
            out.update(self._generation_metrics(gen_pool, epoch))
        if out:
            self.logger.log(out, step=int(self.state.step))
        return out

    def _local_pipeline(self):
        """Unsharded, single-process twin of ``self.pipe`` for the primary's
        multi-host generation pass. Same modules/tokenizer/schedule; mesh is
        None and the UNet's view axis is unset so every jit program touches
        only this process's local devices (a global-mesh program would need
        all processes to participate — the old deadlock-shaped reason this
        pass used to be skipped). Cached: jit/program caches live per
        pipeline instance."""
        if getattr(self, "_local_pipe", None) is None:
            import dataclasses

            from ..pipeline import MVDPipeline

            cfg = self.pipe.config
            if cfg.unet.view_axis is not None:
                cfg = dataclasses.replace(
                    cfg, unet=dataclasses.replace(cfg.unet, view_axis=None)
                )
            self._local_pipe = MVDPipeline(
                cfg,
                params=dict(self.pipe.params),
                tokenizer=self.pipe.tokenizer,
                schedule=self.pipe.schedule,
                mesh=None,
            )
        return self._local_pipe

    def _generation_metrics(
        self, batches, epoch: int, local: bool = False
    ) -> Dict[str, float]:
        """20-step generation over the validation batches + comparison PNGs.
        The reference generates per validation batch (training.py:300-394);
        the per-batch metrics are averaged here the same way its epoch-end
        hook does (training.py:719-736).

        ``local=True`` (multi-host primary): fetch the globally-replicated
        params to host (legal process-locally for fully-replicated arrays)
        and generate through the unsharded local pipeline."""
        if local:
            pipe = self._local_pipeline()
            pipe.params = {
                **{k: jax.device_get(v) for k, v in self.frozen.items()},
                "mvd": jax.device_get(self.state.params),
            }
        else:
            pipe = self.pipe
            pipe.params = {**pipe.params, "mvd": self.state.params}
        view_sharded = self.view_sharded and not local
        per_batch = []
        panels = {}
        for bi, batch in enumerate(batches):
            B, V = batch["source_image"].shape[:2]
            # view-sharded generation runs whole (B, V) blocks (shard_map
            # divisibility over the mesh); unsharded keeps the batch small
            n = B * V if view_sharded else min(2, B * V)
            flat = {
                k: np.asarray(v).reshape((-1,) + v.shape[2:])[:n]
                for k, v in batch.items()
            }
            src = (flat["source_image"] + 1) / 2
            res = src.shape[1]
            result = pipe(
                [""] * n,
                num_inference_steps=20,
                guidance_scale=1.0,
                height=res,
                width=res,
                source_camera=flat["source_camera"],
                target_camera=flat["target_camera"],
                source_images=src,
                ref_scale=0.1,
                seed=epoch * 1000 + bi,
            )
            gen = np.asarray(result["images"])  # [0,1]
            tgt = (flat["target_image"] + 1) / 2
            per_batch.append(
                {
                    "val/gen_pixel_mse": float(np.mean((gen - tgt) ** 2)),
                    "val/gen_psnr": float(
                        psnr(jnp.asarray(gen), jnp.asarray(tgt), data_range=1.0)
                    ),
                    "val/gen_ssim": float(
                        ssim(jnp.asarray(gen), jnp.asarray(tgt), data_range=1.0)
                    ),
                }
            )
            if bi == 0:
                for i in range(min(2, n)):
                    sheet = side_by_side([src[i], tgt[i], gen[i]])
                    save_image(
                        sheet,
                        f"{self.dirs['comparisons']}/epoch{epoch:03d}_sample{i}.png",
                    )
                    panels[f"val/comparison_{i}"] = sheet
        m = {
            k: float(np.mean([pb[k] for pb in per_batch])) for k in per_batch[0]
        }
        # W&B image panels (reference training.py:391-394, 503-527)
        self.logger.log_images(panels, step=int(self.state.step))
        return m
