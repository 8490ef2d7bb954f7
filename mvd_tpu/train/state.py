"""Train state: masked AdamW + cosine warmup + grad clip.

The functional replacement for the reference's freeze policy
(training.py:53-93: freeze VAE/text/base-UNet, unfreeze adapter processors +
camera encoder) and optimizer setup (training.py:398-438: AdamW over
requires_grad params, betas (0.9,0.999), wd 0.01, cosine schedule with 5%
warmup, per-step). Freezing is a parameter-tree partition: trainable leaves
get AdamW, frozen leaves get ``set_to_zero`` — no ``find_unused_parameters``
machinery needed (SURVEY §5.8).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

from ..config import OptimizerConfig

TRAINABLE_MARKERS = ("adapter_self", "adapter_cross", "camera_encoder")


def trainable_mask(
    params: Dict[str, Any], train_denoising_unet: bool = False
) -> Dict[str, Any]:
    """Pytree of {'trainable','frozen'} labels mirroring ``params``.

    Trainable: adapter projections (reference training.py:68-84) and the
    camera encoder incl. FiLM modulators (training.py:91-93); plus the whole
    UNet when ``train_denoising_unet`` (training.py:60-65)."""
    flat = flatten_dict(params)
    out = {}
    for path in flat:
        parts = [str(p) for p in path]
        is_adapter = any(m in parts for m in ("adapter_self", "adapter_cross"))
        is_camera = "camera_encoder" in parts
        is_image_encoder = "image_encoder_unet" in parts
        if is_adapter or is_camera:
            out[path] = "trainable"
        elif train_denoising_unet and not is_image_encoder:
            out[path] = "trainable"
        else:
            out[path] = "frozen"
    return unflatten_dict(out)


def count_params(params, mask=None, label="trainable") -> int:
    if mask is None:
        return sum(x.size for x in jax.tree_util.tree_leaves(params))
    flat_p = flatten_dict(params)
    flat_m = flatten_dict(mask)
    return sum(v.size for k, v in flat_p.items() if flat_m[k] == label)


def make_lr_schedule(
    cfg: OptimizerConfig, total_steps: int
) -> optax.Schedule:
    warmup = max(1, int(cfg.warmup_fraction * total_steps))
    if cfg.schedule == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, warmup),
             optax.constant_schedule(cfg.learning_rate)],
            [warmup],
        )
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),
        end_value=0.0,
    )


def make_optimizer(
    cfg: OptimizerConfig,
    params: Dict[str, Any],
    total_steps: int,
    train_denoising_unet: bool = False,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    mask = trainable_mask(params, train_denoising_unet)
    lr = make_lr_schedule(cfg, total_steps)
    adamw = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=lr,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
        ),
    )
    if grad_accum_steps > 1:
        # inside the trainable branch so the accumulators cover only the
        # params that actually train (~119M), not the full tree with its
        # ~866M frozen leaves whose grads are structurally zero
        adamw = optax.MultiSteps(adamw, every_k_schedule=grad_accum_steps)
    return optax.multi_transform(
        {"trainable": adamw, "frozen": optax.set_to_zero()}, mask
    )


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (flax.training.TrainState-alike, kept
    local so checkpoint layout is under our control)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )
