"""Configuration dataclasses for the whole framework.

Mirrors the reference's YAML config surface (reference config/
train_config.yaml) but makes every knob real — the reference has several
dead config keys that are silently overridden in code (scheduler_config
ignored at mvd_unet.py:420-421, snr_gamma hardcoded at losses.py:175,
use_memory_efficient_attention forced True at mvd_unet.py:39); here they all
take effect.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import yaml


@dataclass(frozen=True)
class UNetConfig:
    """SD2.1 UNet2DConditionModel architecture
    (stabilityai/stable-diffusion-2-1 unet/config.json values)."""

    sample_size: int = 96
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    transformer_layers_per_block: int = 1
    # --- framework knobs ---
    attention_impl: str = "auto"  # auto | xla | pallas | int8 (quantized; see kernels/flash_attention.py)
    remat: bool = True  # jax.checkpoint the heavy blocks
    with_adapters: bool = True  # image cross-attention adapters in every attn
    img_ref_scale: float = 0.3  # adapter output scale (attention.py:46)
    # --- joint multi-view attention (north-star extension; reference is
    # pairwise-only, SURVEY §5.7): self-attention over the concatenated
    # (views x tokens) sequence. When ``view_axis`` names a mesh axis (and
    # the model runs under shard_map), K/V rotate around that axis as a ring
    # collective (kernels/ring_attention.py).
    num_views: int = 1
    view_axis: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.block_out_channels[0] // self.num_attention_heads[0]

    def scaled(self, factor: int) -> "UNetConfig":
        """Tiny variant for tests: divide widths by ``factor``."""
        return dataclasses.replace(
            self,
            block_out_channels=tuple(c // factor for c in self.block_out_channels),
            num_attention_heads=tuple(
                max(1, h // factor) for h in self.num_attention_heads
            ),
            cross_attention_dim=self.cross_attention_dim // factor,
            norm_num_groups=max(1, self.norm_num_groups // factor),
        )


TINY_UNET = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64, 64, 64),
    num_attention_heads=(2, 4, 4, 4),
    cross_attention_dim=64,
    norm_num_groups=8,
    remat=False,
)


@dataclass(frozen=True)
class VAEConfig:
    """SD AutoencoderKL (stabilityai/stable-diffusion-2-1 vae/config.json)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    sample_size: int = 768


TINY_VAE = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8, sample_size=64)


@dataclass(frozen=True)
class CLIPTextConfig:
    """OpenCLIP ViT-H/14 text tower as shipped with SD2.1
    (text_encoder/config.json: 23 hidden layers — the penultimate-layer cut
    is baked into the checkpoint)."""

    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_length: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"


TINY_CLIP = CLIPTextConfig(
    vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128
)


@dataclass(frozen=True)
class CameraEncoderConfig:
    """Reference CameraEncoder hyper-parameters (camera_encoder.py:12-105)."""

    output_dim: int = 1024
    hidden_dim: int = 512
    max_freq: float = 10.0
    modulation_strength: float = 0.2
    simple_encoder: bool = False

    @property
    def pos_enc_dim(self) -> int:
        return (self.output_dim // 2) // 3


@dataclass(frozen=True)
class SchedulerConfig:
    """Noise schedule config — a *real* knob here (the reference accepts a
    scheduler_config then hardcodes interpolated/6.0, mvd_unet.py:420-428)."""

    num_train_timesteps: int = 1000
    beta_schedule: str = "scaled_linear"
    beta_start: float = 0.00085
    beta_end: float = 0.012
    prediction_type: str = "v_prediction"
    shift_mode: str = "interpolated"  # none | default | interpolated
    shift_scale: float = 6.0
    sampler: str = "ddpm"  # ddpm | ddim | dpmpp_2m
    steps_offset: int = 1
    timestep_spacing: str = "leading"


@dataclass(frozen=True)
class ModelConfig:
    unet: UNetConfig = field(default_factory=UNetConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    text_encoder: CLIPTextConfig = field(default_factory=CLIPTextConfig)
    camera_encoder: CameraEncoderConfig = field(default_factory=CameraEncoderConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    use_camera_conditioning: bool = True
    use_image_conditioning: bool = True
    # Per-pixel Plücker ray-map conditioning (BASELINE config 3 / north
    # star): target-view rays in the source frame, computed in-jit from the
    # batch's camera tensors and concatenated to the UNet input channels
    # (camera.py:plucker_ray_map). Extra conv_in channels zero-init from
    # converted checkpoints (checkpoint/torch_convert.py:zero_pad_conv_in),
    # so enabling it on pretrained weights is output-preserving at init.
    use_ray_conditioning: bool = False
    ray_fov_deg: float = 54.43  # render rig: 35mm lens, 36mm sensor
    # Initialize adapter q/k/v/out from the frozen base attention at
    # construction (reference attention.py:199-245 semantics). Applies to
    # fresh inits only; checkpoint loads overwrite it either way.
    adapter_init_from_frozen: bool = True
    dtype: str = "bfloat16"  # compute dtype; params always float32


TINY_MODEL = ModelConfig(
    unet=TINY_UNET,
    vae=TINY_VAE,
    text_encoder=TINY_CLIP,
    camera_encoder=CameraEncoderConfig(output_dim=48, hidden_dim=32),
    dtype="float32",
)


@dataclass(frozen=True)
class LossConfig:
    use_snr_loss: bool = True
    snr_gamma: float = 5.0
    # The reference computes F.mse_loss with mean reduction *before* applying
    # per-sample Min-SNR weights, so the weighting collapses to
    # scalar_mse * mean(w) (losses.py:170-192). ``faithful`` reproduces that;
    # ``per_sample`` applies the weights as the Min-SNR paper intends.
    weighting: str = "per_sample"
    # Optional auxiliary feature-matching loss (BASELINE config 5): match the
    # frozen UNet's per-block features of the predicted x0-hat against the
    # target latents' features (train/losses.py:feature_matching_loss).
    # 0.0 (default) keeps the reference objective exactly.
    feature_matching_weight: float = 0.0


@dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-5
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    warmup_fraction: float = 0.05
    schedule: str = "cosine"  # cosine | constant


@dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    batch_size: int = 6
    grad_accum_steps: int = 1
    max_epochs: int = 25
    max_steps: Optional[int] = None
    image_size: int = 768
    num_views: int = 2
    seed: int = 42
    train_denoising_unet: bool = False
    checkpoint_every_steps: int = 1000
    max_checkpoints: int = 3
    val_check_interval: float = 1.0
    metrics_log_interval: int = 50
    # Encode only the UNIQUE source view of each (B, V) view-group in the
    # train step and tile the posterior moments to the V rows — bit-identical
    # latents at 1/V the source-encoder cost (train/step.py:make_loss_fn,
    # the pipeline's _encode_source trick applied to training). No effect at
    # V == 1 or when training from a latent cache.
    unique_source_encode: bool = True
    log_every_steps: int = 1
    output_dir: str = "outputs"
    # parallelism
    mesh_shape: Dict[str, int] = field(default_factory=lambda: {"data": 1, "view": 1, "model": 1})


@dataclass(frozen=True)
class DataConfig:
    dataset_path: str = ""
    # "objaverse" (rendered-zip shards, the reference contract) or "co3d"
    # (CO3D-style real-image multi-view sequence shards, data/co3d.py)
    dataset_format: str = "objaverse"
    image_size: int = 768
    max_views_per_object: int = 8
    dataset_samples: Optional[int] = None
    num_workers: int = 8
    val_split: float = 0.1
    test_split: float = 0.1
    seed: int = 42
    # Precomputed VAE latent-moment cache dir (cli/precompute_latents.py):
    # train batches then carry posterior moments instead of pixels and the
    # train step skips the per-step VAE encode (data/latent_cache.py).
    latent_cache_dir: Optional[str] = None


# ---------------------------------------------------------------------------
# YAML loading (reference train.py:214-224 uses raw yaml.safe_load; here the
# YAML keys of the reference config map onto the dataclasses)
# ---------------------------------------------------------------------------


def _get(cfg: Dict[str, Any], *keys, default=None):
    for k in keys:
        if k in cfg:
            return cfg[k]
    return default


def _apply_overrides(cfg, overrides: Optional[Dict[str, Any]]):
    """Replace dataclass fields from a YAML mapping; lists become tuples
    (dataclass fields are tuples so configs stay hashable). Unknown keys
    raise — a typo'd architecture knob must not silently train the default
    width."""
    if not overrides:
        return cfg
    valid = {f.name for f in dataclasses.fields(cfg)}
    unknown = set(overrides) - valid
    if unknown:
        raise ValueError(
            f"unknown {type(cfg).__name__} override keys: {sorted(unknown)}"
        )
    fixed = {
        k: tuple(v) if isinstance(v, list) else v for k, v in overrides.items()
    }
    return dataclasses.replace(cfg, **fixed)


def train_config_from_yaml(path: str) -> TrainConfig:
    """Load a reference-style YAML (config/train_config.yaml keys) into a
    TrainConfig. Unknown keys are ignored; missing keys keep defaults."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    unet = UNetConfig(
        img_ref_scale=float(_get(raw, "img_ref_scale", default=0.3)),
        with_adapters=bool(_get(raw, "use_image_conditioning", default=True)),
        remat=bool(_get(raw, "enable_gradient_checkpointing", default=True)),
        attention_impl=_get(raw, "attention_impl", default="auto"),
    )
    # Optional architecture overrides: the reference pins widths to whatever
    # HF checkpoint `pretrained_model_name` names (train_config.yaml:6); with
    # no weight downloads here, custom widths are a first-class config
    # surface instead (e.g. config/evidence_256.yaml's mid-width model for
    # the offline view-synthesis experiment). Any UNetConfig/VAEConfig/
    # CLIPTextConfig field may appear under unet_config/vae_config/
    # text_encoder_config; list values become tuples.
    unet = _apply_overrides(unet, raw.get("unet_config"))
    vae = _apply_overrides(VAEConfig(), raw.get("vae_config"))
    text = _apply_overrides(CLIPTextConfig(), raw.get("text_encoder_config"))
    cam = CameraEncoderConfig(
        output_dim=int(_get(raw, "camera_embedding_dim", "cam_output_dim", default=1024)),
        hidden_dim=int(_get(raw, "camera_hidden_dim", "cam_hidden_dim", default=512)),
        modulation_strength=float(_get(raw, "cam_modulation_strength", default=0.2)),
        simple_encoder=bool(_get(raw, "simple_cam_encoder", default=False)),
    )
    sch_raw = raw.get("scheduler_config", {}) or {}
    sched = SchedulerConfig(
        shift_mode=sch_raw.get("shift_mode", "interpolated"),
        shift_scale=float(sch_raw.get("shift_scale", 6.0)),
        prediction_type=sch_raw.get("prediction_type", "v_prediction"),
        sampler=sch_raw.get("sampler", "ddpm"),
    )
    loss_raw = raw.get("loss_config", {}) or {}
    loss = LossConfig(
        use_snr_loss=bool(loss_raw.get("use_snr_loss", True)),
        snr_gamma=float(loss_raw.get("snr_gamma", 5.0)),
        weighting=loss_raw.get("weighting", "per_sample"),
        feature_matching_weight=float(loss_raw.get("feature_matching_weight", 0.0)),
    )
    opt = OptimizerConfig(
        learning_rate=float(_get(raw, "learning_rate", "lr", default=1e-5)),
        max_grad_norm=float(_get(raw, "max_grad_norm", default=1.0)),
    )
    if text.hidden_size != unet.cross_attention_dim:
        raise ValueError(
            f"text_encoder_config.hidden_size ({text.hidden_size}) must equal "
            f"unet_config.cross_attention_dim ({unet.cross_attention_dim}) — "
            "the text context feeds the UNet cross-attention directly"
        )
    model = ModelConfig(
        unet=unet,
        vae=vae,
        text_encoder=text,
        camera_encoder=cam,
        scheduler=sched,
        use_camera_conditioning=bool(_get(raw, "use_camera_conditioning", default=True)),
        use_image_conditioning=bool(_get(raw, "use_image_conditioning", default=True)),
        use_ray_conditioning=bool(_get(raw, "use_ray_conditioning", default=False)),
        ray_fov_deg=float(_get(raw, "ray_fov_deg", default=54.43)),
        dtype="float32" if str(_get(raw, "precision", default="16")) == "32" else "bfloat16",
    )
    return TrainConfig(
        model=model,
        loss=loss,
        optimizer=opt,
        batch_size=int(_get(raw, "batch_size", default=6)),
        grad_accum_steps=int(_get(raw, "accumulate_grad_batches", default=1)),
        max_epochs=int(_get(raw, "max_epochs", "num_epochs", default=25)),
        image_size=int(_get(raw, "image_size", default=768)),
        seed=int(_get(raw, "seed", default=42)),
        train_denoising_unet=bool(_get(raw, "train_denoising_unet", default=False)),
        checkpoint_every_steps=int(_get(raw, "checkpoint_every_steps", default=1000)),
        max_checkpoints=int(_get(raw, "max_checkpoints", default=3)),
        val_check_interval=float(_get(raw, "val_check_interval", default=1.0)),
        metrics_log_interval=int(_get(raw, "metrics_log_interval", default=50)),
    )


def data_config_from_yaml(path: str) -> DataConfig:
    """Dataset knobs from the same YAML (reference train.py reads
    dataset_samples / max_views_per_object from its config — e.g.
    train_config_all.yaml caps the corpus at 20k samples)."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    samples = _get(raw, "dataset_samples", default=None)
    return DataConfig(
        dataset_path=str(_get(raw, "dataset_path", default="") or ""),
        dataset_format=str(_get(raw, "dataset_format", default="objaverse")),
        image_size=int(_get(raw, "image_size", default=768)),
        max_views_per_object=int(_get(raw, "max_views_per_object", default=8)),
        dataset_samples=None if samples is None else int(samples),
        num_workers=int(_get(raw, "num_workers", default=8)),
        seed=int(_get(raw, "seed", default=42)),
        latent_cache_dir=_get(raw, "latent_cache_dir", default=None),
    )
