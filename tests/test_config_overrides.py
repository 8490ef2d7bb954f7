"""YAML architecture overrides (unet_config / vae_config /
text_encoder_config sections) — the offline substitute for the reference's
pretrained_model_name-derived widths (reference train_config.yaml:6)."""

import pytest

from mvd_tpu.config import train_config_from_yaml


def _write(tmp_path, body):
    p = tmp_path / "cfg.yaml"
    p.write_text(body)
    return str(p)


def test_overrides_apply(tmp_path):
    cfg = train_config_from_yaml(
        _write(
            tmp_path,
            """
unet_config:
  block_out_channels: [64, 128, 128, 128]
  num_attention_heads: [1, 2, 2, 2]
  cross_attention_dim: 256
vae_config:
  block_out_channels: [32, 64, 64, 64]
  scaling_factor: 0.5
text_encoder_config:
  hidden_size: 256
  num_layers: 2
""",
        )
    )
    assert cfg.model.unet.block_out_channels == (64, 128, 128, 128)
    assert cfg.model.unet.cross_attention_dim == 256
    assert cfg.model.vae.scaling_factor == 0.5
    assert cfg.model.text_encoder.num_layers == 2


def test_unknown_key_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown UNetConfig override"):
        train_config_from_yaml(
            _write(tmp_path, "unet_config:\n  block_out_chanels: [64, 64, 64, 64]\n")
        )


def test_text_width_mismatch_raises(tmp_path):
    with pytest.raises(ValueError, match="cross_attention_dim"):
        train_config_from_yaml(
            _write(tmp_path, "text_encoder_config:\n  hidden_size: 256\n")
        )


def test_evidence_configs_load():
    a = train_config_from_yaml("config/evidence_256.yaml")
    b = train_config_from_yaml("config/evidence_256_nocam.yaml")
    assert a.model.use_camera_conditioning and not b.model.use_camera_conditioning
    # the ablated twin must be otherwise identical
    import dataclasses

    assert dataclasses.replace(
        a.model, use_camera_conditioning=False
    ) == b.model
    assert a.train_denoising_unet and b.train_denoising_unet
    assert a.model.unet.head_dim == 64  # flash kernel sweet spot


def test_no_override_sections_keep_defaults(tmp_path):
    cfg = train_config_from_yaml(_write(tmp_path, "learning_rate: 2.0e-5\n"))
    assert cfg.model.unet.block_out_channels == (320, 640, 1280, 1280)
    assert cfg.model.vae.block_out_channels == (128, 256, 512, 512)
    assert cfg.optimizer.learning_rate == 2.0e-5
