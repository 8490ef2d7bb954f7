"""Tokenizer (BPE with synthetic vocab + hash fallback) and YAML config tests."""

import json
import os

import numpy as np

from mvd_tpu.config import train_config_from_yaml
from mvd_tpu.data.tokenizer import CLIPBPETokenizer, HashTokenizer, load_tokenizer


def test_hash_tokenizer_contract():
    tok = HashTokenizer()
    out = tok(["a red chair", "a red chair", "blue table"])
    assert out.shape == (3, 77)
    np.testing.assert_array_equal(out[0], out[1])  # deterministic
    assert not np.array_equal(out[0], out[2])
    assert out[0, 0] == tok.bos
    assert out[0, -1] == tok.eos
    assert (out < tok.vocab_size).all()


def test_bpe_tokenizer_with_synthetic_vocab(tmp_path):
    byte_vocab = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    vocab = {}
    for ch in byte_vocab:
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    merges = ["c h", "ch a", "cha i", "chai r</w>"]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vpath = tmp_path / "vocab.json"
    mpath = tmp_path / "merges.txt"
    vpath.write_text(json.dumps(vocab))
    mpath.write_text("#version\n" + "\n".join(merges))

    tok = CLIPBPETokenizer(str(vpath), str(mpath), max_length=16)
    ids = tok("Chair")  # lowercased, merges collapse to one token
    assert ids.shape == (1, 16)
    assert ids[0, 0] == vocab["<|startoftext|>"]
    assert ids[0, 1] == vocab["chair</w>"]
    assert ids[0, 2] == vocab["<|endoftext|>"]


def test_load_tokenizer_fallback(tmp_path):
    tok = load_tokenizer(str(tmp_path))  # no vocab files -> hash
    assert isinstance(tok, HashTokenizer)


def test_yaml_config_roundtrip(tmp_path):
    cfg = train_config_from_yaml("config/train_config.yaml")
    assert cfg.model.scheduler.shift_mode == "interpolated"
    assert cfg.model.scheduler.shift_scale == 6.0
    assert cfg.loss.snr_gamma == 5.0
    assert cfg.optimizer.learning_rate == 1e-5
    assert cfg.batch_size == 6
    assert cfg.image_size == 768
    assert cfg.model.camera_encoder.output_dim == 1024
    assert not cfg.train_denoising_unet
    assert cfg.model.dtype == "bfloat16"


def test_yaml_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "learning_rate: 0.001\nbatch_size: 2\nprecision: '32'\n"
        "scheduler_config:\n  shift_mode: none\n  sampler: ddim\n"
        "loss_config:\n  weighting: faithful\n"
    )
    cfg = train_config_from_yaml(str(p))
    assert cfg.optimizer.learning_rate == 0.001
    assert cfg.model.scheduler.shift_mode == "none"
    assert cfg.model.scheduler.sampler == "ddim"
    assert cfg.loss.weighting == "faithful"
    assert cfg.model.dtype == "float32"
