"""CLIP vision tower parity vs an independent torch reimplementation —
the VGG/LPIPS/Inception treatment (tests/test_towers_parity.py,
tests/test_inception.py) extended to the last unchecked tower (VERDICT r3
weak #5). A minimal torch CLIPVisionModelWithProjection (transformers key
layout, written here from the architecture definition, not from
transformers code) is exported as a state dict, loaded through the REAL
``metrics/load_towers.py`` path (which now infers the architecture from the
shapes), and compared end-to-end: projected embeddings ≥60 dB and the
CLIPImageScore value itself. Both family wirings are pinned: H-style
(80-dim heads, exact gelu) and OpenAI-L-style (64-dim heads, quick_gelu).
Reference consumers: src/training/losses.py:59-98, val.py:84-104.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from mvd_tpu.metrics.load_towers import load_towers
from mvd_tpu.metrics.towers import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD, clip_arch_from_sd
from tests.test_torch_layer_parity import snr_db

torch.manual_seed(7)


class TorchCLIPVision(tnn.Module):
    """transformers CLIPVisionModelWithProjection forward, reimplemented."""

    def __init__(self, hidden, layers, heads, inter, patch, image, proj, act):
        super().__init__()
        self.heads = heads
        self.act = act
        self.patch_embedding = tnn.Conv2d(3, hidden, patch, stride=patch, bias=False)
        self.class_embedding = tnn.Parameter(torch.randn(hidden) * 0.02)
        n_pos = 1 + (image // patch) ** 2
        self.position_embedding = tnn.Embedding(n_pos, hidden)
        self.pre_layrnorm = tnn.LayerNorm(hidden)
        self.layers = tnn.ModuleList()
        for _ in range(layers):
            blk = tnn.Module()
            blk.layer_norm1 = tnn.LayerNorm(hidden)
            blk.layer_norm2 = tnn.LayerNorm(hidden)
            attn = tnn.Module()
            for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                setattr(attn, n, tnn.Linear(hidden, hidden))
            blk.self_attn = attn
            mlp = tnn.Module()
            mlp.fc1 = tnn.Linear(hidden, inter)
            mlp.fc2 = tnn.Linear(inter, hidden)
            blk.mlp = mlp
            self.layers.append(blk)
        self.post_layernorm = tnn.LayerNorm(hidden)
        self.visual_projection = tnn.Linear(hidden, proj, bias=False)

    def _attn(self, blk, x):
        B, S, D = x.shape
        h = self.heads
        hd = D // h
        q = blk.self_attn.q_proj(x) * hd**-0.5
        k = blk.self_attn.k_proj(x)
        v = blk.self_attn.v_proj(x)
        split = lambda t: t.view(B, S, h, hd).transpose(1, 2)
        w = torch.softmax(split(q) @ split(k).transpose(-1, -2), dim=-1)
        out = (w @ split(v)).transpose(1, 2).reshape(B, S, D)
        return blk.self_attn.out_proj(out)

    def _mlp(self, blk, x):
        h = blk.mlp.fc1(x)
        if self.act == "quick_gelu":
            h = h * torch.sigmoid(1.702 * h)
        else:
            h = F.gelu(h, approximate="none")
        return blk.mlp.fc2(h)

    def forward(self, pixels):  # (B, 3, H, W), CLIP-normalized
        B = pixels.shape[0]
        patches = self.patch_embedding(pixels).flatten(2).transpose(1, 2)
        cls = self.class_embedding.expand(B, 1, -1)
        x = torch.cat([cls, patches], dim=1)
        x = x + self.position_embedding.weight[None]
        x = self.pre_layrnorm(x)
        for blk in self.layers:
            x = x + self._attn(blk, self.layer_norm1_of(blk, x))
            x = x + self._mlp(blk, self.layer_norm2_of(blk, x))
        pooled = self.post_layernorm(x[:, 0])
        return self.visual_projection(pooled)

    @staticmethod
    def layer_norm1_of(blk, x):
        return blk.layer_norm1(x)

    @staticmethod
    def layer_norm2_of(blk, x):
        return blk.layer_norm2(x)

    def transformers_state_dict(self):
        """Rename to the transformers checkpoint key layout."""
        out = {}
        sd = self.state_dict()
        for k, v in sd.items():
            if k == "class_embedding":
                out["vision_model.embeddings.class_embedding"] = v
            elif k.startswith("patch_embedding"):
                out["vision_model.embeddings." + k] = v
            elif k.startswith("position_embedding"):
                out["vision_model.embeddings." + k] = v
            elif k.startswith("pre_layrnorm") or k.startswith("post_layernorm"):
                out["vision_model." + k] = v
            elif k.startswith("visual_projection"):
                out[k] = v
            else:  # layers.N.... -> vision_model.encoder.layers.N....
                out["vision_model.encoder." + k] = v
        return out


ARCHS = {
    # family-style minis: H-style = 80-dim heads + gelu, L-style = 64-dim
    # heads + quick_gelu (widths reduced for CPU; wiring is what's tested)
    "h_style": dict(hidden=160, layers=2, heads=2, inter=320, patch=14, image=28, proj=128, act="gelu"),
    "l_style": dict(hidden=128, layers=2, heads=2, inter=256, patch=14, image=28, proj=96, act="quick_gelu"),
}


@pytest.mark.parametrize("family", sorted(ARCHS))
def test_clip_vision_parity(tmp_path, family):
    arch = ARCHS[family]
    model = TorchCLIPVision(**arch).eval()
    sd = model.transformers_state_dict()
    path = tmp_path / "clip.pt"
    torch.save(sd, path)

    # architecture inference from the shapes alone
    got = clip_arch_from_sd({k: v.numpy() for k, v in sd.items()})
    assert got == {
        "hidden_size": arch["hidden"],
        "num_layers": arch["layers"],
        "num_heads": arch["heads"],
        "intermediate_size": arch["inter"],
        "patch_size": arch["patch"],
        "image_size": arch["image"],
        "projection_dim": arch["proj"],
        "hidden_act": arch["act"],
    }

    towers = load_towers(clip_vision_weights=str(path))
    clip = towers["clip"]
    assert clip.available

    # images already at model resolution -> embed()'s resize is identity,
    # so the comparison pins the tower itself, not resize kernels
    rng = np.random.default_rng(3)
    a01 = rng.uniform(0, 1, (2, arch["image"], arch["image"], 3)).astype(np.float32)
    b01 = rng.uniform(0, 1, (2, arch["image"], arch["image"], 3)).astype(np.float32)

    def t_embed(x01):
        x = (x01 - CLIP_PIXEL_MEAN) / CLIP_PIXEL_STD
        with torch.no_grad():
            e = model(torch.from_numpy(x).permute(0, 3, 1, 2))
        e = e.numpy()
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    ej = np.asarray(clip.embed(jnp.asarray(a01)))
    et = t_embed(a01)
    db = snr_db(et, ej)
    assert db >= 60, f"{family} embedding parity {db:.1f} dB < 60"

    want = float(100.0 * np.mean(np.sum(t_embed(a01) * t_embed(b01), axis=-1)))
    got_score = float(clip(jnp.asarray(a01), jnp.asarray(b01)))
    assert math.isfinite(got_score)
    assert abs(got_score - want) < 1e-2, f"{family} CLIP score {got_score} vs {want}"
