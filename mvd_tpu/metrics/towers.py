"""Pretrained-tower metrics: VGG16 perceptual, LPIPS, CLIP image score.

Rebuild of the reference metric bank that rides on pretrained nets:
  * VGG-16 perceptual loss over ``features[:29]`` (through conv5_3, no final
    relu) with ImageNet normalization (reference src/training/losses.py:21-56),
  * LPIPS (vgg and alex variants): unit-normalized per-level features,
    learned 1x1 heads, spatial mean (reference val.py:84 uses lpips(alex)),
  * CLIP image-image similarity (reference losses.py:59-98 feeds two image
    batches through torchmetrics' CLIPScore).

This environment has no model zoo (zero egress), so every tower is an
architecture + a torch-state-dict converter; ``*_from_torch`` loads weights
when a state dict file is supplied and every metric object exposes
``.available``. The val harness treats missing towers as absent metrics —
same graceful degradation the reference applies when CLIP/FID throw
(losses.py:59-125).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.traverse_util import unflatten_dict

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# torchvision vgg16.features conv indices and channels
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
             512, 512, 512]
ALEX_CFG: List[Tuple[int, int, int, int]] = [  # (out_ch, kernel, stride, pad)
    (64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1)
]


class VGG16Features(nn.Module):
    """torchvision VGG16 ``features`` trunk emitting the per-block relu
    outputs (relu1_2 ... relu5_3) plus the final conv5_3 pre-relu map the
    reference's PerceptualLoss consumes (losses.py:21-56 / features[:29])."""

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        feats = {}
        conv_i = 0
        block, in_block = 1, 1
        for c in VGG16_CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                block += 1
                in_block = 1
                continue
            x = nn.Conv(c, (3, 3), padding=1, name=f"conv_{conv_i}")(x)
            conv_i += 1
            feats[f"conv{block}_{in_block}"] = x
            x = nn.relu(x)
            feats[f"relu{block}_{in_block}"] = x
            in_block += 1
        return feats


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet ``features`` trunk (LPIPS-alex backbone)."""

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        feats = {}
        for i, (c, k, s, p) in enumerate(ALEX_CFG):
            x = nn.Conv(c, (k, k), strides=(s, s), padding=p, name=f"conv_{i}")(x)
            x = nn.relu(x)
            feats[f"relu_{i}"] = x
            if i in (0, 1):
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


def _imagenet_norm(x_m1_1: jnp.ndarray) -> jnp.ndarray:
    x01 = x_m1_1 * 0.5 + 0.5
    return (x01 - IMAGENET_MEAN) / IMAGENET_STD


class PerceptualLoss:
    """VGG-16 feature MSE (reference losses.py:21-56)."""

    def __init__(self, params: Optional[Dict] = None):
        self.model = VGG16Features()
        self.params = params

    @property
    def available(self) -> bool:
        return self.params is not None

    def __call__(self, a_m1_1: jnp.ndarray, b_m1_1: jnp.ndarray) -> jnp.ndarray:
        fa = self.model.apply(self.params, _imagenet_norm(a_m1_1))["conv5_3"]
        fb = self.model.apply(self.params, _imagenet_norm(b_m1_1))["conv5_3"]
        return jnp.mean((fa - fb) ** 2)


LPIPS_VGG_LAYERS = ("relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3")
LPIPS_ALEX_LAYERS = ("relu_0", "relu_1", "relu_2", "relu_3", "relu_4")
# LPIPS input scaling (Zhang et al. official implementation)
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    """Learned perceptual distance; ``net`` in {vgg, alex}."""

    def __init__(self, net: str = "alex", backbone_params: Optional[Dict] = None,
                 lin_weights: Optional[Dict[str, np.ndarray]] = None):
        self.net = net
        self.model = AlexNetFeatures() if net == "alex" else VGG16Features()
        self.layers = LPIPS_ALEX_LAYERS if net == "alex" else LPIPS_VGG_LAYERS
        self.backbone_params = backbone_params
        self.lin_weights = lin_weights  # layer -> (C,) nonneg weights

    @property
    def available(self) -> bool:
        return self.backbone_params is not None and self.lin_weights is not None

    def _feats(self, x_m1_1):
        x = (x_m1_1 - LPIPS_SHIFT) / LPIPS_SCALE
        return self.model.apply(self.backbone_params, x)

    def __call__(self, a, b) -> jnp.ndarray:
        fa, fb = self._feats(a), self._feats(b)
        total = 0.0
        for layer in self.layers:
            xa, xb = fa[layer], fb[layer]
            na = xa / jnp.sqrt(jnp.sum(xa**2, -1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb**2, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = jnp.asarray(self.lin_weights[layer])
            total = total + jnp.mean(jnp.sum(d * w, axis=-1))
        return total


# ---------------------------------------------------------------------------
# CLIP vision tower + image-image score
# ---------------------------------------------------------------------------


class CLIPVisionEncoder(nn.Module):
    """transformers CLIPVisionModel-compatible ViT (pre-LN)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 224
    projection_dim: int = 768
    hidden_act: str = "gelu"  # laion CLIP-H; "quick_gelu" for OpenAI CLIP-L

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels (B, H, W, 3) CLIP-normalized -> projected embedding."""
        from ..config import CLIPTextConfig
        from ..nn.clip_text import CLIPLayer

        B = pixels.shape[0]
        patches = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            name="patch_embedding",
        )(pixels)
        seq = patches.reshape(B, -1, self.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.hidden_size,)
        )
        x = jnp.concatenate([jnp.tile(cls[None, None], (B, 1, 1)), seq], axis=1)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (x.shape[1], self.hidden_size),
        )
        x = x + pos[None]
        x = nn.LayerNorm(name="pre_layernorm")(x)
        cfg = CLIPTextConfig(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            hidden_act=self.hidden_act,
        )
        mask = jnp.zeros((1, 1, x.shape[1], x.shape[1]), jnp.float32)
        for i in range(self.num_layers):
            x = CLIPLayer(cfg, name=f"layers_{i}")(x, mask)
        pooled = nn.LayerNorm(name="post_layernorm")(x[:, 0])
        return nn.Dense(self.projection_dim, use_bias=False, name="visual_projection")(
            pooled
        )


CLIP_PIXEL_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_PIXEL_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPImageScore:
    """Image-image cosine similarity x100 (reference losses.py:59-98)."""

    def __init__(self, params: Optional[Dict] = None, **arch_kwargs):
        self.model = CLIPVisionEncoder(**arch_kwargs)
        self.params = params

    @property
    def available(self) -> bool:
        return self.params is not None

    def embed(self, images01: jnp.ndarray) -> jnp.ndarray:
        size = self.model.image_size
        x = jax.image.resize(
            images01, (images01.shape[0], size, size, 3), "bilinear"
        )
        x = (x - CLIP_PIXEL_MEAN) / CLIP_PIXEL_STD
        e = self.model.apply(self.params, x)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    def __call__(self, a01: jnp.ndarray, b01: jnp.ndarray) -> jnp.ndarray:
        ea, eb = self.embed(a01), self.embed(b01)
        return 100.0 * jnp.mean(jnp.sum(ea * eb, axis=-1))


# ---------------------------------------------------------------------------
# torch state-dict converters
# ---------------------------------------------------------------------------


def vgg16_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg16 ``features.N.{weight,bias}`` -> VGG16Features."""
    out = {}
    conv_idx = {}  # torchvision layer index -> our conv_i
    i = 0
    tv = 0
    for c in VGG16_CFG:
        if c == "M":
            tv += 1
            continue
        conv_idx[tv] = i
        i += 1
        tv += 2  # conv + relu
    for key, val in sd.items():
        m = re.match(r"(?:features\.)?(\d+)\.(weight|bias)", key)
        if not m:
            continue
        tv_i, leaf = int(m.group(1)), m.group(2)
        if tv_i not in conv_idx:
            continue
        name = f"conv_{conv_idx[tv_i]}"
        val = np.asarray(val)
        if leaf == "weight":
            out[(name, "kernel")] = val.transpose(2, 3, 1, 0)
        else:
            out[(name, "bias")] = val
    return {"params": unflatten_dict(out)}


def lpips_lins_from_torch(sd: Dict[str, np.ndarray], net: str = "alex") -> Dict[str, np.ndarray]:
    """lpips package ``lin{i}.model.1.weight`` (C,1,1,1?) -> layer->(C,)."""
    layers = LPIPS_ALEX_LAYERS if net == "alex" else LPIPS_VGG_LAYERS
    out = {}
    for key, val in sd.items():
        m = re.match(r"lins?\.?(\d+)\.model\.1\.weight", key) or re.match(
            r"lin(\d+)\.model\.1\.weight", key
        )
        if m:
            i = int(m.group(1))
            if i < len(layers):
                out[layers[i]] = np.asarray(val).reshape(-1)
    return out


def clip_arch_from_sd(sd: Dict[str, np.ndarray]) -> Dict[str, int]:
    """Infer the CLIP vision architecture from a transformers
    CLIPVisionModelWithProjection state dict, so load_towers builds the
    RIGHT tower for whatever weights it is given — laion CLIP-H
    (hidden 1280, head_dim 80, gelu, proj 1024) vs OpenAI CLIP-L
    (hidden 1024, head_dim 64, quick_gelu, proj 768) differ in every one of
    those, and the reference consumes CLIP through torchmetrics' default
    (reference src/training/losses.py:59-98, val.py:84-104) where the
    checkpoint determines the architecture.

    Everything but the head count and activation is directly visible in the
    shapes; those two follow the family convention (laion H-family uses
    80-dim heads + exact gelu; OpenAI B/L use 64-dim heads + quick_gelu),
    keyed on whether the width divides into 80-dim heads.
    """
    sd = {k.replace("vision_model.", ""): np.asarray(v) for k, v in sd.items()}
    hidden = int(sd["embeddings.class_embedding"].shape[0])
    patch = int(sd["embeddings.patch_embedding.weight"].shape[2])
    num_pos = int(sd["embeddings.position_embedding.weight"].shape[0])
    image = patch * int(round((num_pos - 1) ** 0.5))
    layer_ids = [
        int(m.group(1))
        for m in (re.match(r"encoder\.layers\.(\d+)\.", k) for k in sd)
        if m
    ]
    fc1 = next(v for k, v in sd.items() if k.endswith("layers.0.mlp.fc1.weight"))
    proj = int(sd["visual_projection.weight"].shape[0])
    h_family = hidden % 80 == 0
    return {
        "hidden_size": hidden,
        "num_layers": max(layer_ids) + 1,
        "num_heads": hidden // (80 if h_family else 64),
        "intermediate_size": int(np.asarray(fc1).shape[0]),
        "patch_size": patch,
        "image_size": image,
        "projection_dim": proj,
        "hidden_act": "gelu" if h_family else "quick_gelu",
    }


def clip_vision_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """transformers CLIPVisionModelWithProjection state dict -> params."""
    out = {}
    for key, val in sd.items():
        val = np.asarray(val)
        k = key.replace("vision_model.", "")
        if k == "embeddings.class_embedding":
            out[("class_embedding",)] = val
        elif k == "embeddings.patch_embedding.weight":
            out[("patch_embedding", "kernel")] = val.transpose(2, 3, 1, 0)
        elif k == "embeddings.position_embedding.weight":
            out[("position_embedding",)] = val
        elif k.startswith("pre_layrnorm") or k.startswith("pre_layernorm"):
            leaf = "scale" if k.endswith("weight") else "bias"
            out[("pre_layernorm", leaf)] = val
        elif k.startswith("post_layernorm"):
            leaf = "scale" if k.endswith("weight") else "bias"
            out[("post_layernorm", leaf)] = val
        elif k == "visual_projection.weight":
            out[("visual_projection", "kernel")] = val.T
        else:
            m = re.match(r"encoder\.layers\.(\d+)\.(.*)", k)
            if not m:
                continue
            i, rest = m.group(1), m.group(2).replace("mlp.", "")
            parts = rest.split(".")
            leaf = parts[-1]
            if leaf == "weight":
                leaf, val = ("kernel", val.T) if val.ndim == 2 else ("scale", val)
            out[(f"layers_{i}",) + tuple(parts[:-1]) + (leaf,)] = val
    return {"params": unflatten_dict(out)}
