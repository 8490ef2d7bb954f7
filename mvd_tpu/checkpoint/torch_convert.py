"""Torch <-> JAX weight conversion.

Converts the reference's PyTorch Lightning checkpoints (and the underlying
diffusers/transformers state dicts) into this framework's param pytrees, and
back. Reproduces the reference's own loading semantics
(infer.py:46-74, duplicated at val.py:241-277):

  * strip the Lightning ``unet.`` prefix,
  * ``image_encoder.*`` -> ``image_encoder.unet.*`` remap,
  * adapter (attention-processor) weights live at
    ``...attn{1,2}.processor.to_{q,k,v}_ref`` / ``to_out_ref.0``,
  * ``strict=False`` tolerance: unknown keys are collected and reported,
    not fatal.

Layout transforms (NCHW torch -> NHWC flax):
  conv weight (O,I,kh,kw) -> kernel (kh,kw,I,O); linear weight (O,I) ->
  kernel (I,O); {Group,Layer}Norm weight -> scale; embeddings stay.

The reference's camera-encoder translation projection is resampled randomly
every forward (camera_encoder.py:153-156) so the torch checkpoint has no
weight for it; the converted model keeps its init-time parameter
(a documented deviation — see nn/camera_encoder.py).

Works on plain dict[str, numpy] state dicts, so torch is only needed to
``torch.load`` the .ckpt file (convert_lightning_checkpoint).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# ---------------------------------------------------------------------------
# key translation: diffusers UNet -> mvd_tpu UNet2DCondition
# ---------------------------------------------------------------------------

_UNET_BLOCK_RULES = [
    (r"^down_blocks\.(\d+)\.resnets\.(\d+)\.", r"down_\1_resnet_\2."),
    (r"^down_blocks\.(\d+)\.attentions\.(\d+)\.", r"down_\1_attn_\2."),
    (r"^down_blocks\.(\d+)\.downsamplers\.0\.conv\.", r"down_\1_downsample.conv."),
    (r"^up_blocks\.(\d+)\.resnets\.(\d+)\.", r"up_\1_resnet_\2."),
    (r"^up_blocks\.(\d+)\.attentions\.(\d+)\.", r"up_\1_attn_\2."),
    (r"^up_blocks\.(\d+)\.upsamplers\.0\.conv\.", r"up_\1_upsample.conv."),
    (r"^mid_block\.resnets\.(\d+)\.", r"mid_resnet_\1."),
    (r"^mid_block\.attentions\.(\d+)\.", r"mid_attn_\1."),
]

_INNER_RULES = [
    # Transformer2DModel
    (r"\.transformer_blocks\.(\d+)\.", r".transformer_blocks_\1."),
    (r"\.attn1\.processor\.", r".adapter_self."),
    (r"\.attn2\.processor\.", r".adapter_cross."),
    (r"\.to_out_ref\.0\.", r".to_out_ref."),
    (r"\.to_out\.0\.", r".to_out."),
    (r"\.ff\.net\.0\.proj\.", r".ff.proj_geglu."),
    (r"\.ff\.net\.2\.", r".ff.proj_out."),
]

_GROUPNORM_NAMES = {"norm", "norm1", "norm2", "conv_norm_out", "group_norm"}
_LAYERNORM_HINTS = ("layer_norm", "ln_", "output_norm", "final_layer_norm")


def _translate_unet_key(key: str) -> Optional[str]:
    for pat, rep in _UNET_BLOCK_RULES:
        key = re.sub(pat, rep, key)
    for pat, rep in _INNER_RULES:
        key = re.sub(pat, rep, key)
    return key


def _is_groupnorm(parts) -> bool:
    return len(parts) >= 2 and parts[-2] in _GROUPNORM_NAMES


def _is_layernorm(parts, tensor) -> bool:
    if tensor.ndim != 1:
        return False
    name = parts[-2] if len(parts) >= 2 else ""
    if name in ("norm1", "norm2", "norm3") and "resnet" not in "".join(parts):
        # transformer-block LayerNorms share names with resnet GroupNorms;
        # disambiguated by the parent (resnet norms are caught by
        # _is_groupnorm first in our ordering below)
        return True
    return any(h in name for h in _LAYERNORM_HINTS)


def _place(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    tree[path] = value


def _convert_tensor(parts, tensor: np.ndarray):
    """Returns (new_leaf_name, transformed_tensor) for a '.weight'/'.bias'
    style torch leaf, mapped to flax conventions."""
    leaf = parts[-1]
    tensor = np.asarray(tensor)
    if leaf == "weight":
        if tensor.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", tensor.transpose(2, 3, 1, 0)
        if tensor.ndim == 2:
            return "kernel", tensor.T
        if tensor.ndim == 1:  # norm scale
            return "scale", tensor
    if leaf == "bias":
        return "bias", tensor
    return leaf, tensor


def convert_unet_state_dict(
    sd: Dict[str, np.ndarray], strict: bool = False
) -> Tuple[Dict, list]:
    """diffusers UNet2DConditionModel (+ adapter processors) state dict ->
    flax param dict for UNet2DCondition (to be placed under
    params['params']['unet'])."""
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    skipped = []
    for key, tensor in sd.items():
        tensor = np.asarray(tensor)
        # processor.ref_ln exists in reference checkpoints but is dead code
        # (attention.py:161 is commented out); feature_adapter is always None
        if ".processor.ref_ln." in key or ".feature_adapter." in key:
            skipped.append((key, "dead reference param"))
            continue
        nk = _translate_unet_key(key)
        parts = tuple(nk.split("."))
        leaf, val = _convert_tensor(parts, tensor)
        # Group- and LayerNorms both map weight->scale at the module path;
        # our GroupNorm module owns its scale/bias directly.
        out[parts[:-1] + (leaf,)] = val
    tree = unflatten_dict(out)
    return tree, skipped


# ---------------------------------------------------------------------------
# camera encoder
# ---------------------------------------------------------------------------

_CAM_SEQ_MAP_DEEP = {  # default (3-layer) branches: Sequential indices
    "0": "dense_0", "1": "ln_0", "3": "dense_1", "4": "ln_1", "6": "dense_out",
}
_CAM_SEQ_MAP_SIMPLE = {"0": "dense_0", "1": "ln_0", "3": "dense_out"}
_CAM_FINAL_MAP = {"0": "final_dense_0", "1": "final_ln_0", "3": "final_dense_1", "4": "final_ln_1"}
_CAM_MOD_MAP = {"0": "dense_0", "1": "ln", "3": "dense_1"}


def convert_camera_encoder_state_dict(
    sd: Dict[str, np.ndarray], simple_encoder: bool = False
) -> Dict:
    seq_map = _CAM_SEQ_MAP_SIMPLE if simple_encoder else _CAM_SEQ_MAP_DEEP
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, tensor in sd.items():
        parts = key.split(".")
        tensor = np.asarray(tensor)
        leaf, val = _convert_tensor(tuple(parts), tensor)
        if parts[0] in ("rotation_encoder", "translation_encoder"):
            path = (parts[0], seq_map[parts[1]], leaf)
        elif parts[0] == "final_projection":
            path = (_CAM_FINAL_MAP[parts[1]], leaf)
        elif parts[0] == "output_norm":
            path = ("output_norm", leaf)
        elif parts[0] == "modulators":
            # modulators.<name>.<seq_idx> -> mod_<name>_{dense_0|ln|dense_1}
            path = (f"mod_{parts[1]}_{_CAM_MOD_MAP[parts[2]]}", leaf)
        else:
            continue
        out[path] = val
    return unflatten_dict(out)


# ---------------------------------------------------------------------------
# CLIP text encoder (transformers CLIPTextModel)
# ---------------------------------------------------------------------------


def convert_clip_text_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, tensor in sd.items():
        tensor = np.asarray(tensor)
        key = key.replace("text_model.", "")
        if key == "embeddings.token_embedding.weight":
            out[("token_embedding", "embedding")] = tensor
            continue
        if key == "embeddings.position_embedding.weight":
            out[("position_embedding",)] = tensor
            continue
        if key in ("embeddings.position_ids", "position_ids"):
            continue
        m = re.match(r"encoder\.layers\.(\d+)\.(.*)", key)
        if m:
            i, rest = m.group(1), m.group(2)
            rest = rest.replace("mlp.", "")
            parts = rest.split(".")
            leaf, val = _convert_tensor(tuple(parts), tensor)
            out[(f"layers_{i}",) + tuple(parts[:-1]) + (leaf,)] = val
            continue
        if key.startswith("final_layer_norm"):
            parts = key.split(".")
            leaf, val = _convert_tensor(tuple(parts), tensor)
            out[("final_layer_norm", leaf)] = val
            continue
    return unflatten_dict(out)


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL)
# ---------------------------------------------------------------------------

_VAE_RULES = [
    (r"^(encoder)\.down_blocks\.(\d+)\.resnets\.(\d+)\.", r"\1.down_\2_resnet_\3."),
    (r"^(encoder)\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.", r"\1.down_\2_downsample.conv."),
    (r"^(decoder)\.up_blocks\.(\d+)\.resnets\.(\d+)\.", r"\1.up_\2_resnet_\3."),
    (r"^(decoder)\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.", r"\1.up_\2_upsample.conv."),
    (r"^(encoder|decoder)\.mid_block\.resnets\.(\d+)\.", r"\1.mid_resnet_\2."),
    (r"^(encoder|decoder)\.mid_block\.attentions\.0\.", r"\1.mid_attn."),
    (r"\.to_out\.0\.", r".to_out."),
]


def convert_vae_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, tensor in sd.items():
        tensor = np.asarray(tensor)
        nk = key
        for pat, rep in _VAE_RULES:
            nk = re.sub(pat, rep, nk)
        parts = tuple(nk.split("."))
        leaf, val = _convert_tensor(parts, tensor)
        parent = parts[-2] if len(parts) >= 2 else ""
        path = parts[:-1] + (leaf,)
        # VAE attention q/k/v/out are Linear in recent diffusers but 1x1 conv
        # (O,I,1,1) in older checkpoints — squeeze to linear
        if val.ndim == 4 and val.shape[:2] == (1, 1) and parent.startswith("to_"):
            val = val[0, 0]
        out[path] = val
    return unflatten_dict(out)


# ---------------------------------------------------------------------------
# Lightning checkpoint -> full pipeline params
# ---------------------------------------------------------------------------


def split_lightning_state_dict(sd: Dict[str, np.ndarray]):
    """Apply the reference's key remap (infer.py:48-74): strip 'unet.',
    route base_unet/camera_encoder/image_encoder groups."""
    groups = {"base_unet": {}, "camera_encoder": {}, "image_encoder": {}, "other": {}}
    for key, val in sd.items():
        k = key
        if k.startswith("unet."):
            k = k[len("unet.") :]
        if k.startswith("base_unet."):
            groups["base_unet"][k[len("base_unet.") :]] = val
        elif k.startswith("camera_encoder."):
            groups["camera_encoder"][k[len("camera_encoder.") :]] = val
        elif k.startswith("image_encoder.unet."):
            groups["image_encoder"][k[len("image_encoder.unet.") :]] = val
        elif k.startswith("image_encoder."):
            # infer.py remaps image_encoder.* -> image_encoder.unet.*
            groups["image_encoder"][k[len("image_encoder.") :]] = val
        else:
            groups["other"][k] = val
    return groups


def convert_lightning_checkpoint(
    ckpt_path: str,
    simple_cam_encoder: bool = False,
    share_image_encoder: bool = True,
):
    """Load a Lightning .ckpt (torch.load on CPU) and convert to the mvd
    param tree {'params': {'unet': ..., 'camera_encoder': ...[,
    'image_encoder_unet': ...]}}."""
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    groups = split_lightning_state_dict(sd)

    unet_tree, skipped = convert_unet_state_dict(groups["base_unet"])
    params = {"unet": unet_tree}
    if groups["camera_encoder"]:
        params["camera_encoder"] = convert_camera_encoder_state_dict(
            groups["camera_encoder"], simple_cam_encoder
        )
    if groups["image_encoder"] and not share_image_encoder:
        enc_tree, _ = convert_unet_state_dict(groups["image_encoder"])
        params["image_encoder_unet"] = enc_tree
    return {"params": params}, skipped


# ---------------------------------------------------------------------------
# inverse: mvd params -> torch-style state dict (for parity tests + export)
# ---------------------------------------------------------------------------


def zero_pad_conv_in(unet_params: Dict, extra_in_channels: int = 6) -> Dict:
    """Zero-pad conv_in's input channels for ray-map conditioning.

    Converted SD checkpoints carry a (3, 3, 4, 320) conv_in kernel; a
    ray-conditioned UNet (ModelConfig.use_ray_conditioning) expects
    4 + 6 = 10 input channels. Zeros on the new rows make the pretrained
    model's output IDENTICAL at load time (the ray channels contribute
    nothing until training moves the weights) — the standard
    extra-conditioning warm start. Returns a new UNet param subtree.
    """
    tree = dict(unet_params)
    conv = dict(tree["conv_in"])
    k = np.asarray(conv["kernel"])
    pad = np.zeros(k.shape[:2] + (extra_in_channels, k.shape[3]), k.dtype)
    conv["kernel"] = np.concatenate([k, pad], axis=2)
    tree["conv_in"] = conv
    return tree


def export_unet_state_dict(unet_params: Dict) -> Dict[str, np.ndarray]:
    """flax UNet param dict -> diffusers-style torch state dict (numpy)."""
    inv_block = [
        (r"^down_(\d+)_resnet_(\d+)\.", r"down_blocks.\1.resnets.\2."),
        (r"^down_(\d+)_attn_(\d+)\.", r"down_blocks.\1.attentions.\2."),
        (r"^down_(\d+)_downsample\.conv\.", r"down_blocks.\1.downsamplers.0.conv."),
        (r"^up_(\d+)_resnet_(\d+)\.", r"up_blocks.\1.resnets.\2."),
        (r"^up_(\d+)_attn_(\d+)\.", r"up_blocks.\1.attentions.\2."),
        (r"^up_(\d+)_upsample\.conv\.", r"up_blocks.\1.upsamplers.0.conv."),
        (r"^mid_resnet_(\d+)\.", r"mid_block.resnets.\1."),
        (r"^mid_attn_(\d+)\.", r"mid_block.attentions.\1."),
    ]
    inv_inner = [
        (r"\.transformer_blocks_(\d+)\.", r".transformer_blocks.\1."),
        (r"\.adapter_self\.", r".attn1.processor."),
        (r"\.adapter_cross\.", r".attn2.processor."),
        (r"\.GroupNorm_0\.", r"."),
        (r"\.ff\.proj_geglu\.", r".ff.net.0.proj."),
        (r"\.ff\.proj_out\.", r".ff.net.2."),
    ]
    out = {}
    for path, val in flatten_dict(unet_params).items():
        key = ".".join(str(p) for p in path)
        for pat, rep in inv_block + inv_inner:
            key = re.sub(pat, rep, key)
        val = np.asarray(val)
        leaf = key.rsplit(".", 1)[-1]
        stem = key.rsplit(".", 1)[0]
        if leaf == "kernel":
            if val.ndim == 4:
                val = val.transpose(3, 2, 0, 1)
            else:
                val = val.T
            key = stem + ".weight"
        elif leaf == "scale":
            key = stem + ".weight"
        # torch ModuleList suffixes
        key = key.replace(".to_out.weight", ".to_out.0.weight")
        key = key.replace(".to_out.bias", ".to_out.0.bias")
        key = key.replace(".to_out_ref.weight", ".to_out_ref.0.weight")
        key = key.replace(".to_out_ref.bias", ".to_out_ref.0.bias")
        out[key] = val
    return out
