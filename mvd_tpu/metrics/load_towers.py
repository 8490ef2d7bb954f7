"""Load metric towers from local torch state-dict files (model-zoo-free)."""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

from .fid import FID, vgg_pool_extractor
from .towers import (
    LPIPS,
    AlexNetFeatures,
    CLIPImageScore,
    CLIPVisionEncoder,
    PerceptualLoss,
    VGG16Features,
    clip_vision_from_torch,
    lpips_lins_from_torch,
    vgg16_from_torch,
)

logger = logging.getLogger(__name__)


def _torch_load(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def load_towers(
    vgg_weights: Optional[str] = None,
    lpips_weights: Optional[str] = None,
    lpips_net: str = "alex",
    clip_vision_weights: Optional[str] = None,
    inception_weights: Optional[str] = None,
    with_fid: bool = False,
) -> Dict:
    """Build the metric bank; towers without weight files stay unavailable
    and the harness skips them (reference-style degradation)."""
    towers: Dict = {}
    vgg_params = None
    if vgg_weights:
        try:
            vgg_params = vgg16_from_torch(_torch_load(vgg_weights))
        except Exception as e:
            logger.warning("vgg weights unusable: %s", e)
    towers["perceptual"] = PerceptualLoss(vgg_params)

    if lpips_weights:
        try:
            sd = _torch_load(lpips_weights)
            lins = lpips_lins_from_torch(sd, lpips_net)
            if lpips_net == "vgg" and vgg_params is not None:
                towers["lpips"] = LPIPS("vgg", vgg_params, lins)
            else:
                # alex backbone weights must ride in the same file (lpips
                # package checkpoints contain the trunk under net.*)
                backbone_sd = {
                    k[len("net."):]: v for k, v in sd.items() if k.startswith("net.")
                }
                if backbone_sd:
                    from .towers import ALEX_CFG

                    # torchvision alexnet indices 0,3,6,8,10
                    idx_map = {0: 0, 3: 1, 6: 2, 8: 3, 10: 4}
                    flat = {}
                    import re

                    for k, v in backbone_sd.items():
                        m = re.match(r"(?:features\.)?(\d+)\.(weight|bias)", k)
                        if m and int(m.group(1)) in idx_map:
                            name = f"conv_{idx_map[int(m.group(1))]}"
                            if m.group(2) == "weight":
                                flat[(name, "kernel")] = np.asarray(v).transpose(2, 3, 1, 0)
                            else:
                                flat[(name, "bias")] = np.asarray(v)
                    from flax.traverse_util import unflatten_dict

                    towers["lpips"] = LPIPS(
                        "alex", {"params": unflatten_dict(flat)}, lins
                    )
        except Exception as e:
            logger.warning("lpips weights unusable: %s", e)
    towers.setdefault("lpips", LPIPS(lpips_net, None, None))

    clip_params = None
    clip_arch = {}
    if clip_vision_weights:
        try:
            from .towers import clip_arch_from_sd

            sd = _torch_load(clip_vision_weights)
            clip_arch = clip_arch_from_sd(sd)  # H vs L wiring from the shapes
            clip_params = clip_vision_from_torch(sd)
        except Exception as e:
            logger.warning("clip weights unusable: %s", e)
            clip_arch = {}
    towers["clip"] = CLIPImageScore(clip_params, **clip_arch)

    if inception_weights:
        # standard Inception-FID (reference torchmetrics FID equivalent)
        try:
            from .inception import InceptionFIDExtractor, inception_from_torch

            params = inception_from_torch(_torch_load(inception_weights))
            towers["fid"] = FID(InceptionFIDExtractor(params))
        except Exception as e:
            logger.warning("inception weights unusable: %s", e)
    if "fid" not in towers:
        if with_fid and vgg_params is not None:
            model = VGG16Features()
            towers["fid"] = FID(vgg_pool_extractor(model, vgg_params))
        else:
            towers["fid"] = FID(None)
    return towers
