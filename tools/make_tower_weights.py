"""Generate deterministic fixed-seed metric-tower weight files.

Zero egress means the real pretrained towers the reference's metric bank
rides on (torchvision VGG16 — reference src/training/losses.py:21-56,
lpips alex — val.py:84, CLIP — losses.py:59-98, torchmetrics-FID Inception —
losses.py:101-125) cannot be downloaded here. This tool materializes
fixed-seed random-weight towers in the EXACT on-disk layouts the real files
use (torchvision ``features.N.*``, official-lpips ``net.features.N.*`` +
``linN.model.1.weight``, transformers ``vision_model.*`` CLIP, pytorch-fid
InceptionV3 keys), so the full tower bank — converters, architectures, FID
statistics, the val harness CSV plumbing — runs end-to-end exactly the way
it would with real weights (``cli/val.py --vgg-weights ... --fid``).

Honesty note, stated wherever these are used: random-feature towers are a
recognized stand-in for RELATIVE comparisons (random-feature FID tracks
learned-feature FID's rankings; random convnet distances still order
perturbation strength) but ABSOLUTE values are not comparable to published
numbers. Artifacts produced from these weights must say "fixed-seed random
towers" — they demonstrate the machinery, not ImageNet/CLIP semantics.

Usage:
    python tools/make_tower_weights.py --out _evidence/towers [--seed 0]

The torch reference modules live in the parity tests (the same modules the
numerical parity suite validates against the flax towers); importing them
here guarantees the generated files exercise the exact converter paths the
tests pin.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--clip-width", type=int, default=256,
        help="hidden width of the generated CLIP vision tower (64-dim-head "
        "family; full CLIP-H would be a 2.5 GB file of random numbers)",
    )
    args = ap.parse_args(argv)

    import torch

    from tests.test_clip_vision_parity import TorchCLIPVision
    from tests.test_inception import _TorchFIDInception
    from tests.test_towers_parity import _tv_alexnet_features, _tv_vgg16_features

    os.makedirs(args.out, exist_ok=True)
    torch.manual_seed(args.seed)

    # torchvision VGG16 `features` layout (perceptual + FID-VGG backbone)
    vgg = _tv_vgg16_features().eval()
    p = os.path.join(args.out, "vgg16.pt")
    torch.save({f"features.{k}": v for k, v in vgg.state_dict().items()}, p)
    print(f"wrote {p} ({sum(v.numel() for v in vgg.state_dict().values())} params)")

    # official lpips checkpoint layout: alex trunk under net.*, 1x1 heads
    alex = _tv_alexnet_features().eval()
    chans = [64, 192, 384, 256, 256]
    g = torch.Generator().manual_seed(args.seed + 1)
    sd = {f"net.features.{k}": v for k, v in alex.state_dict().items()}
    for i, c in enumerate(chans):
        sd[f"lin{i}.model.1.weight"] = (torch.rand(c, generator=g) * 0.1).view(1, -1, 1, 1)
    p = os.path.join(args.out, "lpips_alex.pt")
    torch.save(sd, p)
    print(f"wrote {p}")

    # transformers CLIPVisionModelWithProjection layout; arch is inferred
    # from the shapes by clip_arch_from_sd, so a narrow 64-dim-head tower
    # loads through the identical wiring the real CLIP-L file would
    clip = TorchCLIPVision(
        hidden=args.clip_width, layers=4, heads=args.clip_width // 64,
        inter=args.clip_width * 4, patch=16, image=224,
        proj=args.clip_width // 2, act="quick_gelu",
    ).eval()
    p = os.path.join(args.out, "clip_vision.pt")
    torch.save(clip.transformers_state_dict(), p)
    print(f"wrote {p}")

    # pytorch-fid InceptionV3 layout (standard FID)
    inc = _TorchFIDInception().eval()
    gg = torch.Generator().manual_seed(args.seed + 2)
    with torch.no_grad():
        for mod in inc.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                c = mod.num_features
                mod.weight.copy_(0.5 + torch.rand(c, generator=gg))
                mod.bias.copy_(0.1 * torch.randn(c, generator=gg))
                mod.running_mean.copy_(0.1 * torch.randn(c, generator=gg))
                mod.running_var.copy_(0.5 + torch.rand(c, generator=gg))
    p = os.path.join(args.out, "inception_fid.pt")
    torch.save(inc.state_dict(), p)
    print(f"wrote {p} ({sum(v.numel() for v in inc.state_dict().values())} params)")


if __name__ == "__main__":
    main()
