"""Golden-tensor exporter — run in a torch+diffusers environment.

This build environment has no diffusers and no model zoo, so bit-level
parity against the reference (SURVEY §6: per-view PSNR >= 40 dB) is wired
as: (1) run THIS script wherever the reference runs (it needs only
diffusers + the reference checkpoint) to dump golden .npz tensors for fixed
inputs; (2) point MVD_GOLDEN_DIR at the dump and run
``pytest tests/test_golden_parity.py`` here — the gated tests convert the
same torch weights and compare layer-by-layer and end-to-end.

Exports (all with fixed seeds / fp32):
  * clip_text.npz      — input_ids -> last_hidden_state
  * vae.npz            — image -> posterior mean/std, latent -> decoded image
  * unet.npz           — (latents, t, text) -> eps/v prediction, for 3 timesteps
  * unet_features.npz  — the hook-captured per-attention-block features
                         (reference image_encoder.py:36-84 names)
  * weights/           — the torch state dicts the converter consumes
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="stabilityai/stable-diffusion-2-1")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel
    from transformers import CLIPTextModel

    os.makedirs(args.output_dir, exist_ok=True)
    wdir = os.path.join(args.output_dir, "weights")
    os.makedirs(wdir, exist_ok=True)
    torch.manual_seed(0)

    # ---- CLIP text ----
    te = CLIPTextModel.from_pretrained(args.model, subfolder="text_encoder").eval()
    ids = torch.randint(0, te.config.vocab_size, (2, 77), generator=torch.Generator().manual_seed(1))
    ids[:, 0] = 49406
    ids[:, -1] = 49407
    with torch.no_grad():
        hidden = te(ids)[0]
    np.savez(
        os.path.join(args.output_dir, "clip_text.npz"),
        input_ids=ids.numpy(),
        last_hidden_state=hidden.numpy(),
    )
    torch.save(te.state_dict(), os.path.join(wdir, "text_encoder.pth"))

    # ---- VAE ----
    vae = AutoencoderKL.from_pretrained(args.model, subfolder="vae").eval()
    img = torch.randn(1, 3, args.size, args.size, generator=torch.Generator().manual_seed(2)).clamp(-1, 1)
    lat = torch.randn(1, 4, args.size // 8, args.size // 8, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        post = vae.encode(img).latent_dist
        dec = vae.decode(lat).sample
    np.savez(
        os.path.join(args.output_dir, "vae.npz"),
        image=img.numpy(), posterior_mean=post.mean.numpy(),
        posterior_std=post.std.numpy(), latent=lat.numpy(), decoded=dec.numpy(),
    )
    torch.save(vae.state_dict(), os.path.join(wdir, "vae.pth"))

    # ---- UNet (+ features) ----
    unet = UNet2DConditionModel.from_pretrained(args.model, subfolder="unet").eval()
    sample = torch.randn(1, 4, args.size // 8, args.size // 8,
                         generator=torch.Generator().manual_seed(4))
    text = torch.randn(1, 77, unet.config.cross_attention_dim,
                       generator=torch.Generator().manual_seed(5))
    feats = {}

    def mk_hook(name):
        def hook(module, inp, out):
            feats[name] = (out[0] if isinstance(out, tuple) else out).detach().numpy()
        return hook

    hooks = []
    for i, block in enumerate(unet.down_blocks):
        if hasattr(block, "attentions"):
            for j, layer in enumerate(block.attentions):
                hooks.append(layer.register_forward_hook(mk_hook(f"down_block_{i}_attn_{j}")))
    for j, layer in enumerate(unet.mid_block.attentions):
        hooks.append(layer.register_forward_hook(mk_hook(f"mid_block_attn_{j}")))
    for i, block in enumerate(unet.up_blocks):
        if hasattr(block, "attentions"):
            for j, layer in enumerate(block.attentions):
                hooks.append(layer.register_forward_hook(mk_hook(f"up_block_{i}_attn_{j}")))

    outs = {}
    with torch.no_grad():
        for t in (0, 500, 999):
            outs[f"pred_t{t}"] = unet(sample, t, text).sample.numpy()
    for h in hooks:
        h.remove()
    np.savez(
        os.path.join(args.output_dir, "unet.npz"),
        sample=sample.numpy(), text=text.numpy(), **outs,
    )
    np.savez(os.path.join(args.output_dir, "unet_features.npz"), **feats)
    torch.save(unet.state_dict(), os.path.join(wdir, "unet.pth"))
    print(f"golden tensors exported to {args.output_dir}")


if __name__ == "__main__":
    main()
