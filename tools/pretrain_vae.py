"""Pretrain the VAE on a rendered corpus (reconstruction + KL).

The reference never trains its VAE — it ships SD2.1's HF-pretrained
AutoencoderKL (reference src/models/mvd_unet.py:411-415) and freezes it
(training.py:54-57). With zero egress there are no pretrained weights, and a
random-init VAE decoder makes pixel-space evaluation meaningless; this tool
produces the offline stand-in: a corpus-pretrained AutoencoderKL exported via
``checkpoint.save_params`` that ``mvd-train --init-params`` (and the
view-synthesis evaluation, benchmarks/view_synthesis_eval.py) load as the
frozen VAE.

Split hygiene: trains ONLY on the corpus train split (the same md5-hashed
deterministic split ObjaverseDataset uses), so held-out objects in the
view-synthesis experiment stay unseen by every trained component.

Usage:
  python tools/pretrain_vae.py --dataset-path /data/corpus \
      --config config/evidence_256.yaml --steps 3000 --output /data/vae_params
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
import zipfile
from typing import List, Optional, Sequence, Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_image_index(files: Sequence[str]) -> List[Tuple[str, str]]:
    """(zip_path, png_name) for every view of every object zip."""
    index = []
    for zp in files:
        with zipfile.ZipFile(zp) as z:
            for n in sorted(z.namelist()):
                if n.endswith(".png"):
                    index.append((zp, n))
    return index


def load_image(zp: str, name: str, size: int) -> np.ndarray:
    """PNG -> (size, size, 3) uint8; RGBA composited onto white (the dataset
    loader's convention, reference objaverse_dataset.py:259-266). Kept uint8
    on the host: the [-1, 1] normalize happens on-device (4x less host->TPU
    transfer — 12.6 MB/step of f32 was most of the tunnel cost at batch 16)."""
    from PIL import Image

    with zipfile.ZipFile(zp) as z:
        img = Image.open(io.BytesIO(z.read(name)))
        if img.mode == "RGBA":
            bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
            img = Image.alpha_composite(bg, img)
        img = img.convert("RGB").resize((size, size), Image.LANCZOS)
    return np.asarray(img, np.uint8)


def main(argv: Optional[Sequence[str]] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-path", required=True)
    ap.add_argument("--output", required=True, help="save_params output dir")
    ap.add_argument("--config", default=None, help="YAML with vae_config overrides")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--kl-weight", type=float, default=1e-6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val-every", type=int, default=500)
    ap.add_argument("--platform", default=None, help="e.g. cpu to force off-TPU")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from mvd_tpu.config import TrainConfig, train_config_from_yaml
    from mvd_tpu.checkpoint import save_params
    from mvd_tpu.data.objaverse import ObjaverseDataset
    from mvd_tpu.nn.vae import AutoencoderKL

    cfg = train_config_from_yaml(args.config) if args.config else TrainConfig()
    size = args.image_size or cfg.image_size
    compute_dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32

    tr = ObjaverseDataset(args.dataset_path, "train", image_size=size)
    va = ObjaverseDataset(args.dataset_path, "val", image_size=size)
    train_idx = build_image_index(tr.files)
    val_idx = build_image_index(va.files)[: args.batch_size * 4]
    print(f"train images: {len(train_idx)}, val images: {len(val_idx)}")

    vae = AutoencoderKL(cfg.model.vae, dtype=compute_dtype)
    rng = jax.random.PRNGKey(args.seed)
    params = jax.jit(vae.init)(rng, jnp.zeros((1, size, size, 3)))

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.1),
            weight_decay=1e-4,
        ),
    )
    opt_state = tx.init(params)

    def loss_fn(params, batch_u8, key):
        batch = batch_u8.astype(jnp.float32) / 127.5 - 1.0
        mean, logvar = vae.apply(params, batch, method=vae.encode_moments)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        recon = vae.apply(params, z, method=vae.decode)
        recon_loss = jnp.mean(jnp.square(recon.astype(jnp.float32) - batch))
        kl = -0.5 * jnp.mean(
            1.0 + logvar - jnp.square(mean) - jnp.exp(logvar)
        )
        return recon_loss + args.kl_weight * kl, (recon_loss, kl)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        (loss, (recon, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, recon, kl

    @jax.jit
    def val_recon(params, batch_u8):
        batch = batch_u8.astype(jnp.float32) / 127.5 - 1.0
        mean, _ = vae.apply(params, batch, method=vae.encode_moments)
        recon = vae.apply(params, mean, method=vae.decode).astype(jnp.float32)
        mse = jnp.mean(jnp.square(recon - batch), axis=(1, 2, 3))
        return jnp.mean(10.0 * jnp.log10(4.0 / mse))  # PSNR, data range 2

    def batches():
        """Background-thread prefetch (depth 4): PNG decode for the next
        batches overlaps the device step instead of serializing with it."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=4)

        def produce():
            order_rng = np.random.default_rng(args.seed)
            while True:
                order = order_rng.permutation(len(train_idx))
                for s in range(
                    0, len(order) - args.batch_size + 1, args.batch_size
                ):
                    sel = order[s : s + args.batch_size]
                    q.put(
                        np.stack([load_image(*train_idx[i], size) for i in sel])
                    )

        threading.Thread(target=produce, daemon=True).start()
        while True:
            yield q.get()

    val_batch = jnp.asarray(
        np.stack([load_image(zp, n, size) for zp, n in val_idx])
    ) if val_idx else None

    it = batches()
    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    history = []
    for step in range(1, args.steps + 1):
        batch = jnp.asarray(next(it))
        key, sub = jax.random.split(key)
        params, opt_state, loss, recon, kl = train_step(params, opt_state, batch, sub)
        if step == 1 or step % 100 == 0:
            # host sync (axon: block_until_ready can return early; a float()
            # transfer is the reliable barrier)
            print(
                f"step {step}: loss={float(loss):.5f} recon={float(recon):.5f} "
                f"kl={float(kl):.3f} ({time.time()-t0:.0f}s)",
                flush=True,
            )
        if val_batch is not None and (step % args.val_every == 0 or step == args.steps):
            psnr = float(val_recon(params, val_batch))
            history.append({"step": step, "val_recon_psnr_db": round(psnr, 3)})
            print(f"step {step}: val recon PSNR {psnr:.2f} dB", flush=True)

    # latent scale: the diffusion schedule assumes ~unit-variance latents
    # (SD's scaling_factor 0.18215 is 1/std of ITS VAE's latents); measure
    # this VAE's latent std so vae_config.scaling_factor can be set to match
    probe = val_batch if val_batch is not None else jnp.asarray(next(it))
    mean, _ = jax.jit(
        lambda p, x: vae.apply(
            p, x.astype(jnp.float32) / 127.5 - 1.0, method=vae.encode_moments
        )
    )(params, probe)
    latent_std = float(jnp.std(mean.astype(jnp.float32)))
    rec_scaling = 1.0 / max(latent_std, 1e-6)
    print(
        f"latent std {latent_std:.4f} -> recommended vae_config.scaling_factor "
        f"{rec_scaling:.5f}"
    )

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    save_params(
        args.output,
        {"vae": jax.device_get(params)},
        config_json=json.dumps(
            {
                "tool": "pretrain_vae",
                "image_size": size,
                "steps": args.steps,
                "kl_weight": args.kl_weight,
                "compute_dtype": cfg.model.dtype,
                "latent_std": latent_std,
                "recommended_scaling_factor": rec_scaling,
                "val_history": history,
            }
        ),
    )
    print(f"saved VAE params to {args.output}")
    if history:
        print(f"final val recon PSNR: {history[-1]['val_recon_psnr_db']} dB")


if __name__ == "__main__":
    main()
