"""Held-out view-synthesis evaluation on the procedural corpus (EVIDENCE.md).

Measures whether the trained model actually learned view-DEPENDENT structure:
for unseen (test-split) objects, generate target views from (source view,
relative camera) and score PSNR/SSIM against the ray-traced ground truth.
The controlled contrasts:

  * trained, camera conditioning ON   (config/evidence_256.yaml run)
  * trained, camera conditioning OFF  (config/evidence_256_nocam.yaml run —
    the model sees the same source view + prompt but provably cannot know
    WHICH target orientation is asked for)
  * fresh init (step-0) of the conditioned model
  * copy-source baseline (score the source view itself against the target —
    the "ignore the camera" floor every useful model must beat)

The reference's own evidence bar is W&B loss curves + eyeballed panels
(reference src/training/training.py:227-262, 300-343); this harness exceeds
it with held-out-object metrics against exact ground truth.

Usage (TPU):
  python benchmarks/view_synthesis_eval.py \
    --dataset-path /data/proc_corpus --vae-params /data/vae_params \
    --model cam=config/evidence_256.yaml=/data/runs/cam/<ts> \
    --model nocam=config/evidence_256_nocam.yaml=/data/runs/nocam/<ts> \
    --model init=config/evidence_256.yaml=INIT \
    --out /data/eval --num-objects 12
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import os
import sys
import time
import zipfile
from typing import Dict, List, Optional, Sequence

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def target_view_indices(n_views: int, targets_per_object: int) -> List[int]:
    """Target views spread over the ring for source view 0 (e.g. 2, 4, 6 of
    8). The SINGLE definition of the eval pair construction — paired_compare
    rebuilds ground-truth rows against saved gen stacks with this, so the two
    can never silently mis-align (shapes match either way)."""
    stride = max(1, n_views // (targets_per_object + 1))
    return [min(k * stride, n_views - 1) for k in range(1, targets_per_object + 1)]


def load_view(zp: str, view: int, size: int):
    """(image [-1,1] float32 (H,W,3), camera (4,4)) from a corpus zip."""
    from PIL import Image

    with zipfile.ZipFile(zp) as z:
        img = Image.open(io.BytesIO(z.read(f"{view:03d}.png")))
        if img.mode == "RGBA":
            bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
            img = Image.alpha_composite(bg, img)
        img = img.convert("RGB").resize((size, size), Image.LANCZOS)
        cam = np.load(io.BytesIO(z.read(f"{view:03d}.npy"))).astype(np.float32)
        prompt = z.read("prompt.txt").decode() if "prompt.txt" in z.namelist() else "3D object"
        n_views = len([n for n in z.namelist() if n.endswith(".png")])
    return np.asarray(img, np.float32) / 127.5 - 1.0, cam, prompt, n_views


def build_pipeline(config_path: str, image_size: int, vae_params_dir: Optional[str], seed_override=None):
    import jax

    from mvd_tpu.config import train_config_from_yaml
    from mvd_tpu.pipeline import MVDPipeline

    cfg = train_config_from_yaml(config_path)
    if image_size:
        cfg = dataclasses.replace(cfg, image_size=image_size)
    model_cfg = dataclasses.replace(
        cfg.model,
        unet=dataclasses.replace(cfg.model.unet, sample_size=cfg.image_size // 8),
    )
    cfg = dataclasses.replace(cfg, model=model_cfg)
    pipe = MVDPipeline.create(model_cfg, jax.random.PRNGKey(seed_override or cfg.seed))
    if vae_params_dir:
        from mvd_tpu.checkpoint import load_params

        loaded = load_params(vae_params_dir)
        pipe.params = {**pipe.params, "vae": loaded["vae"]}
    return cfg, pipe


def restore_run(cfg, pipe, run_dir: str):
    """Load the trained 'mvd' partition from a Trainer run dir into pipe."""
    from mvd_tpu.checkpoint import CheckpointManager, resolve_resume_path
    from mvd_tpu.train import TrainState, make_optimizer

    ckpt_dir, step = resolve_resume_path(run_dir)
    tx = make_optimizer(
        cfg.optimizer,
        pipe.params["mvd"],
        total_steps=max(1, cfg.max_steps or 1000),
        train_denoising_unet=cfg.train_denoising_unet,
        grad_accum_steps=cfg.grad_accum_steps,
    )
    template = TrainState.create(pipe.params["mvd"], tx)
    mgr = CheckpointManager(ckpt_dir)
    state, meta = mgr.restore(template, step)
    mgr.close()
    if state is None:
        raise SystemExit(f"no checkpoint found under {run_dir}")
    pipe.params = {**pipe.params, "mvd": state.params}
    return int(state.step)


def evaluate_model(
    label: str,
    config_path: str,
    run_dir: str,
    pairs: Sequence[dict],
    image_size: int,
    vae_params_dir: Optional[str],
    num_steps: int,
    batch: int,
    triptych_dir: Optional[str],
    sampler: Optional[str] = None,
    encoder_reuse: int = 1,
    save_gen_dir: Optional[str] = None,
) -> Dict:
    import jax.numpy as jnp

    from mvd_tpu.metrics.image import psnr_per_image, ssim

    cfg, pipe = build_pipeline(config_path, image_size, vae_params_dir)
    step = 0
    if run_dir != "INIT":
        step = restore_run(cfg, pipe, run_dir)
    print(f"[{label}] evaluating at step {step} ({len(pairs)} pairs)", flush=True)

    psnrs: List[float] = []
    ssims: List[float] = []
    gens: List[np.ndarray] = []
    t0 = time.time()
    for s in range(0, len(pairs), batch):
        chunk = pairs[s : s + batch]
        src = np.stack([p["source_image"] for p in chunk])
        gt = np.stack([p["target_image"] for p in chunk])
        out = pipe(
            prompt=[p["prompt"] for p in chunk],
            height=image_size,
            width=image_size,
            num_inference_steps=num_steps,
            guidance_scale=1.0,
            source_camera=np.stack([p["source_camera"] for p in chunk]),
            target_camera=np.stack([p["target_camera"] for p in chunk]),
            source_images=src,
            ref_scale=cfg.model.unet.img_ref_scale,
            seed=1234,
            output_type="np",
            sampler=sampler,
            encoder_reuse=encoder_reuse,
        )
        gen01 = np.clip(np.asarray(out["images"]), 0.0, 1.0)
        if save_gen_dir:
            gens.append(gen01)
        gt01 = (gt + 1.0) / 2.0
        p = np.asarray(psnr_per_image(jnp.asarray(gen01), jnp.asarray(gt01), data_range=1.0))
        sv = np.asarray(
            ssim(jnp.asarray(gen01), jnp.asarray(gt01), data_range=1.0, per_image=True)
        )
        psnrs.extend(p.tolist())
        ssims.extend(np.atleast_1d(sv).tolist())
        if triptych_dir:
            os.makedirs(triptych_dir, exist_ok=True)
            for j in range(min(2, len(chunk))):  # a couple per batch
                trip = np.concatenate(
                    [(src[j] + 1) / 2, gt01[j], gen01[j]], axis=1
                )
                from PIL import Image

                Image.fromarray((trip * 255).astype(np.uint8)).save(
                    os.path.join(triptych_dir, f"{label}_{s + j:03d}.png")
                )
    if save_gen_dir:
        os.makedirs(save_gen_dir, exist_ok=True)
        np.savez_compressed(
            os.path.join(save_gen_dir, f"{label}.npz"),
            images=np.concatenate(gens, axis=0),
        )
    res = {
        "label": label,
        "step": step,
        "n": len(psnrs),
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_std": float(np.std(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
        "ssim_std": float(np.std(ssims)),
        "seconds": round(time.time() - t0, 1),
    }
    print(f"[{label}] PSNR {res['psnr_mean']:.2f}±{res['psnr_std']:.2f} dB, "
          f"SSIM {res['ssim_mean']:.4f} ({res['seconds']}s)", flush=True)
    return res


def main(argv: Optional[Sequence[str]] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-path", required=True)
    ap.add_argument("--vae-params", default=None)
    ap.add_argument(
        "--model",
        action="append",
        required=True,
        help="label=config.yaml=run_dir (run_dir 'INIT' evaluates the fresh init)",
    )
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--num-objects", type=int, default=12)
    ap.add_argument("--targets-per-object", type=int, default=3)
    ap.add_argument("--num-steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=9)
    ap.add_argument("--sampler", default=None, help="override sampler (ddpm/ddim/dpmpp_2m)")
    ap.add_argument(
        "--encoder-reuse",
        type=int,
        default=1,
        help="encoder-propagation fast sampling (approximate; k>1 reuses "
        "the down-path cache for k-1 of every k steps)",
    )
    ap.add_argument("--out", default=None, help="output dir for json + triptychs")
    ap.add_argument(
        "--save-gen",
        action="store_true",
        help="save each model's generated images to <out>/gen/<label>.npz "
        "(for per-image comparison of approximate fast paths against the "
        "exact trajectory)",
    )
    ap.add_argument("--platform", default=None, help="e.g. cpu to force off-TPU")
    args = ap.parse_args(argv)
    if args.save_gen and not args.out:
        raise SystemExit("--save-gen requires --out (gen stacks are written "
                         "under <out>/gen/) — refusing to run an eval whose "
                         "requested artifacts would be silently dropped")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mvd_tpu.data.objaverse import ObjaverseDataset

    te = ObjaverseDataset(args.dataset_path, "test", image_size=args.image_size)
    files = te.files[: args.num_objects]
    if not files:
        raise SystemExit("test split is empty")

    pairs = []
    for zp in files:
        src_img, src_cam, prompt, n_views = load_view(zp, 0, args.image_size)
        for v in target_view_indices(n_views, args.targets_per_object):
            tgt_img, tgt_cam, _, _ = load_view(zp, v, args.image_size)
            pairs.append(
                {
                    "source_image": src_img,
                    "target_image": tgt_img,
                    "source_camera": src_cam,
                    "target_camera": tgt_cam,
                    "prompt": prompt,
                }
            )
    print(f"{len(files)} held-out objects -> {len(pairs)} (source, target) pairs")

    # copy-source floor: score the source view against the target directly
    import jax.numpy as jnp

    from mvd_tpu.metrics.image import psnr_per_image, ssim

    src01 = np.stack([(p["source_image"] + 1) / 2 for p in pairs])
    gt01 = np.stack([(p["target_image"] + 1) / 2 for p in pairs])
    copy_psnr = np.asarray(psnr_per_image(jnp.asarray(src01), jnp.asarray(gt01), data_range=1.0))
    copy_ssim = np.asarray(ssim(jnp.asarray(src01), jnp.asarray(gt01), data_range=1.0, per_image=True))
    results = [
        {
            "label": "copy_source",
            "step": 0,
            "n": len(pairs),
            "psnr_mean": float(copy_psnr.mean()),
            "psnr_std": float(copy_psnr.std()),
            "ssim_mean": float(np.atleast_1d(copy_ssim).mean()),
            "ssim_std": float(np.atleast_1d(copy_ssim).std()),
            "seconds": 0.0,
        }
    ]
    print(f"[copy_source] PSNR {results[0]['psnr_mean']:.2f} dB, SSIM {results[0]['ssim_mean']:.4f}")

    trip_dir = os.path.join(args.out, "triptychs") if args.out else None
    for spec in args.model:
        label, config_path, run_dir = spec.split("=", 2)
        results.append(
            evaluate_model(
                label,
                config_path,
                run_dir,
                pairs,
                args.image_size,
                args.vae_params,
                args.num_steps,
                args.batch,
                trip_dir,
                sampler=args.sampler,
                encoder_reuse=args.encoder_reuse,
                save_gen_dir=(
                    os.path.join(args.out, "gen") if args.out and args.save_gen else None
                ),
            )
        )

    table = {
        "dataset": args.dataset_path,
        "num_objects": len(files),
        "pairs": len(pairs),
        "num_steps": args.num_steps,
        "sampler": args.sampler or "config default (ddpm)",
        "encoder_reuse": args.encoder_reuse,
        "results": results,
    }
    print(json.dumps(table, indent=2))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "view_synthesis_eval.json"), "w") as f:
            json.dump(table, f, indent=2)
        print(f"wrote {args.out}/view_synthesis_eval.json")


if __name__ == "__main__":
    main()
