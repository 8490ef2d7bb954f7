"""Validation/benchmark harness: metric sweep over the test split + timing.

Rebuild of reference val.py:298-565: per-batch generation timed with
``perf_counter`` (around the jitted pipeline call with
``block_until_ready`` — the reference's de-facto performance benchmark,
val.py:331-347), per-sample PSNR/SSIM, annotated comparison PNGs, and the
two CSV outputs (``validation_results.csv`` per-sample,
``overall_metrics.csv`` aggregates incl. mean/std/min/max and total/mean
inference seconds, val.py:494-565).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import save_image, side_by_side
from .image import psnr_per_image, ssim


def run_validation(
    pipe,
    loader,
    output_dir: str,
    num_inference_steps: int = 20,
    guidance_scale: float = 1.0,
    ref_scale: float = 0.1,
    max_batches: Optional[int] = None,
    save_images: bool = True,
    seed: int = 0,
    towers: Optional[Dict] = None,
    sampler: Optional[str] = None,
    encoder_reuse: int = 1,
) -> Dict[str, float]:
    """``towers``: optional dict with any of {"perceptual", "lpips", "clip",
    "fid"} metric objects (mvd_tpu.metrics.towers / .fid); each is used only
    when its weights are loaded (``.available``) — mirroring the reference's
    metric bank with its try/except degradation (val.py:60-104,
    losses.py:59-125)."""
    towers = towers or {}
    os.makedirs(output_dir, exist_ok=True)
    rows: List[Dict] = []
    batch_times: List[float] = []
    n_samples = 0
    fid = towers.get("fid")

    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        flat = {k: np.asarray(v).reshape((-1,) + v.shape[2:]) for k, v in batch.items()}
        n = flat["source_image"].shape[0]
        src = (flat["source_image"] + 1) / 2
        tgt = (flat["target_image"] + 1) / 2
        res = src.shape[1]

        t0 = time.perf_counter()
        out = pipe(
            [""] * n,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            height=res,
            width=res,
            source_camera=flat["source_camera"],
            target_camera=flat["target_camera"],
            source_images=src,
            ref_scale=ref_scale,
            seed=seed + bi,
            output_type="jnp",
            sampler=sampler,
            encoder_reuse=encoder_reuse,
        )
        jax.block_until_ready(out["images"])
        dt = time.perf_counter() - t0
        gen = np.asarray(out["images"])

        if bi > 0:  # first batch includes compile; track steady-state timing
            batch_times.append((dt, n))
        p = np.asarray(psnr_per_image(jnp.asarray(gen), jnp.asarray(tgt), data_range=1.0))
        s = np.asarray(
            ssim(jnp.asarray(gen), jnp.asarray(tgt), data_range=1.0, per_image=True)
        )
        mse = ((gen - tgt) ** 2).mean(axis=(1, 2, 3))

        extra: Dict[str, float] = {}
        gen_m11, tgt_m11 = gen * 2 - 1, tgt * 2 - 1
        perc = towers.get("perceptual")
        if perc is not None and perc.available:
            extra["perceptual"] = float(perc(jnp.asarray(gen_m11), jnp.asarray(tgt_m11)))
        lp = towers.get("lpips")
        if lp is not None and lp.available:
            extra["lpips"] = float(lp(jnp.asarray(gen_m11), jnp.asarray(tgt_m11)))
        cs = towers.get("clip")
        if cs is not None and cs.available:
            extra["clip_score"] = float(cs(jnp.asarray(gen), jnp.asarray(tgt)))
        if fid is not None and fid.available:
            fid.update(tgt, real=True)
            fid.update(gen, real=False)

        for i in range(n):
            rows.append(
                {
                    "batch": bi,
                    "sample": n_samples + i,
                    "psnr": float(p[i]),
                    "ssim": float(s[i]),
                    "mse": float(mse[i]),
                    "inference_time_s": dt / n,
                    **extra,
                }
            )
        if save_images and bi < 4:
            for i in range(min(n, 2)):
                sheet = side_by_side([src[i], tgt[i], gen[i]])
                save_image(sheet, os.path.join(output_dir, f"val_b{bi}_s{i}.png"))
        n_samples += n

    # ---- CSVs (val.py:551-565) ----
    if rows:
        with open(os.path.join(output_dir, "validation_results.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)

    overall: Dict[str, float] = {"num_samples": n_samples}
    if fid is not None and fid.available and n_samples:
        overall["fid"] = fid.compute()
    for extra_key in ("perceptual", "lpips", "clip_score"):
        vals = [r[extra_key] for r in rows if extra_key in r]
        if vals:
            overall[f"{extra_key}_mean"] = float(np.mean(vals))
    for key in ("psnr", "ssim", "mse"):
        vals = np.array([r[key] for r in rows]) if rows else np.array([0.0])
        overall[f"{key}_mean"] = float(vals.mean())
        overall[f"{key}_std"] = float(vals.std())
        overall[f"{key}_min"] = float(vals.min())
        overall[f"{key}_max"] = float(vals.max())
    if batch_times:
        bt = np.array([t for t, _ in batch_times])
        n_timed = sum(n for _, n in batch_times)
        overall.update(
            {
                "batch_time_mean_s": float(bt.mean()),
                "batch_time_std_s": float(bt.std()),
                "batch_time_min_s": float(bt.min()),
                "batch_time_max_s": float(bt.max()),
                "total_inference_s": float(bt.sum()),
                "img_per_sec": float(n_timed / bt.sum()),
            }
        )
    with open(os.path.join(output_dir, "overall_metrics.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric", "value"])
        for k, v in overall.items():
            w.writerow([k, v])
    return overall
