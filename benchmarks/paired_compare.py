"""Paired per-image comparison of two models' generations vs ground truth.

The mean-PSNR gap between the conditioned and the ablated model could in
principle be driven by a few outlier pairs; a PAIRED analysis (same
(source, target) pair, same seed, per-image delta) is the statistically
honest version of the EVIDENCE.md cam-vs-nocam contrast. Consumes the
``gen/<label>.npz`` stacks written by ``view_synthesis_eval.py --save-gen``
and rebuilds the ground-truth pair list exactly the way the eval harness
does (same dataset split, object count, target spread).

Usage:
  python benchmarks/paired_compare.py --dataset-path <corpus> \
      --a cam=eval/gen/cam.npz --b nocam=eval/gen/nocam.npz \
      --num-objects 30
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
from typing import Optional, Sequence

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from view_synthesis_eval import load_view, target_view_indices  # noqa: E402


def main(argv: Optional[Sequence[str]] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-path", required=True)
    ap.add_argument("--a", required=True, help="label=gen.npz (model A)")
    ap.add_argument("--b", required=True, help="label=gen.npz (model B)")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--num-objects", type=int, default=30)
    ap.add_argument("--targets-per-object", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mvd_tpu.data.objaverse import ObjaverseDataset
    from mvd_tpu.metrics.image import psnr_per_image, ssim

    te = ObjaverseDataset(args.dataset_path, "test", image_size=args.image_size)
    files = te.files[: args.num_objects]
    gts = []
    for zp in files:
        _, _, _, n_views = load_view(zp, 0, args.image_size)
        for v in target_view_indices(n_views, args.targets_per_object):
            tgt_img, _, _, _ = load_view(zp, v, args.image_size)
            gts.append((tgt_img + 1.0) / 2.0)
    gt01 = jnp.asarray(np.stack(gts))

    label_a, path_a = args.a.split("=", 1)
    label_b, path_b = args.b.split("=", 1)
    stacks = {}
    for label, path in ((label_a, path_a), (label_b, path_b)):
        imgs = np.load(path)["images"]
        if imgs.shape[0] != gt01.shape[0]:
            raise SystemExit(
                f"{label}: {imgs.shape[0]} generations != {gt01.shape[0]} "
                "ground-truth pairs — num-objects/targets must match the "
                "eval run"
            )
        x = jnp.asarray(imgs)
        stacks[label] = {
            "psnr": np.asarray(psnr_per_image(x, gt01, data_range=1.0)),
            "ssim": np.asarray(ssim(x, gt01, data_range=1.0, per_image=True)),
        }

    result = {"a": label_a, "b": label_b, "n": int(gt01.shape[0])}
    for metric in ("psnr", "ssim"):
        da = stacks[label_a][metric]
        db = stacks[label_b][metric]
        delta = da - db
        n = delta.shape[0]
        mean = float(delta.mean())
        sem = float(delta.std(ddof=1) / math.sqrt(n))
        result[metric] = {
            f"{label_a}_mean": float(da.mean()),
            f"{label_b}_mean": float(db.mean()),
            "delta_mean": mean,
            "delta_sem": sem,
            "t_stat": mean / sem if sem > 0 else float("inf"),
            "win_rate": float((delta > 0).mean()),
        }
        print(
            f"{metric}: {label_a} {da.mean():.3f} vs {label_b} {db.mean():.3f}"
            f" | paired Δ {mean:+.3f} ± {sem:.3f} (t={result[metric]['t_stat']:.1f},"
            f" {label_a} wins {100 * result[metric]['win_rate']:.0f}% of {n} pairs)"
        )
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
