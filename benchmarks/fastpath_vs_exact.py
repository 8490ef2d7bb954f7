"""Score approximate fast-path generations against the exact trajectory.

Consumes the per-model ``gen/<label>.npz`` stacks written by
``benchmarks/view_synthesis_eval.py --save-gen`` and reports, for each
approximate sampler/encoder-reuse run, the per-image PSNR/SSIM against the
EXACT 20-step DDPM output of the same trained checkpoint on the same
(source, target) pairs and seed — the "how far from the exact trajectory"
number VERDICT r3 Next #3 asks for next to the gen-vs-ground-truth metrics.

Usage:
  python benchmarks/fastpath_vs_exact.py --exact eval/gen/cam.npz \
      --approx dpmpp10=eval_dpmpp10/gen/cam.npz \
      --approx reuse2=eval_reuse2/gen/cam.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional, Sequence

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv: Optional[Sequence[str]] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--exact", required=True, help="gen npz of the exact run")
    ap.add_argument(
        "--approx", action="append", required=True, help="label=gen.npz"
    )
    ap.add_argument("--out", default=None, help="optional output json path")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mvd_tpu.metrics.image import psnr_per_image, ssim

    exact = np.load(args.exact)["images"]
    rows = []
    for spec in args.approx:
        label, path = spec.split("=", 1)
        approx = np.load(path)["images"]
        if approx.shape != exact.shape:
            raise SystemExit(
                f"{label}: shape {approx.shape} != exact {exact.shape} — "
                "the runs must use the same pairs/batching"
            )
        p = np.asarray(
            psnr_per_image(jnp.asarray(approx), jnp.asarray(exact), data_range=1.0)
        )
        s = np.asarray(
            ssim(jnp.asarray(approx), jnp.asarray(exact), data_range=1.0, per_image=True)
        )
        rows.append(
            {
                "label": label,
                "n": int(p.shape[0]),
                "psnr_vs_exact_mean": float(p.mean()),
                "psnr_vs_exact_std": float(p.std()),
                "ssim_vs_exact_mean": float(np.atleast_1d(s).mean()),
            }
        )
        print(
            f"[{label}] vs exact: PSNR {rows[-1]['psnr_vs_exact_mean']:.2f}"
            f"±{rows[-1]['psnr_vs_exact_std']:.2f} dB, "
            f"SSIM {rows[-1]['ssim_vs_exact_mean']:.4f}"
        )
    table = {"exact": args.exact, "results": rows}
    print(json.dumps(table, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2)


if __name__ == "__main__":
    main()
