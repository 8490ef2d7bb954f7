"""Contrast filter: reject objects with washed-out/empty renders.

Rebuild of reference src/data/cleaning/filter_by_contrast.py:1-293 with
numpy/PIL instead of OpenCV: score = per-view grayscale std-dev; an object
is rejected if ANY view scores below the threshold (default 10.0,
reference :40-46). Accepted zips move to ``renders_final/``, rejected to
``rejected/``; progress tracked in SQLite so the job is resumable
(reference :48-61, 177-289).

Usage:
    python -m tools.cleaning.filter_by_contrast --input-dir DATA/renders \
        --output-dir DATA/renders_final --rejected-dir DATA/rejected
"""

from __future__ import annotations

import argparse
import io
import logging
import os
import shutil
import zipfile
from glob import glob
from typing import List, Tuple

import numpy as np

from .progress_db import ProgressDB

logger = logging.getLogger(__name__)

DEFAULT_THRESHOLD = 10.0


def contrast_score(png_bytes: bytes) -> float:
    """Grayscale std-dev of a render, RGBA composited onto white."""
    from PIL import Image

    img = Image.open(io.BytesIO(png_bytes))
    if img.mode == "RGBA":
        bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
        img = Image.alpha_composite(bg, img)
    gray = np.asarray(img.convert("L"), dtype=np.float64)
    return float(gray.std())


def score_zip(zip_path: str) -> List[Tuple[str, float]]:
    scores = []
    with zipfile.ZipFile(zip_path) as z:
        for name in z.namelist():
            base = os.path.splitext(os.path.basename(name))[0]
            if name.endswith(".png") and base.isdigit():
                scores.append((name, contrast_score(z.read(name))))
    return scores


def filter_sample(zip_path: str, threshold: float = DEFAULT_THRESHOLD):
    """(accept: bool, min_score, per_view_scores). Reject if any view is
    under the threshold (reference filter_by_contrast.py:115-174)."""
    scores = score_zip(zip_path)
    if not scores:
        return False, 0.0, scores
    min_score = min(s for _, s in scores)
    return min_score >= threshold, min_score, scores


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--rejected-dir", required=True)
    p.add_argument("--db", default=None)
    p.add_argument("--threshold", type=float, default=DEFAULT_THRESHOLD)
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(args.rejected_dir, exist_ok=True)
    db = ProgressDB(args.db or os.path.join(args.input_dir, "contrast_filter.db"))

    zips = sorted(glob(os.path.join(args.input_dir, "*.zip")))
    n_acc = n_rej = n_skip = 0
    for zp in zips:
        name = os.path.basename(zp)
        if db.is_processed(name):
            n_skip += 1
            continue
        try:
            accept, min_score, _ = filter_sample(zp, args.threshold)
        except Exception as e:
            logger.warning("unreadable %s: %s", zp, e)
            db.mark(name, "error", str(e))
            continue
        dest = args.output_dir if accept else args.rejected_dir
        shutil.move(zp, os.path.join(dest, name))
        db.mark(name, "accepted" if accept else "rejected", f"min={min_score:.2f}")
        n_acc += accept
        n_rej += not accept
    print(f"accepted={n_acc} rejected={n_rej} skipped={n_skip}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
