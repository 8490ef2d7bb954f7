"""Corpus EDA: per-zip statistics CSV + summary report.

Rebuild of reference src/data/eda/analyze_objaverse.py:67-153 and the core
of objaverse_report.py:75-404: per-object zip size / prompt / render count /
contrast score CSV, plus aggregate stats and (optionally, when matplotlib
is present) distribution plots and a prompt word-frequency table standing
in for the reference's wordcloud/LDA."""

from __future__ import annotations

import argparse
import collections
import csv
import io
import json
import os
import re
import zipfile
from glob import glob

import numpy as np


def analyze_zip(zp: str):
    from tools.cleaning.filter_by_contrast import contrast_score

    size_mb = os.path.getsize(zp) / 1e6
    prompt = ""
    n_views = 0
    min_contrast = None
    with zipfile.ZipFile(zp) as z:
        for name in z.namelist():
            base = os.path.splitext(os.path.basename(name))[0]
            if name.endswith(".png") and base.isdigit():
                n_views += 1
                c = contrast_score(z.read(name))
                min_contrast = c if min_contrast is None else min(min_contrast, c)
            elif name.endswith("prompt.txt"):
                prompt = z.read(name).decode("utf-8", "replace").strip()
    return {
        "name": os.path.basename(zp),
        "size_mb": round(size_mb, 3),
        "num_views": n_views,
        "prompt": prompt,
        "prompt_words": len(prompt.split()),
        "min_contrast": round(min_contrast or 0.0, 2),
    }


def word_frequencies(prompts, top_k=50):
    stop = set("a an the of and with on in is are this that for to its it".split())
    counter = collections.Counter()
    for p in prompts:
        for w in re.findall(r"[a-z]+", p.lower()):
            if w not in stop and len(w) > 2:
                counter[w] += 1
    return counter.most_common(top_k)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--plots", action="store_true")
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    zips = sorted(glob(os.path.join(args.data_dir, "renders_final", "*.zip"))) or sorted(
        glob(os.path.join(args.data_dir, "*.zip"))
    )
    rows = []
    for zp in zips:
        try:
            rows.append(analyze_zip(zp))
        except Exception as e:
            rows.append({"name": os.path.basename(zp), "size_mb": -1, "num_views": 0,
                         "prompt": f"ERROR: {e}", "prompt_words": 0, "min_contrast": 0})

    csv_path = os.path.join(args.output_dir, "corpus_stats.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()) if rows else ["name"])
        w.writeheader()
        w.writerows(rows)

    sizes = np.array([r["size_mb"] for r in rows if r["size_mb"] >= 0])
    views = np.array([r["num_views"] for r in rows])
    summary = {
        "num_objects": len(rows),
        "total_size_mb": float(sizes.sum()) if len(sizes) else 0.0,
        "mean_size_mb": float(sizes.mean()) if len(sizes) else 0.0,
        "view_histogram": {int(k): int(v) for k, v in
                           zip(*np.unique(views, return_counts=True))} if len(views) else {},
        "top_words": word_frequencies([r["prompt"] for r in rows]),
    }
    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    if args.plots:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(1, 2, figsize=(10, 4))
            axes[0].hist(sizes, bins=30)
            axes[0].set_title("zip size (MB)")
            axes[1].hist(views, bins=range(0, 16))
            axes[1].set_title("views per object")
            fig.savefig(os.path.join(args.output_dir, "distributions.png"))
        except ImportError:
            print("matplotlib unavailable; skipping plots")

    print(json.dumps({k: v for k, v in summary.items() if k != "top_words"}))


if __name__ == "__main__":
    main()
