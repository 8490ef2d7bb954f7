"""Corpus EDA report: profiling HTML + distribution/scatter plots + prompt
wordcloud + LDA topic modeling.

Rebuild of reference src/data/eda/objaverse_report.py:75-561 over the
corpus_stats.csv produced by analyze_corpus.py:

  * per-column profile report (the reference uses ydata-profiling, absent
    here — a hand-rolled HTML with describe()-style stats + histograms),
  * distribution histograms with mean/std markers + CSV data dumps
    (objaverse_report.py:181-246),
  * render-count bar chart, scatter pairs, mean-contrast-per-render-count
    bar (objaverse_report.py:249-366),
  * prompt wordcloud (objaverse_report.py:443-480; the wordcloud package is
    not available, so a compact spiral-placement renderer is implemented on
    matplotlib directly — same stopword list),
  * LDA topic modeling via sklearn CountVectorizer +
    LatentDirichletAllocation (objaverse_report.py:472-539: 20 topics, 10
    top words, online learning, seed 42), topics CSV.
"""

from __future__ import annotations

import argparse
import collections
import csv
import html
import json
import math
import os
import re
from typing import Dict, List, Optional

import numpy as np

# the reference's stopword list (objaverse_report.py:351-442)
STOPWORDS = set(
    """create image the and made a it has an this that these makes of should
    shape with overall without or not but if else elif while for in to as
    from by on off up down left right center top bottom front back be giving
    have object slightly three dimensional edge creating shade possibly
    texture is are model render rendering style detailed realistic view
    angle high quality low poly game asset art abstract background light
    lighting shadow color surface material minimalist futuristic vintage
    concept""".split()
)

NUMERIC_COLS = ["size_mb", "prompt_words", "min_contrast"]


def load_rows(csv_path: str) -> List[Dict]:
    with open(csv_path) as f:
        return list(csv.DictReader(f))


def _col(rows, name, cast=float):
    out = []
    for r in rows:
        try:
            out.append(cast(r[name]))
        except (KeyError, ValueError, TypeError):
            pass
    return np.asarray(out)


def describe(x: np.ndarray) -> Dict[str, float]:
    if len(x) == 0:
        return {}
    return {
        "count": int(len(x)),
        "mean": float(x.mean()),
        "std": float(x.std(ddof=1)) if len(x) > 1 else 0.0,
        "min": float(x.min()),
        "p25": float(np.percentile(x, 25)),
        "p50": float(np.percentile(x, 50)),
        "p75": float(np.percentile(x, 75)),
        "max": float(x.max()),
    }


def profile_report_html(rows: List[Dict], out_path: str):
    """describe()-style per-column profile (stand-in for ydata-profiling,
    objaverse_report.py:75-88)."""
    parts = [
        "<html><head><title>Corpus EDA Profile Report</title></head><body>",
        f"<h1>Corpus EDA Profile Report</h1><p>{len(rows)} objects</p>",
    ]
    for col in NUMERIC_COLS + ["num_views"]:
        x = _col(rows, col)
        d = describe(x)
        if not d:
            continue
        parts.append(f"<h2>{html.escape(col)}</h2><table border=1>")
        parts.append(
            "".join(f"<tr><td>{k}</td><td>{v:.4g}</td></tr>" for k, v in d.items())
        )
        parts.append("</table>")
        hist, edges = np.histogram(x, bins=min(20, max(3, len(set(x.tolist())))))
        parts.append("<pre>")
        peak = hist.max() or 1
        for h, e in zip(hist, edges):
            parts.append(f"{e:>12.3f} | {'#' * int(40 * h / peak)} {h}\n")
        parts.append("</pre>")
    missing = {
        col: sum(1 for r in rows if not r.get(col))
        for col in (rows[0].keys() if rows else [])
    }
    parts.append("<h2>missing values</h2><pre>" + json.dumps(missing, indent=2) + "</pre>")
    parts.append("</body></html>")
    with open(out_path, "w") as f:
        f.write("".join(parts))


# ---------------------------------------------------------------------------
# wordcloud (spiral placement; the wordcloud package is not in this image)
# ---------------------------------------------------------------------------


def word_frequencies(prompts: List[str], top_k: int = 80):
    counter = collections.Counter()
    for p in prompts:
        for w in re.findall(r"[a-z]+", str(p).lower()):
            if w not in STOPWORDS and len(w) > 2:
                counter[w] += 1
    return counter.most_common(top_k)


def render_wordcloud(freqs, out_path: str, width=800, height=400, seed=42):
    """Greedy spiral-placement wordcloud on matplotlib: font size scales with
    sqrt(frequency), words walk an Archimedean spiral from the center until
    their bounding box stops colliding (objaverse_report.py:452-460
    equivalent output, original implementation)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not freqs:
        return
    rng = np.random.default_rng(seed)
    fig = plt.figure(figsize=(width / 100, height / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_xlim(0, width)
    ax.set_ylim(0, height)
    ax.axis("off")
    fig.patch.set_facecolor("white")

    fmax = freqs[0][1]
    placed = []  # (x0, y0, x1, y1)
    renderer = fig.canvas.get_renderer() if hasattr(fig.canvas, "get_renderer") else None
    cmap = plt.get_cmap("viridis")
    for word, f in freqs:
        size = 10 + 54 * math.sqrt(f / fmax)
        t = ax.text(
            0, 0, word, fontsize=size,
            color=cmap(rng.uniform(0.0, 0.85)),
            ha="center", va="center",
        )
        bb = t.get_window_extent(renderer=renderer)
        w, h = bb.width, bb.height
        ok = False
        theta0 = rng.uniform(0, 2 * math.pi)
        for step in range(400):
            r = 4.0 * step**0.6
            theta = theta0 + step * 0.35
            x = width / 2 + r * math.cos(theta)
            y = height / 2 + 0.5 * r * math.sin(theta)
            box = (x - w / 2, y - h / 2, x + w / 2, y + h / 2)
            if box[0] < 0 or box[1] < 0 or box[2] > width or box[3] > height:
                continue
            if all(
                box[2] <= p[0] or box[0] >= p[2] or box[3] <= p[1] or box[1] >= p[3]
                for p in placed
            ):
                t.set_position((x, y))
                placed.append(box)
                ok = True
                break
        if not ok:
            t.remove()
    fig.savefig(out_path)
    plt.close(fig)


# ---------------------------------------------------------------------------
# LDA topics (sklearn, as the reference uses — objaverse_report.py:472-539)
# ---------------------------------------------------------------------------


def lda_topics(
    prompts: List[str],
    num_topics: int = 20,
    num_top_words: int = 10,
    min_df: int = 2,
) -> List[Dict[str, str]]:
    from sklearn.decomposition import LatentDirichletAllocation
    from sklearn.feature_extraction.text import CountVectorizer

    prompts = [str(p) for p in prompts if str(p).strip()]
    if len(prompts) <= 10:
        return []
    vectorizer = CountVectorizer(
        max_df=0.95, min_df=min_df, stop_words=list(STOPWORDS), lowercase=True
    )
    dtm = vectorizer.fit_transform(prompts)
    feature_names = vectorizer.get_feature_names_out()
    num_topics = min(num_topics, max(2, dtm.shape[1]))
    lda = LatentDirichletAllocation(
        n_components=num_topics, random_state=42, learning_method="online"
    )
    lda.fit(dtm)
    out = []
    for idx, weights in enumerate(lda.components_):
        top = weights.argsort()[: -num_top_words - 1 : -1]
        out.append(
            {
                "Topic_ID": f"Topic #{idx + 1}",
                "Top_Words": ", ".join(feature_names[i] for i in top),
            }
        )
    return out


# ---------------------------------------------------------------------------
# plots
# ---------------------------------------------------------------------------


def distribution_plots(rows: List[Dict], out_dir: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for col in NUMERIC_COLS:
        x = _col(rows, col)
        if len(x) == 0:
            continue
        plt.figure(figsize=(10, 4))
        plt.hist(x, bins=30)
        mu, sd = x.mean(), x.std()
        plt.axvline(mu, color="r", linestyle="--", linewidth=2, label="mean")
        plt.axvline(mu + sd, color="g", linestyle=":", linewidth=2, label="±std")
        plt.axvline(mu - sd, color="g", linestyle=":", linewidth=2)
        plt.legend()
        plt.xlabel(col)
        plt.ylabel("Frequency")
        plt.savefig(os.path.join(out_dir, f"distribution_{col}.png"), dpi=150)
        np.savetxt(
            os.path.join(out_dir, f"distribution_{col}_data.csv"),
            x, header=col, comments="", delimiter=",",
        )
        plt.close()

    views = _col(rows, "num_views", int)
    if len(views):
        vals, counts = np.unique(views, return_counts=True)
        plt.figure(figsize=(10, 4))
        plt.bar(vals, counts)
        plt.xlabel("Render Count")
        plt.ylabel("Frequency")
        plt.savefig(os.path.join(out_dir, "distribution_render_count_bar.png"), dpi=150)
        plt.close()
        # mean contrast per render count (objaverse_report.py:316-345)
        contrast = _col(rows, "min_contrast")
        if len(contrast) == len(views):
            means = [contrast[views == v].mean() for v in vals]
            plt.figure(figsize=(10, 4))
            plt.bar(vals, means)
            plt.xlabel("Render Count")
            plt.ylabel("Mean Contrast")
            plt.savefig(
                os.path.join(out_dir, "barplot_mean_contrast_vs_render_count.png"),
                dpi=150,
            )
            plt.close()

    pairs = [
        ("prompt_words", "size_mb"),
        ("min_contrast", "prompt_words"),
        ("num_views", "size_mb"),
        ("num_views", "min_contrast"),
    ]
    for xc, yc in pairs:
        x, y = _col(rows, xc), _col(rows, yc)
        if len(x) and len(x) == len(y):
            plt.figure(figsize=(10, 4))
            plt.scatter(x, y, alpha=0.5)
            plt.xlabel(xc)
            plt.ylabel(yc)
            plt.savefig(os.path.join(out_dir, f"scatter_{xc}_vs_{yc}.png"), dpi=150)
            plt.close()


# ---------------------------------------------------------------------------


def generate_report(csv_path: str, out_dir: str, plots: bool = True):
    os.makedirs(out_dir, exist_ok=True)
    rows = load_rows(csv_path)
    prompts = [r.get("prompt", "") for r in rows]

    profile_report_html(rows, os.path.join(out_dir, "profile_report.html"))

    topics = lda_topics(prompts)
    if topics:
        with open(os.path.join(out_dir, "prompt_topics_lda.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["Topic_ID", "Top_Words"])
            w.writeheader()
            w.writerows(topics)

    if plots:
        distribution_plots(rows, out_dir)
        render_wordcloud(
            word_frequencies(prompts), os.path.join(out_dir, "wordcloud_prompts.png")
        )
    return {"rows": len(rows), "topics": len(topics)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True, help="corpus_stats.csv from analyze_corpus")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--no-plots", action="store_true")
    args = p.parse_args(argv)
    info = generate_report(args.csv, args.output_dir, plots=not args.no_plots)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
