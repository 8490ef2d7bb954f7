"""Offline toolchain tests: contrast filter, caption pipeline (heuristic
backend), queue mover, render output validation/zip, EDA."""

import io
import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from tests.test_data import make_zip
from tools.cleaning.filter_by_contrast import contrast_score, filter_sample, main as contrast_main
from tools.cleaning.caption_filter import (
    HeuristicCaptioner,
    add_prompt_to_zip,
    main as caption_main,
)
from tools.cleaning.move_unfiltered import move_unprocessed_files
from tools.cleaning.progress_db import ProgressDB
from tools.rendering.orchestrate import (
    CSVLogBook,
    validate_render_output,
    zip_render_output,
)


def flat_zip(path, value=128, num_views=2, size=16):
    """Zip whose renders are a constant color (zero contrast)."""
    with zipfile.ZipFile(path, "w") as z:
        for v in range(num_views):
            img = Image.new("RGB", (size, size), (value, value, value))
            buf = io.BytesIO()
            img.save(buf, "PNG")
            z.writestr(f"{v:03d}.png", buf.getvalue())
            buf = io.BytesIO()
            np.save(buf, np.eye(4, dtype=np.float32))
            z.writestr(f"{v:03d}.npy", buf.getvalue())


def test_contrast_score_flat_vs_noisy(tmp_path):
    flat = tmp_path / "flat.zip"
    flat_zip(flat)
    accept, min_score, scores = filter_sample(str(flat))
    assert not accept and min_score < 1.0

    noisy = tmp_path / "noisy.zip"
    make_zip(noisy, num_views=2, size=16)
    accept, min_score, _ = filter_sample(str(noisy))
    assert accept and min_score > 10.0


def test_contrast_filter_cli_moves_and_resumes(tmp_path):
    inp, out, rej = tmp_path / "in", tmp_path / "out", tmp_path / "rej"
    inp.mkdir()
    flat_zip(inp / "flat.zip")
    make_zip(inp / "good.zip", num_views=2, size=16)
    db = str(tmp_path / "db.sqlite")
    contrast_main([
        "--input-dir", str(inp), "--output-dir", str(out),
        "--rejected-dir", str(rej), "--db", db,
    ])
    assert (out / "good.zip").exists()
    assert (rej / "flat.zip").exists()
    # resume: re-run is a no-op
    contrast_main([
        "--input-dir", str(inp), "--output-dir", str(out),
        "--rejected-dir", str(rej), "--db", db,
    ])


def test_caption_pipeline_heuristic(tmp_path):
    inp, out, rej = tmp_path / "in", tmp_path / "out", tmp_path / "rej"
    inp.mkdir()
    make_zip(inp / "obj.zip", num_views=3, size=16, prompt="old prompt")
    flat_zip(inp / "empty.zip")
    caption_main([
        "--input-dir", str(inp), "--output-dir", str(out),
        "--rejected-dir", str(rej), "--backend", "heuristic",
        "--db", str(tmp_path / "db.sqlite"),
    ])
    assert (out / "obj.zip").exists()
    assert (rej / "empty.zip").exists()
    with zipfile.ZipFile(out / "obj.zip") as z:
        prompt = z.read("prompt.txt").decode()
    assert "3D object" in prompt  # injected distilled prompt replaced the old one


def test_add_prompt_replaces_existing(tmp_path):
    zp = tmp_path / "a.zip"
    make_zip(zp, num_views=2, size=16, prompt="old")
    add_prompt_to_zip(str(zp), "new prompt")
    with zipfile.ZipFile(zp) as z:
        assert z.read("prompt.txt").decode() == "new prompt"
        assert sum(1 for n in z.namelist() if n.endswith("prompt.txt")) == 1


def test_move_unprocessed(tmp_path):
    staging, queue = tmp_path / "staging", tmp_path / "queue"
    staging.mkdir()
    flat_zip(staging / "a.zip")
    flat_zip(staging / "b.zip")
    db = ProgressDB(str(tmp_path / "db.sqlite"))
    db.mark("a.zip", "accepted")
    n = move_unprocessed_files(str(staging), str(queue), str(tmp_path / "db.sqlite"))
    assert n == 1
    assert (queue / "b.zip").exists() and (staging / "a.zip").exists()


def test_validate_and_zip_render_output(tmp_path):
    out = tmp_path / "render"
    out.mkdir()
    for i in range(3):
        Image.new("RGB", (8, 8)).save(out / f"{i:03d}.png")
        np.save(out / f"{i:03d}.npy", np.eye(4, dtype=np.float32))
    (out / "num_renders.txt").write_text("3")
    (out / "metadata.json").write_text("{}")
    assert validate_render_output(str(out)) == 3

    zp = tmp_path / "packed.zip"
    zip_render_output(str(out), str(zp))
    with zipfile.ZipFile(zp) as z:
        assert "000.png" in z.namelist() and "002.npy" in z.namelist()

    (out / "002.png").unlink()
    with pytest.raises(RuntimeError):
        validate_render_output(str(out))


def test_render_gso_per_gpu_pinning(tmp_path):
    """Parallel GSO rendering pins each Blender worker to a GPU via
    CUDA_VISIBLE_DEVICES (reference render_gso.py:151-158)."""
    from tools.rendering.render_gso import render_gso_dataset

    # fake blender: records its CUDA_VISIBLE_DEVICES and writes a valid
    # render-output dir (the orchestrator validates + zips it)
    fake = tmp_path / "fake_blender.py"
    fake.write_text(
        """#!/usr/bin/env python
import json, os, sys
import numpy as np
from PIL import Image
args = sys.argv[sys.argv.index("--") + 1 :]
out = args[args.index("--output-dir") + 1]
os.makedirs(out, exist_ok=True)
for i in range(2):
    Image.new("RGB", (4, 4)).save(os.path.join(out, f"{i:03d}.png"))
    np.save(os.path.join(out, f"{i:03d}.npy"), np.eye(4, dtype=np.float32))
open(os.path.join(out, "num_renders.txt"), "w").write("2")
open(os.path.join(out, "metadata.json"), "w").write("{}")
with open(os.path.join(os.environ["PIN_LOG_DIR"], f"pin_{os.getpid()}.json"), "w") as f:
    json.dump({"gpu": os.environ.get("CUDA_VISIBLE_DEVICES")}, f)
"""
    )
    fake.chmod(0o755)
    # a "blender" bin that execs the python script (run_blender passes
    # --background --python <script> -- <args>; the fake ignores them)
    import sys as _sys

    bin_ = tmp_path / "blender"
    bin_.write_text(f'#!/bin/sh\nexec {_sys.executable} {fake} "$@"\n')
    bin_.chmod(0o755)

    gso = tmp_path / "gso"
    gso.mkdir()
    for name in ("obj_a", "obj_b", "obj_c"):
        with zipfile.ZipFile(gso / f"{name}.zip", "w") as z:
            z.writestr("meshes/model.obj", "v 0 0 0\n")
            z.writestr("materials/textures/texture.png", b"png")

    pin_dir = tmp_path / "pins"
    pin_dir.mkdir()
    os.environ["PIN_LOG_DIR"] = str(pin_dir)
    try:
        n = render_gso_dataset(
            str(gso), str(tmp_path / "renders"), str(tmp_path / "logs"),
            blender_bin=str(bin_), num_gpus=2,
        )
    finally:
        del os.environ["PIN_LOG_DIR"]
    assert n == 3
    zips = sorted(os.listdir(tmp_path / "renders"))
    assert zips == ["obj_a.zip", "obj_b.zip", "obj_c.zip"]
    pins = sorted(
        json.load(open(pin_dir / p))["gpu"] for p in os.listdir(pin_dir)
    )
    # 3 objects over 2 GPUs round-robin: gpus {0, 1} both used
    assert set(pins) == {"0", "1"} and len(pins) == 3


def test_csv_logbook_resume(tmp_path):
    lb = CSVLogBook(str(tmp_path))
    lb.success("uid1", "8 views")
    lb.failure("uid2", "crashed")
    assert lb.succeeded_uids() == {"uid1"}
    lb2 = CSVLogBook(str(tmp_path))
    assert lb2.succeeded_uids() == {"uid1"}


def test_eda(tmp_path):
    data = tmp_path / "data" / "renders_final"
    data.mkdir(parents=True)
    make_zip(data / "a.zip", num_views=3, size=16, prompt="a wooden chair model")
    from tools.eda.analyze_corpus import main as eda_main

    out = tmp_path / "eda"
    eda_main(["--data-dir", str(tmp_path / "data"), "--output-dir", str(out)])
    assert (out / "corpus_stats.csv").exists()
    summary = json.loads((out / "summary.json").read_text())
    assert summary["num_objects"] == 1
    assert summary["view_histogram"] == {"3": 1} or summary["view_histogram"] == {3: 1}


def test_eda_report(tmp_path):
    """Full report over a synthetic corpus CSV: profile HTML, LDA topics,
    distribution plots, wordcloud (reference objaverse_report.py:75-561)."""
    import csv as csv_mod
    import random

    rng = random.Random(0)
    nouns = ["chair", "table", "lamp", "robot", "car", "tree", "house", "boat"]
    adjs = ["wooden", "red", "metal", "small", "tall", "round"]
    rows = []
    for i in range(40):
        prompt = f"{rng.choice(adjs)} {rng.choice(nouns)} {rng.choice(adjs)} {rng.choice(nouns)}"
        rows.append(
            {
                "name": f"obj_{i}.zip",
                "size_mb": round(rng.uniform(0.5, 5.0), 3),
                "num_views": rng.choice([6, 8, 12]),
                "prompt": prompt,
                "prompt_words": len(prompt.split()),
                "min_contrast": round(rng.uniform(5, 80), 2),
            }
        )
    csv_path = tmp_path / "corpus_stats.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv_mod.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    from tools.eda.report import generate_report, lda_topics, word_frequencies

    out = tmp_path / "report"
    info = generate_report(str(csv_path), str(out))
    assert info["rows"] == 40
    assert (out / "profile_report.html").exists()
    assert (out / "prompt_topics_lda.csv").exists()
    assert (out / "distribution_size_mb.png").exists()
    assert (out / "distribution_render_count_bar.png").exists()
    assert (out / "wordcloud_prompts.png").exists()
    assert (out / "scatter_prompt_words_vs_size_mb.png").exists()

    topics = lda_topics([r["prompt"] for r in rows], num_topics=4)
    assert len(topics) == 4
    assert all(t["Top_Words"] for t in topics)
    freqs = word_frequencies([r["prompt"] for r in rows])
    assert freqs and all(w not in ("the", "and") for w, _ in freqs)


def test_blender_camera_tables():
    """camera_positions_for reproduces the reference's fixed rings
    (blender_script.py:1041-1058, 906-941): alternating +20/-10 elevation,
    counter-clockwise azimuths, radius 1.8; random-sphere fallback for
    other counts respects the radius and hemisphere flag."""
    import math
    import random

    from tools.rendering.blender_script import CAMERA_RADIUS, camera_positions_for

    for n in (6, 8, 12):
        pos = camera_positions_for(n)
        assert len(pos) == n
        for i, (x, y, z) in enumerate(pos):
            r = math.sqrt(x * x + y * y + z * z)
            assert abs(r - CAMERA_RADIUS) < 1e-6
            want_el = 20.0 if i % 2 == 0 else -10.0
            el = math.degrees(math.asin(z / r))
            assert abs(el - want_el) < 1e-6
    # 8 views: first azimuth 0 -> +x axis; second azimuth -45° (negated)
    pos8 = camera_positions_for(8)
    assert abs(pos8[0][1]) < 1e-9 and pos8[0][0] > 0
    assert pos8[1][1] < 0  # clockwise-negated sweep goes to -y first

    rng = random.Random(0)
    pos5 = camera_positions_for(5, rng=rng, only_northern_hemisphere=True)
    assert len(pos5) == 5
    for x, y, z in pos5:
        assert z >= 0
        assert abs(math.sqrt(x * x + y * y + z * z) - CAMERA_RADIUS) < 1e-6


def test_downloader_filters_and_logbooks(tmp_path):
    """download_objaverse: source/file-type filters and the per-object CSV
    logbooks (reference download_objaverse.py:28-85) — offline, via a
    pandas-like shim."""
    import pandas as pd

    from tools.downloaders.download_objaverse import CsvLogbook, filter_annotations

    ann = pd.DataFrame(
        {
            "source": ["sketchfab", "github", "sketchfab"],
            "fileIdentifier": ["a/x.glb", "b/y.OBJ", "c/z.fbx"],
            "repoSizeMB": [10, 500, 20],
        }
    )
    out = filter_annotations(ann, sources=["sketchfab"])
    assert list(out["fileIdentifier"]) == ["a/x.glb", "c/z.fbx"]
    out = filter_annotations(ann, file_types=["glb", ".obj"])
    assert list(out["fileIdentifier"]) == ["a/x.glb", "b/y.OBJ"]
    out = filter_annotations(ann, max_repo_mb=100)
    assert len(out) == 2

    lb = CsvLogbook(str(tmp_path / "ok.csv"))
    lb.log(sha256="s1", source="github", identifier="b/y.OBJ", detail="/tmp/y")
    lb2 = CsvLogbook(str(tmp_path / "ok.csv"))  # append, not truncate
    lb2.log(sha256="s2", source="sketchfab", identifier="a/x.glb")
    rows = open(tmp_path / "ok.csv").read().strip().splitlines()
    assert len(rows) == 3 and rows[0].startswith("timestamp")


def test_gso_download_retry(tmp_path, monkeypatch):
    """download_gso retries with backoff and re-raises after the last
    attempt; existing files short-circuit as skipped."""
    from tools.downloaders import download_gso

    calls = []

    def flaky(name, out_dir):
        calls.append(name)
        if len(calls) < 3:
            raise OSError("transient")
        return True

    monkeypatch.setattr(download_gso, "download_model", flaky)
    monkeypatch.setattr(download_gso.time, "sleep", lambda s: None)
    assert download_gso.download_with_retry("m", str(tmp_path)) is True
    assert len(calls) == 3

    calls.clear()
    monkeypatch.setattr(
        download_gso, "download_model",
        lambda n, d: (_ for _ in ()).throw(OSError("down")),
    )
    with pytest.raises(OSError):
        download_gso.download_with_retry("m", str(tmp_path), attempts=2)
