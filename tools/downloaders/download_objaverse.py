"""Chunked, resumable Objaverse-XL bulk downloader.

Rebuild of reference src/data/downloaders/download_objaverse.py:20-218
(the reference marks its own copy "don't use" — kept for inventory parity):
annotations are filtered by source / file type (reference :28-52), split
into chunks, each chunk downloads with exponential-backoff retry
(reference :162-218), per-object outcomes append to success/failure CSV
logbooks (reference :54-85), and progress (completed/failed chunk ids) is
tracked in a JSON file so interrupted runs resume (reference :99-116,
183-191)."""

from __future__ import annotations

import argparse
import csv
import json
import logging
import os
import time
from datetime import datetime

logger = logging.getLogger(__name__)


class ChunkProgress:
    def __init__(self, path: str):
        self.path = path
        self.state = {"done": [], "failed": []}
        if os.path.exists(path):
            with open(path) as f:
                self.state = json.load(f)

    def save(self):
        with open(self.path, "w") as f:
            json.dump(self.state, f)

    def mark(self, chunk_id: int, ok: bool):
        key = "done" if ok else "failed"
        if chunk_id not in self.state[key]:
            self.state[key].append(chunk_id)
        self.save()

    def is_done(self, chunk_id: int) -> bool:
        return chunk_id in self.state["done"]


class CsvLogbook:
    """Append-only per-object outcome log (reference :54-85). One file per
    outcome; rows carry a timestamp so interleaved runs stay auditable."""

    FIELDS = ("timestamp", "sha256", "source", "identifier", "detail")

    def __init__(self, path: str):
        self.path = path
        new = not os.path.exists(path)
        self._f = open(path, "a", newline="")
        self._w = csv.DictWriter(self._f, fieldnames=self.FIELDS)
        if new:
            self._w.writeheader()

    def log(self, sha256="", source="", identifier="", detail=""):
        self._w.writerow({
            "timestamp": datetime.now().isoformat(timespec="seconds"),
            "sha256": sha256, "source": source,
            "identifier": identifier, "detail": detail,
        })
        self._f.flush()


def filter_annotations(ann, sources=None, file_types=None, max_repo_mb=None):
    """Source / file-type / repo-size filters (reference :28-52 and the
    render orchestrator's shared filter set, rendering/main.py:487-553)."""
    if sources:
        ann = ann[ann["source"].isin(list(sources))]
    if file_types:
        types = {t.lower().lstrip(".") for t in file_types}
        ext = ann["fileIdentifier"].str.rsplit(".", n=1).str[-1].str.lower()
        ann = ann[ext.isin(types)]
    if max_repo_mb is not None and "repoSizeMB" in ann.columns:
        ann = ann[ann["repoSizeMB"] <= max_repo_mb]
    return ann


def download_chunks(
    download_dir: str,
    chunk_size: int = 500,
    limit=None,
    attempts: int = 3,
    sources=None,
    file_types=None,
):
    try:
        import objaverse.xl as oxl
    except ImportError as e:
        raise RuntimeError("objaverse package not available in this environment") from e

    os.makedirs(download_dir, exist_ok=True)
    progress = ChunkProgress(os.path.join(download_dir, "download_progress.json"))
    ok_log = CsvLogbook(os.path.join(download_dir, "downloaded.csv"))
    fail_log = CsvLogbook(os.path.join(download_dir, "failed.csv"))
    ann = oxl.get_annotations()
    ann = filter_annotations(ann, sources=sources, file_types=file_types)
    if limit:
        ann = ann.head(limit)
    n_chunks = (len(ann) + chunk_size - 1) // chunk_size

    def on_found(local_path, file_identifier, sha256, metadata):
        ok_log.log(sha256=sha256, source=metadata.get("source", ""),
                   identifier=file_identifier, detail=local_path)

    def on_missing(file_identifier, sha256, metadata):
        fail_log.log(sha256=sha256, source=metadata.get("source", ""),
                     identifier=file_identifier, detail="missing")

    for ci in range(n_chunks):
        if progress.is_done(ci):
            continue
        chunk = ann.iloc[ci * chunk_size : (ci + 1) * chunk_size]
        ok = False
        for attempt in range(attempts):
            try:
                oxl.download_objects(
                    objects=chunk,
                    download_dir=download_dir,
                    handle_found_object=on_found,
                    handle_missing_object=on_missing,
                )
                ok = True
                break
            except Exception as e:
                delay = 2.0 * (2**attempt)
                logger.warning("chunk %d attempt %d failed: %s; retry in %.0fs",
                               ci, attempt + 1, e, delay)
                time.sleep(delay)
        progress.mark(ci, ok)
    return progress.state


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--download-dir", required=True)
    p.add_argument("--chunk-size", type=int, default=500)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--sources", nargs="*", default=None,
                   help="e.g. sketchfab github (default: all)")
    p.add_argument("--file-types", nargs="*", default=None,
                   help="e.g. glb gltf obj fbx (default: all)")
    args = p.parse_args(argv)
    state = download_chunks(
        args.download_dir, args.chunk_size, args.limit,
        sources=args.sources, file_types=args.file_types,
    )
    print(f"done={len(state['done'])} failed={len(state['failed'])}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
