"""Chunked, resumable Objaverse-XL bulk downloader.

Rebuild of reference src/data/downloaders/download_objaverse.py:87-218
(the reference marks its own copy "don't use" — kept for inventory parity):
annotations are split into chunks, each chunk downloads with
exponential-backoff retry, and progress (completed/failed chunk ids) is
tracked in a JSON file so interrupted runs resume."""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

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


def download_chunks(
    download_dir: str,
    chunk_size: int = 500,
    limit=None,
    attempts: int = 3,
):
    try:
        import objaverse.xl as oxl
    except ImportError as e:
        raise RuntimeError("objaverse package not available in this environment") from e

    os.makedirs(download_dir, exist_ok=True)
    progress = ChunkProgress(os.path.join(download_dir, "download_progress.json"))
    ann = oxl.get_annotations()
    if limit:
        ann = ann.head(limit)
    n_chunks = (len(ann) + chunk_size - 1) // chunk_size
    for ci in range(n_chunks):
        if progress.is_done(ci):
            continue
        chunk = ann.iloc[ci * chunk_size : (ci + 1) * chunk_size]
        ok = False
        for attempt in range(attempts):
            try:
                oxl.download_objects(objects=chunk, download_dir=download_dir)
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
    args = p.parse_args(argv)
    state = download_chunks(args.download_dir, args.chunk_size, args.limit)
    print(f"done={len(state['done'])} failed={len(state['failed'])}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
