"""Queue mover: return DB-unprocessed zips to the processing queue
(reference src/data/cleaning/move_unfiltered.py:34-66)."""

from __future__ import annotations

import argparse
import os
import shutil
from glob import glob

from .progress_db import ProgressDB


def move_unprocessed_files(staging_dir: str, queue_dir: str, db_path: str) -> int:
    db = ProgressDB(db_path)
    os.makedirs(queue_dir, exist_ok=True)
    moved = 0
    for zp in sorted(glob(os.path.join(staging_dir, "*.zip"))):
        name = os.path.basename(zp)
        if not db.is_processed(name):
            shutil.move(zp, os.path.join(queue_dir, name))
            moved += 1
    return moved


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--staging-dir", required=True)
    p.add_argument("--queue-dir", required=True)
    p.add_argument("--db", required=True)
    args = p.parse_args(argv)
    n = move_unprocessed_files(args.staging_dir, args.queue_dir, args.db)
    print(f"moved {n} unprocessed zips back to the queue")


if __name__ == "__main__":
    main()
