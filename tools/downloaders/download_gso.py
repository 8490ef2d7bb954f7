"""Google Scanned Objects downloader (Gazebo Fuel collection).

Rebuild of reference src/data/downloaders/download_gso.py:51-105: list the
GoogleResearch collection from the Fuel REST API page by page, then fetch
each model zip with per-file exponential-backoff retry, skipping files that
already exist (resume), appending outcomes to a CSV logbook (the pattern
shared with rendering/main.py:37-53)."""

from __future__ import annotations

import argparse
import csv
import json
import logging
import os
import time
import urllib.parse
import urllib.request
from datetime import datetime

logger = logging.getLogger(__name__)

FUEL = "https://fuel.gazebosim.org/1.0"
OWNER = "GoogleResearch"


def list_collection(collection: str = "Scanned Objects by Google Research"):
    names = []
    page = 1
    while True:
        url = (
            f"{FUEL}/models?page={page}&per_page=100&q=collections:"
            + urllib.parse.quote(collection)
        )
        with urllib.request.urlopen(url, timeout=60) as r:
            batch = json.load(r)
        if not batch:
            break
        names.extend(m["name"] for m in batch)
        page += 1
    return names


def download_model(name: str, out_dir: str) -> bool:
    dst = os.path.join(out_dir, f"{name}.zip")
    if os.path.exists(dst):
        return False
    url = f"{FUEL}/{OWNER}/models/{urllib.parse.quote(name)}/1/{urllib.parse.quote(name)}.zip"
    tmp = dst + ".part"
    with urllib.request.urlopen(url, timeout=300) as r, open(tmp, "wb") as f:
        while chunk := r.read(1 << 20):
            f.write(chunk)
    os.replace(tmp, dst)
    return True


def download_with_retry(name: str, out_dir: str, attempts: int = 3) -> bool:
    for attempt in range(attempts):
        try:
            return download_model(name, out_dir)
        except Exception as e:
            if attempt == attempts - 1:
                raise
            delay = 2.0 * (2**attempt)
            logger.warning("%s attempt %d failed: %s; retry in %.0fs",
                           name, attempt + 1, e, delay)
            time.sleep(delay)
    return False


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--attempts", type=int, default=3)
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    log_path = os.path.join(args.output_dir, "download_log.csv")
    new_log = not os.path.exists(log_path)
    log_f = open(log_path, "a", newline="")
    log = csv.DictWriter(log_f, fieldnames=("timestamp", "name", "status"))
    if new_log:
        log.writeheader()
    names = list_collection()
    if args.limit:
        names = names[: args.limit]
    n = 0
    for name in names:
        try:
            fresh = download_with_retry(name, args.output_dir, args.attempts)
            n += fresh
            status = "downloaded" if fresh else "skipped"
        except Exception as e:
            logger.warning("failed %s: %s", name, e)
            status = f"failed: {e}"
        log.writerow({"timestamp": datetime.now().isoformat(timespec="seconds"),
                      "name": name, "status": status})
        log_f.flush()
    print(f"downloaded {n}/{len(names)}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
