"""Google Scanned Objects downloader (Gazebo Fuel collection).

Rebuild of reference src/data/downloaders/download_gso.py:51-105: list the
GoogleResearch collection from the Fuel REST API page by page, then fetch
each model zip, skipping files that already exist (resume)."""

from __future__ import annotations

import argparse
import json
import logging
import os
import urllib.parse
import urllib.request

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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", required=True)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    names = list_collection()
    if args.limit:
        names = names[: args.limit]
    n = 0
    for name in names:
        try:
            n += download_model(name, args.output_dir)
        except Exception as e:
            logger.warning("failed %s: %s", name, e)
    print(f"downloaded {n}/{len(names)}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
