"""Objaverse-XL render orchestrator.

Rebuild of reference src/data/rendering/main.py:1-750: fetch + filter
annotations (formats/sources/repo size, reference :487-553), skip
already-rendered UIDs (:630-645), download with exponential-backoff retry
(:653-677), render each object in a Blender subprocess with timeout
(:196-210), validate output counts (:283-305), zip + move to the render dir
(:307-334), and keep CSV success/failure logs (:37-53).

The objaverse-xl dependency is optional: pass ``--local-glob`` to render a
directory of already-downloaded meshes with the exact same subprocess/
validate/zip pipeline (that path is fully testable offline).
"""

from __future__ import annotations

import argparse
import csv
import logging
import os
import shutil
import subprocess
import tempfile
import time
import zipfile
from glob import glob
from typing import Iterable, Optional

logger = logging.getLogger(__name__)

BLENDER_SCRIPT = os.path.join(os.path.dirname(__file__), "blender_script.py")


class CSVLogBook:
    """Success/failure CSV logs (reference rendering/main.py:37-53)."""

    def __init__(self, log_dir: str):
        import threading

        os.makedirs(log_dir, exist_ok=True)
        self.success_path = os.path.join(log_dir, "rendered.csv")
        self.failure_path = os.path.join(log_dir, "failed.csv")
        self._lock = threading.Lock()  # parallel per-GPU workers share one book

    def _append(self, path: str, row):
        with self._lock:
            new = not os.path.exists(path)
            with open(path, "a", newline="") as f:
                w = csv.writer(f)
                if new:
                    w.writerow(["uid", "detail", "ts"])
                w.writerow(row)

    def success(self, uid: str, detail: str = ""):
        self._append(self.success_path, [uid, detail, time.time()])

    def failure(self, uid: str, detail: str = ""):
        self._append(self.failure_path, [uid, detail, time.time()])

    def succeeded_uids(self):
        if not os.path.exists(self.success_path):
            return set()
        with open(self.success_path) as f:
            return {row[0] for row in csv.reader(f) if row and row[0] != "uid"}


def retry(fn, attempts: int = 4, base_delay: float = 2.0):
    """Exponential-backoff retry (tenacity-equivalent,
    reference rendering/main.py:656-677)."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1:
                raise
            delay = base_delay * (2**i)
            logger.warning("attempt %d failed (%s); retrying in %.0fs", i + 1, e, delay)
            time.sleep(delay)


def run_blender(
    object_path: str,
    output_dir: str,
    blender_bin: str = "blender",
    engine: str = "EEVEE",
    resolution: int = 1024,
    seed: int = 0,
    timeout_s: int = 600,
    gso: bool = False,
    gpu_index: int = None,
) -> None:
    env = None
    if gpu_index is not None:
        # per-GPU pinning for parallel Blender renders (reference
        # render_gso.py:151-158: CUDA_VISIBLE_DEVICES=<gpu_i>)
        env = dict(os.environ)
        env["CUDA_VISIBLE_DEVICES"] = str(gpu_index)
    cmd = [
        blender_bin, "--background", "--python", BLENDER_SCRIPT, "--",
        "--object-path", object_path,
        "--output-dir", output_dir,
        "--engine", engine,
        "--resolution", str(resolution),
        "--seed", str(seed),
    ]
    if gso:
        cmd.append("--gso")
    subprocess.run(
        cmd, check=True, timeout=timeout_s, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


def validate_render_output(output_dir: str) -> int:
    """Strict output-count check (reference rendering/main.py:283-305):
    NNN.png and NNN.npy counts must match num_renders.txt, metadata must
    exist. Returns the view count."""
    marker = os.path.join(output_dir, "num_renders.txt")
    if not os.path.exists(marker):
        raise RuntimeError("num_renders.txt missing")
    n = int(open(marker).read().strip())
    pngs = glob(os.path.join(output_dir, "[0-9][0-9][0-9].png"))
    npys = glob(os.path.join(output_dir, "[0-9][0-9][0-9].npy"))
    if len(pngs) != n or len(npys) != n:
        raise RuntimeError(f"expected {n} views, found {len(pngs)} png / {len(npys)} npy")
    if not os.path.exists(os.path.join(output_dir, "metadata.json")):
        raise RuntimeError("metadata.json missing")
    return n


def zip_render_output(output_dir: str, zip_path: str):
    """Pack the render dir into the dataset zip contract
    (reference rendering/main.py:319-334)."""
    os.makedirs(os.path.dirname(os.path.abspath(zip_path)), exist_ok=True)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for name in sorted(os.listdir(output_dir)):
            if name.endswith((".png", ".npy", ".json", ".txt")):
                z.write(os.path.join(output_dir, name), name)


def handle_found_object(
    object_path: str,
    uid: str,
    render_dir: str,
    logbook: CSVLogBook,
    blender_bin: str = "blender",
    engine: str = "EEVEE",
    resolution: int = 1024,
    timeout_s: int = 600,
    gso: bool = False,
    gpu_index: int = None,
) -> bool:
    """Render one object end-to-end: subprocess -> validate -> zip -> move
    (reference rendering/main.py:74-195)."""
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, uid)
        try:
            run_blender(
                object_path, out, blender_bin, engine, resolution,
                seed=abs(hash(uid)) % (2**31), timeout_s=timeout_s, gso=gso,
                gpu_index=gpu_index,
            )
            n = validate_render_output(out)
            zip_render_output(out, os.path.join(render_dir, f"{uid}.zip"))
            logbook.success(uid, f"{n} views")
            return True
        except Exception as e:
            logbook.failure(uid, str(e))
            logger.warning("render failed for %s: %s", uid, e)
            return False


def render_local(
    pattern: str,
    render_dir: str,
    log_dir: str,
    blender_bin: str = "blender",
    engine: str = "EEVEE",
    resolution: int = 1024,
    gso: bool = False,
) -> int:
    """Render a local glob of mesh files (offline-testable path)."""
    logbook = CSVLogBook(log_dir)
    done = logbook.succeeded_uids()
    existing = {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob(os.path.join(render_dir, "*.zip"))
    }
    count = 0
    for path in sorted(glob(pattern)):
        uid = os.path.splitext(os.path.basename(path))[0]
        if uid in done or uid in existing:  # resume skip (:630-645)
            continue
        count += handle_found_object(
            path, uid, render_dir, logbook, blender_bin, engine, resolution, gso=gso
        )
    return count


def render_objaverse_xl(
    render_dir: str,
    log_dir: str,
    sources: Iterable[str] = ("sketchfab",),
    formats: Iterable[str] = ("glb", "gltf", "obj", "fbx"),
    max_repo_size_mb: Optional[float] = 200.0,
    limit: Optional[int] = None,
    **render_kwargs,
):
    """Full Objaverse-XL path (needs the optional objaverse package +
    network; reference rendering/main.py:487-553, 563-750)."""
    try:
        import objaverse.xl as oxl
    except ImportError as e:
        raise RuntimeError(
            "objaverse package not available; use render_local/--local-glob"
        ) from e

    logbook = CSVLogBook(log_dir)
    annotations = retry(lambda: oxl.get_annotations())
    annotations = annotations[annotations["source"].isin(list(sources))]
    annotations = annotations[
        annotations["fileType"].str.lower().isin([f.lower() for f in formats])
    ]
    if max_repo_size_mb is not None and "repoSizeMB" in annotations:
        annotations = annotations[annotations["repoSizeMB"] <= max_repo_size_mb]
    done = logbook.succeeded_uids()
    annotations = annotations[~annotations["sha256"].isin(done)]
    if limit:
        annotations = annotations.head(limit)

    def handler(local_path, file_identifier, sha256, metadata):
        handle_found_object(local_path, sha256, render_dir, logbook, **render_kwargs)

    retry(
        lambda: oxl.download_objects(
            objects=annotations, handle_found_object=handler
        )
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--render-dir", required=True)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--local-glob", default=None,
                   help="render local mesh files instead of Objaverse-XL")
    p.add_argument("--blender-bin", default=os.environ.get("BLENDER_BIN", "blender"))
    p.add_argument("--engine", default="EEVEE")
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--gso", action="store_true")
    args = p.parse_args(argv)
    log_dir = args.log_dir or os.path.join(args.render_dir, "logs")
    if args.local_glob:
        n = render_local(
            args.local_glob, args.render_dir, log_dir,
            args.blender_bin, args.engine, args.resolution, gso=args.gso,
        )
        print(f"rendered {n} objects")
    else:
        render_objaverse_xl(
            args.render_dir, log_dir, limit=args.limit,
            blender_bin=args.blender_bin, engine=args.engine,
            resolution=args.resolution,
        )


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
