"""Google Scanned Objects render driver.

Rebuild of reference src/data/rendering/render_gso.py:1-506: unzip each GSO
archive, relocate ``texture.png`` next to the mesh so Blender's OBJ import
finds it (reference :430-463), render via the shared Blender pipeline with
the GSO -90° orientation fix, validate/zip/move, and resume by skipping
already-rendered objects (:411-416).
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import tempfile
import zipfile
from glob import glob

from .orchestrate import CSVLogBook, handle_found_object

logger = logging.getLogger(__name__)


def prepare_gso_archive(zip_path: str, workdir: str) -> str:
    """Extract a GSO zip and return the mesh path, relocating textures
    (reference render_gso.py:430-463)."""
    name = os.path.splitext(os.path.basename(zip_path))[0]
    out = os.path.join(workdir, name)
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(out)
    meshes_dir = os.path.join(out, "meshes")
    mesh = os.path.join(meshes_dir, "model.obj")
    if not os.path.exists(mesh):
        candidates = glob(os.path.join(out, "**", "*.obj"), recursive=True)
        if not candidates:
            raise RuntimeError("no .obj in GSO archive")
        mesh = candidates[0]
        meshes_dir = os.path.dirname(mesh)
    tex = glob(os.path.join(out, "materials", "textures", "*.png")) + glob(
        os.path.join(out, "**", "texture.png"), recursive=True
    )
    for t in tex:
        dst = os.path.join(meshes_dir, os.path.basename(t))
        if not os.path.exists(dst):
            shutil.copy(t, dst)
    return mesh


def render_gso_dataset(
    gso_dir: str,
    render_dir: str,
    log_dir: str,
    blender_bin: str = "blender",
    engine: str = "EEVEE",
    resolution: int = 1024,
    limit=None,
) -> int:
    logbook = CSVLogBook(log_dir)
    done = logbook.succeeded_uids()
    existing = {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob(os.path.join(render_dir, "*.zip"))
    }
    count = 0
    zips = sorted(glob(os.path.join(gso_dir, "*.zip")))
    if limit:
        zips = zips[:limit]
    for zp in zips:
        uid = os.path.splitext(os.path.basename(zp))[0]
        if uid in done or uid in existing:
            continue
        with tempfile.TemporaryDirectory() as tmp:
            try:
                mesh = prepare_gso_archive(zp, tmp)
            except Exception as e:
                logbook.failure(uid, f"prepare: {e}")
                continue
            count += handle_found_object(
                mesh, uid, render_dir, logbook, blender_bin, engine, resolution,
                gso=True,
            )
    return count


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gso-dir", required=True)
    p.add_argument("--render-dir", required=True)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--blender-bin", default=os.environ.get("BLENDER_BIN", "blender"))
    p.add_argument("--engine", default="EEVEE")
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)
    n = render_gso_dataset(
        args.gso_dir, args.render_dir, args.log_dir or os.path.join(args.render_dir, "logs"),
        args.blender_bin, args.engine, args.resolution, args.limit,
    )
    print(f"rendered {n} GSO objects")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
