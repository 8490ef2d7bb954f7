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


def _render_one(
    zp, render_dir, logbook, blender_bin, engine, resolution, gpu_index
) -> int:
    uid = os.path.splitext(os.path.basename(zp))[0]
    with tempfile.TemporaryDirectory() as tmp:
        try:
            mesh = prepare_gso_archive(zp, tmp)
        except Exception as e:
            logbook.failure(uid, f"prepare: {e}")
            return 0
        return int(
            handle_found_object(
                mesh, uid, render_dir, logbook, blender_bin, engine,
                resolution, gso=True, gpu_index=gpu_index,
            )
        )


def render_gso_dataset(
    gso_dir: str,
    render_dir: str,
    log_dir: str,
    blender_bin: str = "blender",
    engine: str = "EEVEE",
    resolution: int = 1024,
    limit=None,
    num_gpus: int = 0,
) -> int:
    """Render all GSO zips; with ``num_gpus > 0``, run that many Blender
    subprocesses in parallel, worker *i* pinned to GPU ``i % num_gpus`` via
    CUDA_VISIBLE_DEVICES (reference render_gso.py:151-158's per-GPU
    scheduling)."""
    logbook = CSVLogBook(log_dir)
    done = logbook.succeeded_uids()
    existing = {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob(os.path.join(render_dir, "*.zip"))
    }
    zips = sorted(glob(os.path.join(gso_dir, "*.zip")))
    if limit:
        zips = zips[:limit]
    todo = [
        zp
        for zp in zips
        if os.path.splitext(os.path.basename(zp))[0] not in done
        and os.path.splitext(os.path.basename(zp))[0] not in existing
    ]
    if num_gpus <= 0:
        return sum(
            _render_one(zp, render_dir, logbook, blender_bin, engine, resolution, None)
            for zp in todo
        )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_gpus) as pool:
        futs = [
            pool.submit(
                _render_one, zp, render_dir, logbook, blender_bin, engine,
                resolution, i % num_gpus,
            )
            for i, zp in enumerate(todo)
        ]
        return sum(f.result() for f in futs)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gso-dir", required=True)
    p.add_argument("--render-dir", required=True)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--blender-bin", default=os.environ.get("BLENDER_BIN", "blender"))
    p.add_argument("--engine", default="EEVEE")
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument(
        "--num-gpus", type=int, default=0,
        help="parallel Blender workers, each pinned to one GPU (0 = serial)",
    )
    args = p.parse_args(argv)
    n = render_gso_dataset(
        args.gso_dir, args.render_dir, args.log_dir or os.path.join(args.render_dir, "logs"),
        args.blender_bin, args.engine, args.resolution, args.limit,
        num_gpus=args.num_gpus,
    )
    print(f"rendered {n} GSO objects")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
