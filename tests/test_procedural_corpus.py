"""Tests for the procedural multi-view corpus generator
(tools/rendering/procedural.py): zip contract, determinism, and geometric
consistency between the saved cameras and the rendered pixels — the property
the controlled view-synthesis experiment (EVIDENCE.md) rests on."""

import io
import json
import zipfile

import numpy as np
import pytest
from PIL import Image

from tools.rendering.procedural import (
    FOV_DEG,
    Primitive,
    generate_corpus,
    object_cameras,
    render_view,
    write_object_zip,
)


def _sphere(center, r, color="red"):
    return Primitive(
        kind="sphere",
        center=np.asarray(center, float),
        size=np.array([r]),
        rotation=np.eye(3),
        color_name=color,
        checker=False,
    )


def test_zip_contract_and_dataset_load(tmp_path):
    renders = generate_corpus(str(tmp_path), num_objects=4, views_per_object=3, size=64)
    import os

    zips = sorted(os.listdir(renders))
    assert len(zips) == 4
    with zipfile.ZipFile(os.path.join(renders, zips[0])) as z:
        names = set(z.namelist())
        for v in range(3):
            assert f"{v:03d}.png" in names and f"{v:03d}.npy" in names
        assert "prompt.txt" in names and "metadata.json" in names
        meta = json.loads(z.read("metadata.json"))
        assert meta["views"] == 3
        cam = np.load(io.BytesIO(z.read("000.npy")))
        assert cam.shape == (4, 4) and cam.dtype == np.float32
        # camera-to-world: position at ring radius 1.8
        assert np.linalg.norm(cam[:3, 3]) == pytest.approx(1.8, abs=1e-3)
        img = Image.open(io.BytesIO(z.read("000.png")))
        assert img.size == (64, 64) and img.mode == "RGBA"

    from mvd_tpu.data.objaverse import ObjaverseDataset

    ds = ObjaverseDataset(str(tmp_path), "train", image_size=32)
    s = ds[0]
    assert s["source_image"].shape == (32, 32, 3)
    assert s["source_camera"].shape == (4, 4)
    assert s["prompt"].startswith("a 3D scene of")


def test_deterministic(tmp_path):
    a = generate_corpus(str(tmp_path / "a"), num_objects=2, views_per_object=2, size=48, seed=3)
    b = generate_corpus(str(tmp_path / "b"), num_objects=2, views_per_object=2, size=48, seed=3)
    import os

    for f in sorted(os.listdir(a)):
        za, zb = zipfile.ZipFile(os.path.join(a, f)), zipfile.ZipFile(os.path.join(b, f))
        for n in za.namelist():
            assert za.read(n) == zb.read(n), f"{f}:{n} differs across same-seed runs"


def test_projection_consistency():
    """The saved camera-to-world matrix projects a sphere's center onto a
    pixel that the render shows as hit — i.e. cameras and pixels agree with
    the ray_grid convention the framework's ray-map conditioning assumes."""
    prims = [_sphere((0.15, -0.2, 0.1), 0.2)]
    cams = object_cameras(np.random.default_rng(0), 5)
    half = float(np.tan(np.deg2rad(FOV_DEG) / 2.0))
    size = 96
    for cam in cams:
        rgba = render_view(prims, cam, size, supersample=1)
        R, pos = cam[:3, :3].astype(float), cam[:3, 3].astype(float)
        p_cam = R.T @ (prims[0].center - pos)
        assert p_cam[2] < 0, "center must be in front of the camera (-z forward)"
        u = (p_cam[0] / -p_cam[2]) / half  # [-1, 1], x right
        v = (p_cam[1] / -p_cam[2]) / half  # [-1, 1], y up
        px = int((u + 1) / 2 * size)
        py = int((1 - v) / 2 * size)  # row 0 = top
        assert 0 <= px < size and 0 <= py < size
        assert rgba[py, px, 3] == 255, "projected sphere center must be a hit pixel"
        assert rgba[py, px, 0] > rgba[py, px, 2], "red sphere: R channel dominates"


def test_views_show_view_dependence(tmp_path):
    """Different azimuths of the same object must produce substantially
    different images (otherwise the experiment couldn't measure anything)."""
    rng = np.random.default_rng(11)
    from tools.rendering.procedural import sample_object

    prims = sample_object(rng)
    cams = object_cameras(rng, 4)
    imgs = [render_view(prims, c, 64).astype(np.float32) / 255.0 for c in cams]
    for i in range(1, 4):
        diff = np.abs(imgs[0] - imgs[i]).mean()
        assert diff > 0.01, f"view {i} nearly identical to view 0 (diff={diff})"


def test_write_object_zip_atomic(tmp_path):
    path = str(tmp_path / "obj.zip")
    prims = [_sphere((0, 0, 0), 0.3)]
    cams = object_cameras(np.random.default_rng(1), 2)
    write_object_zip(path, prims, cams, size=32)
    import os

    assert os.path.exists(path) and not os.path.exists(path + ".tmp")
