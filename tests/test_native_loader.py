"""Native zip/PNG loader vs the PIL reference path."""

import io
import zipfile

import numpy as np
import pytest
from PIL import Image

from mvd_tpu.data import native_loader
from mvd_tpu.data.objaverse import _load_image_from_bytes
from tests.test_data import make_zip

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain unavailable"
)


def test_load_view_matches_pil(tmp_path):
    zp = tmp_path / "obj.zip"
    make_zip(zp, num_views=2, size=32)
    with zipfile.ZipFile(zp) as z:
        want = _load_image_from_bytes(z.read("000.png"), 32)
    got = native_loader.load_view(str(zp), "000.png", 32)
    assert got.shape == (32, 32, 3)
    assert got.min() >= -1.0 and got.max() <= 1.0
    # same-size path: exact composite, no resampling
    np.testing.assert_allclose(got, want, atol=1.5 / 255)


def test_load_view_resize(tmp_path):
    zp = tmp_path / "obj.zip"
    make_zip(zp, num_views=1, size=32)
    got = native_loader.load_view(str(zp), "000.png", 16)
    assert got.shape == (16, 16, 3)
    with zipfile.ZipFile(zp) as z:
        want = _load_image_from_bytes(z.read("000.png"), 16)
    # bilinear vs LANCZOS: close but not identical
    assert np.abs(got - want).mean() < 0.1


def test_read_entry_npy(tmp_path):
    zp = tmp_path / "obj.zip"
    make_zip(zp, num_views=1, size=16)
    raw = native_loader.read_entry(str(zp), "000.npy")
    cam = np.load(io.BytesIO(raw))
    assert cam.shape == (4, 4)
    with zipfile.ZipFile(zp) as z:
        want = np.load(io.BytesIO(z.read("000.npy")))
    np.testing.assert_array_equal(cam, want)


def test_batch_load(tmp_path):
    zp = tmp_path / "obj.zip"
    make_zip(zp, num_views=3, size=16)
    out = native_loader.load_views_batch(str(zp), ["000.png", "001.png", "002.png"], 16)
    assert out.shape == (3, 16, 16, 3)
    single = native_loader.load_view(str(zp), "001.png", 16)
    np.testing.assert_array_equal(out[1], single)


def test_missing_entry_raises(tmp_path):
    zp = tmp_path / "obj.zip"
    make_zip(zp, num_views=1, size=16)
    with pytest.raises(RuntimeError):
        native_loader.load_view(str(zp), "099.png", 16)
