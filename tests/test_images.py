"""Image IO helper tests (mvd_tpu/utils/images.py).

Regression anchor: ``save_image(side_by_side([...]))`` used to blank every
comparison PNG to pure white — ``side_by_side`` returns a uint8 canvas and
``to_uint8`` re-normalized it as if it were [0,1] floats, clipping every
pixel value > 1 to 255 (reference comparison panels: training.py:365-389,
infer.py:140-155).
"""

import numpy as np
from PIL import Image

from mvd_tpu.utils.images import save_image, side_by_side, to_uint8


def test_to_uint8_float_unit_range():
    img = np.linspace(0, 1, 12, dtype=np.float32).reshape(2, 2, 3)
    out = to_uint8(img)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255


def test_to_uint8_float_signed_range():
    img = np.linspace(-1, 1, 12, dtype=np.float32).reshape(2, 2, 3)
    out = to_uint8(img)
    assert out.min() == 0 and out.max() == 255


def test_to_uint8_uint8_passthrough():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3) * 20
    out = to_uint8(img)
    np.testing.assert_array_equal(out, img)


def test_save_side_by_side_roundtrip(tmp_path):
    """The full comparison-sheet path must preserve pixel content."""
    a = np.full((4, 4, 3), 0.25, np.float32)
    b = np.full((4, 4, 3), 0.75, np.float32)
    sheet = side_by_side([a, b], pad=2)
    path = str(tmp_path / "sheet.png")
    save_image(sheet, path)
    back = np.asarray(Image.open(path))
    # left panel ~64, right panel ~191, pad stays white — NOT all-255
    assert abs(int(back[0, 0, 0]) - 64) <= 1
    assert abs(int(back[0, 6, 0]) - 191) <= 1
    assert (back == 255).mean() < 0.5
