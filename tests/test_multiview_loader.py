"""Joint multi-view loader: V targets per sample share one object+source."""

import numpy as np
import pytest

from mvd_tpu.data.objaverse import DataLoader, ObjaverseDataset
from mvd_tpu.data.tokenizer import HashTokenizer
from tests.test_data import make_zip


@pytest.fixture()
def corpus(tmp_path):
    root = tmp_path / "data"
    (root / "renders_final").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(8):
        make_zip(root / "renders_final" / f"obj_{i}.zip", num_views=4, size=16, rng=rng)
    return str(root)


def test_view_groups(corpus):
    ds = ObjaverseDataset(corpus, "train", image_size=16)
    groups = ds.view_groups(2)
    assert groups
    for g in groups:
        assert len(g.target_views) == 2
        assert g.source_view not in g.target_views
        assert all(g.source_view < t for t in g.target_views)


def test_multiview_batches_share_source(corpus):
    ds = ObjaverseDataset(corpus, "train", image_size=16)
    dl = DataLoader(ds, HashTokenizer(), batch_size=2, views_per_sample=2, num_workers=1)
    b = next(iter(dl))
    assert b["target_image"].shape == (2, 2, 16, 16, 3)
    # both views of a sample share the same source image and camera
    np.testing.assert_array_equal(b["source_image"][:, 0], b["source_image"][:, 1])
    np.testing.assert_array_equal(b["source_camera"][:, 0], b["source_camera"][:, 1])
    # but have different target views
    assert not np.array_equal(b["target_image"][0, 0], b["target_image"][0, 1])
    assert len(dl) >= 1
