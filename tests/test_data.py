"""Dataset tests against synthetic zips honoring the reference's on-disk
contract (NNN.png + NNN.npy + prompt.txt per object zip)."""

import io
import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from mvd_tpu.data.objaverse import DataLoader, ObjaverseDataModule, ObjaverseDataset
from mvd_tpu.data.tokenizer import HashTokenizer


def make_zip(path, num_views=4, size=32, prompt="a red chair", rng=None):
    rng = rng or np.random.default_rng(0)
    with zipfile.ZipFile(path, "w") as z:
        for v in range(num_views):
            img = Image.fromarray(
                rng.integers(0, 255, (size, size, 4), dtype=np.uint8), "RGBA"
            )
            buf = io.BytesIO()
            img.save(buf, "PNG")
            z.writestr(f"{v:03d}.png", buf.getvalue())
            cam = np.eye(4, dtype=np.float32)
            cam[:3, 3] = rng.standard_normal(3)
            buf = io.BytesIO()
            np.save(buf, cam)
            z.writestr(f"{v:03d}.npy", buf.getvalue())
        z.writestr("prompt.txt", prompt)
        z.writestr("metadata.json", json.dumps({"views": num_views}))


@pytest.fixture()
def corpus(tmp_path):
    root = tmp_path / "data"
    (root / "renders_final").mkdir(parents=True)
    rng = np.random.default_rng(42)
    for i in range(12):
        make_zip(root / "renders_final" / f"obj_{i}.zip", num_views=4, rng=rng)
    return str(root)


def test_split_deterministic_and_disjoint(corpus):
    tr = ObjaverseDataset(corpus, "train", image_size=16)
    va = ObjaverseDataset(corpus, "val", image_size=16)
    te = ObjaverseDataset(corpus, "test", image_size=16)
    assert set(tr.files).isdisjoint(va.files)
    assert set(tr.files).isdisjoint(te.files)
    assert len(tr.files) + len(va.files) + len(te.files) == 12
    tr2 = ObjaverseDataset(corpus, "train", image_size=16)
    assert tr.files == tr2.files and tr.split_hash == tr2.split_hash


def test_pairs_are_ordered_i_lt_j(corpus):
    ds = ObjaverseDataset(corpus, "train", image_size=16, max_views_per_object=3)
    assert len(ds) > 0
    for p in ds.pairs:
        assert p.source_view < p.target_view


def test_getitem_contract(corpus):
    ds = ObjaverseDataset(corpus, "train", image_size=16)
    s = ds[0]
    assert s["source_image"].shape == (16, 16, 3)
    assert s["source_image"].min() >= -1.0 and s["source_image"].max() <= 1.0
    assert s["source_camera"].shape == (4, 4)
    assert s["prompt"] == "a red chair"


def test_pair_cache_roundtrip(corpus):
    ds = ObjaverseDataset(corpus, "train", image_size=16)
    cache = ds._pair_cache_path()
    assert os.path.exists(cache)
    ds2 = ObjaverseDataset(corpus, "train", image_size=16)
    assert [p.__dict__ for p in ds.pairs] == [p.__dict__ for p in ds2.pairs]


def test_self_healing_on_corrupt_zip(corpus):
    ds = ObjaverseDataset(corpus, "train", image_size=16)
    victim = ds.pairs[0].zip_path
    n_before = len(ds.pairs)
    with open(victim, "wb") as f:
        f.write(b"not a zip")
    s = ds[0]  # should heal by evicting the bad pair(s)
    assert "source_image" in s
    assert len(ds.pairs) < n_before


def test_state_dict_roundtrip(corpus):
    ds = ObjaverseDataset(corpus, "train", image_size=16)
    state = ds.state_dict()
    ds2 = ObjaverseDataset(corpus, "train", image_size=16, seed=7)
    ds2.load_state_dict(state)
    assert ds2.seed == ds.seed
    assert ds2.files == ds.files


def test_dataloader_batches(corpus):
    ds = ObjaverseDataset(corpus, "train", image_size=16)
    dl = DataLoader(ds, HashTokenizer(), batch_size=2, views_per_sample=1, num_workers=2)
    batches = list(dl)
    assert len(batches) == len(dl)
    b = batches[0]
    assert b["source_image"].shape == (2, 1, 16, 16, 3)
    assert b["input_ids"].shape == (2, 1, 77)
    assert b["target_camera"].shape == (2, 1, 4, 4)


def test_dataloader_early_exit_no_thread_leak(corpus):
    """Abandoning iteration mid-epoch must reap producer threads (workers
    blocked in q.put used to never see the stop event)."""
    import threading
    import time

    ds = ObjaverseDataset(corpus, "train", image_size=16)
    dl = DataLoader(
        ds, HashTokenizer(), batch_size=1, views_per_sample=1, num_workers=2,
        prefetch=1,
    )
    before = threading.active_count()
    for _ in range(3):
        it = iter(dl)
        next(it)
        it.close()  # GeneratorExit -> finally: stop + join
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_datamodule(corpus):
    dm = ObjaverseDataModule(corpus, HashTokenizer(), image_size=16, batch_size=2)
    dm.setup()
    state = dm.state_dict()
    assert set(state) == {"train", "val", "test"}
    dl = dm.loader("val")
    assert dl.shuffle is False
