"""CO3D-style multi-view shard dataset (mvd_tpu/data/co3d.py).

Covers BASELINE config 5's "CO3D-style multi-view shards": the real CO3D
frame_annotations.jgz format, the annotation-free cameras.npy fallback,
PyTorch3D viewpoint -> camera-to-world conversion, invariance of the
camera encoder's relative transform to the axis convention, and end-to-end
batching through the shared DataLoader / DataModule.
"""

import gzip
import json
import os

import numpy as np
import pytest
from PIL import Image

from mvd_tpu.data.co3d import CO3DDataset, pytorch3d_to_c2w
from mvd_tpu.data.objaverse import DataLoader, ObjaverseDataModule
from mvd_tpu.data.tokenizer import HashTokenizer


def _rand_rotation(rng):
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def _write_image(path, rng, size=16):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


def make_co3d_tree(root, n_seq=4, n_frames=4, annotated=True, seed=0):
    """Synthesize a tiny CO3D-style category with jgz annotations (or the
    cameras.npy fallback layout)."""
    rng = np.random.default_rng(seed)
    cat = os.path.join(root, "teddybear")
    anns = []
    for s in range(n_seq):
        seq = f"seq{s:03d}"
        cams = []
        for f in range(n_frames):
            rel = os.path.join("teddybear", seq, "images", f"frame{f + 1:06d}.jpg")
            _write_image(os.path.join(root, rel), rng)
            R = _rand_rotation(rng)
            T = rng.standard_normal(3).astype(np.float32)
            if annotated:
                anns.append(
                    {
                        "sequence_name": seq,
                        "frame_number": f,
                        "image": {"path": rel, "size": [16, 16]},
                        "viewpoint": {
                            "R": R.tolist(),
                            "T": T.tolist(),
                            "focal_length": [1.0, 1.0],
                            "principal_point": [0.0, 0.0],
                        },
                    }
                )
            else:
                cams.append(pytorch3d_to_c2w(R, T))
        if not annotated:
            np.save(os.path.join(cat, seq, "cameras.npy"), np.stack(cams))
    if annotated:
        with gzip.open(os.path.join(cat, "frame_annotations.jgz"), "wt") as f:
            json.dump(anns, f)
    return root


def test_pytorch3d_to_c2w_inverts_world_to_camera():
    rng = np.random.default_rng(1)
    R, T = _rand_rotation(rng), rng.standard_normal(3).astype(np.float32)
    c2w = pytorch3d_to_c2w(R, T)
    # PyTorch3D row-vector convention: x_cam = x_world @ R + T
    x_world = rng.standard_normal(3).astype(np.float32)
    x_cam = x_world @ R + T
    back = (c2w @ np.append(x_cam, 1.0))[:3]
    np.testing.assert_allclose(back, x_world, atol=1e-5)


def test_relative_transform_invariant_to_axis_convention():
    """R_t·R_sᵀ / T_t − R_rel·T_s is unchanged when every camera-to-world is
    right-multiplied by a fixed orthogonal axis flip — so no PyTorch3D->
    Blender convention conversion is needed (data/co3d.py docstring)."""
    from mvd_tpu.camera import relative_transform

    rng = np.random.default_rng(2)
    cams = [pytorch3d_to_c2w(_rand_rotation(rng), rng.standard_normal(3)) for _ in range(2)]
    D = np.diag([-1.0, 1.0, -1.0]).astype(np.float32)  # PyTorch3D->OpenGL-ish
    flip = np.eye(4, dtype=np.float32)
    flip[:3, :3] = D
    r0, t0 = relative_transform(cams[0], cams[1])
    r1, t1 = relative_transform(cams[0] @ flip, cams[1] @ flip)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), atol=1e-5)


@pytest.mark.parametrize("annotated", [True, False], ids=["jgz", "npy"])
def test_dataset_pairs_and_getitem(tmp_path, annotated):
    root = make_co3d_tree(str(tmp_path), n_seq=4, n_frames=4, annotated=annotated)
    ds = CO3DDataset(root, "train", image_size=16, val_split=0.25, test_split=0.25)
    # 4 sequences -> 1 test, 1 val, 2 train; 4 frames -> C(4,2)=6 ordered pairs
    assert len(ds.sequences) == 2
    assert len(ds) == 12
    s = ds[0]
    assert s["source_image"].shape == (16, 16, 3)
    assert s["source_camera"].shape == (4, 4)
    assert s["target_camera"].shape == (4, 4)
    np.testing.assert_allclose(s["source_camera"][3], [0, 0, 0, 1])
    assert -1.0 <= s["source_image"].min() and s["source_image"].max() <= 1.0
    assert s["prompt"] == "a photo of a teddybear"
    # splits are disjoint and deterministic
    ds2 = CO3DDataset(root, "train", image_size=16, val_split=0.25, test_split=0.25)
    assert ds2.split_hash == ds.split_hash
    val = CO3DDataset(root, "val", image_size=16, val_split=0.25, test_split=0.25)
    assert not set(val.sequences) & set(ds.sequences)


def test_prompt_txt_override(tmp_path):
    root = make_co3d_tree(str(tmp_path), n_seq=2, n_frames=2)
    seq_dir = os.path.join(root, "teddybear", "seq000")
    with open(os.path.join(seq_dir, "prompt.txt"), "w") as f:
        f.write("a fluffy brown teddy bear\n")
    ds = CO3DDataset(root, "train", image_size=16, val_split=0.0, test_split=0.0)
    prompts = {p.prompt for p in ds.pairs if p.zip_path == seq_dir}
    assert prompts == {"a fluffy brown teddy bear"}


def test_view_groups_and_loader(tmp_path):
    root = make_co3d_tree(str(tmp_path), n_seq=3, n_frames=5)
    ds = CO3DDataset(root, "train", image_size=16, val_split=0.0, test_split=0.0)
    groups = ds.view_groups(2)
    assert groups and all(len(g.target_views) == 2 for g in groups)
    loader = DataLoader(
        ds, HashTokenizer(), batch_size=2, views_per_sample=2, num_workers=1
    )
    batch = next(iter(loader))
    assert batch["target_image"].shape == (2, 2, 16, 16, 3)
    assert batch["source_camera"].shape == (2, 2, 4, 4)
    assert batch["input_ids"].shape[:2] == (2, 2)


def test_datamodule_format_selection(tmp_path):
    root = make_co3d_tree(str(tmp_path), n_seq=4, n_frames=3)
    dm = ObjaverseDataModule(
        root, HashTokenizer(), image_size=16, batch_size=1,
        dataset_format="co3d", num_workers=1,
    )
    dm.setup()
    assert isinstance(dm.datasets["train"], CO3DDataset)
    state = dm.state_dict()
    dm.load_state_dict(state)  # round-trips
    with pytest.raises(ValueError):
        ObjaverseDataModule(root, HashTokenizer(), dataset_format="nope")._dataset_cls()


def test_self_healing_eviction(tmp_path):
    root = make_co3d_tree(str(tmp_path), n_seq=2, n_frames=3)
    ds = CO3DDataset(root, "train", image_size=16, val_split=0.0, test_split=0.0)
    victim = ds.pairs[0].zip_path
    # corrupt one frame's image file
    path, _ = ds.frames[victim][ds.pairs[0].source_view]
    os.remove(path)
    n_before = len(ds)
    s = ds[0]  # heals by evicting the bad pair and moving on
    assert s["source_image"].shape == (16, 16, 3)
    assert len(ds) < n_before
