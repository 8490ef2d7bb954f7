"""CO3D-style multi-view shard dataset (BASELINE config 5).

Reads real-image multi-view sequence collections laid out the way CO3D
(Common Objects in 3D, facebookresearch/co3d) ships them:

    <root>/<category>/frame_annotations.jgz      # gzipped JSON frame list
    <root>/<category>/<sequence>/images/frame000001.jpg

Each record in ``frame_annotations`` carries ``sequence_name``,
``frame_number``, ``image.path`` and a PyTorch3D ``viewpoint`` (row-vector
world-to-camera ``R`` (3x3) and ``T`` (3,)).  A lighter annotation-free
layout is also supported for synthetic corpora:

    <root>/<category>/<sequence>/images/*.png|jpg
    <root>/<category>/<sequence>/cameras.npy     # (N, 4, 4) camera-to-world

Cameras are normalized to 4x4 camera-to-world matrices, the same contract
as the Objaverse renderer's ``matrix_world`` (tools/rendering/
blender_script.py), so the camera encoder's relative source->target
transform (mvd_tpu/nn/camera_encoder.py, reference camera_encoder.py:107-120)
works unchanged.  The relative transform R_t·R_sᵀ / T_t − R_rel·T_s is
invariant to any fixed orthogonal axis convention applied to every camera
(tests/test_co3d.py pins this), so no PyTorch3D->Blender axis flip is
needed or applied.

The dataset presents the exact interface of
:class:`mvd_tpu.data.objaverse.ObjaverseDataset` (``pairs`` /
``view_groups`` / ``_read_view`` / ``state_dict``), so the threaded
prefetching :class:`mvd_tpu.data.objaverse.DataLoader` and the trainer
consume it unmodified.  Prompts default to "a photo of a <category>"
(CO3D has no captions) with an optional per-sequence ``prompt.txt``
override, mirroring the Objaverse in-zip prompt contract (reference
objaverse_dataset.py:126-185).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import logging
import os
import random
from glob import glob
from typing import Dict, List, Optional, Tuple

import numpy as np

from .objaverse import ViewGroup, ViewPair, _load_image_from_bytes

logger = logging.getLogger(__name__)


def pytorch3d_to_c2w(R: np.ndarray, T: np.ndarray) -> np.ndarray:
    """PyTorch3D viewpoint -> 4x4 camera-to-world.

    PyTorch3D stores the world-to-camera map in row-vector convention:
    ``x_cam = x_world @ R + T``; for column vectors that is
    ``x_cam = Rᵀ·x_world + T``, so the camera-to-world inverse is
    ``[[R, -R·T], [0, 1]]``."""
    R = np.asarray(R, np.float32).reshape(3, 3)
    T = np.asarray(T, np.float32).reshape(3)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R
    c2w[:3, 3] = -R @ T
    return c2w


def _load_frame_annotations(path: str) -> List[dict]:
    if path.endswith(".jgz"):
        with gzip.open(path, "rt") as f:
            return json.load(f)
    with open(path) as f:
        return json.load(f)


class CO3DDataset:
    """Sequence-split multi-view dataset over CO3D-style shards."""

    def __init__(
        self,
        data_root: str,
        split: str = "train",
        image_size: int = 768,
        max_views_per_object: int = 8,
        dataset_samples: Optional[int] = None,
        seed: int = 42,
        val_split: float = 0.1,
        test_split: float = 0.1,
        cache_dir: Optional[str] = None,  # interface parity; pairs are cheap
        views_per_sample: int = 1,
        use_native: Optional[bool] = None,  # interface parity (no zips here)
    ):
        assert split in ("train", "val", "test")
        self.data_root = data_root
        self.split = split
        self.image_size = image_size
        self.max_views = max_views_per_object
        self.dataset_samples = dataset_samples
        self.seed = seed
        self.val_split = val_split
        self.test_split = test_split
        self.views_per_sample = views_per_sample
        self.rng = random.Random(seed)
        self._build()

    # ------------------------------------------------------------------
    def _discover(self) -> Dict[str, Dict[int, Tuple[str, np.ndarray]]]:
        """sequence dir -> {frame_number: (image path, 4x4 c2w)}."""
        frames: Dict[str, Dict[int, Tuple[str, np.ndarray]]] = {}
        for cat in sorted(glob(os.path.join(self.data_root, "*"))):
            if not os.path.isdir(cat):
                continue
            ann_path = None
            for name in ("frame_annotations.jgz", "frame_annotations.json"):
                p = os.path.join(cat, name)
                if os.path.exists(p):
                    ann_path = p
                    break
            if ann_path:
                try:
                    anns = _load_frame_annotations(ann_path)
                except Exception as e:
                    logger.warning("unreadable annotations %s: %s", ann_path, e)
                    continue
                for a in anns:
                    seq = os.path.join(cat, a["sequence_name"])
                    img = os.path.join(self.data_root, a["image"]["path"])
                    vp = a["viewpoint"]
                    c2w = pytorch3d_to_c2w(vp["R"], vp["T"])
                    frames.setdefault(seq, {})[int(a["frame_number"])] = (img, c2w)
            else:
                for seq in sorted(glob(os.path.join(cat, "*"))):
                    cams_path = os.path.join(seq, "cameras.npy")
                    imgs = sorted(
                        glob(os.path.join(seq, "images", "*.png"))
                        + glob(os.path.join(seq, "images", "*.jpg"))
                    )
                    if not imgs or not os.path.exists(cams_path):
                        continue
                    cams = np.load(cams_path).astype(np.float32)
                    if cams.shape[0] < len(imgs):
                        logger.warning("camera/frame count mismatch in %s", seq)
                        continue
                    frames[seq] = {
                        i: (p, cams[i]) for i, p in enumerate(imgs)
                    }
        return frames

    def _build(self):
        self.frames = self._discover()
        seqs = sorted(self.frames)
        rng = random.Random(self.seed)
        rng.shuffle(seqs)
        n = len(seqs)
        n_test = int(n * self.test_split)
        n_val = int(n * self.val_split)
        splits = {
            "test": seqs[:n_test],
            "val": seqs[n_test : n_test + n_val],
            "train": seqs[n_test + n_val :],
        }
        self.sequences = splits[self.split]
        self.split_hash = hashlib.md5("".join(self.sequences).encode()).hexdigest()[:12]

        pairs: List[ViewPair] = []
        for seq in self.sequences:
            views = sorted(self.frames[seq])
            if len(views) < 2:
                continue
            if len(views) > self.max_views:
                views = self.rng.sample(views, self.max_views)
                views.sort()
            prompt = self._prompt(seq)
            for i in range(len(views)):
                for j in range(i + 1, len(views)):
                    pairs.append(ViewPair(seq, views[i], views[j], prompt))
            if self.dataset_samples and len(pairs) >= self.dataset_samples:
                pairs = pairs[: self.dataset_samples]
                break
        self.pairs = pairs

    def _prompt(self, seq: str) -> str:
        p = os.path.join(seq, "prompt.txt")
        if os.path.exists(p):
            try:
                with open(p) as f:
                    text = f.read().strip()
                if text:
                    return text
            except OSError:
                pass
        category = os.path.basename(os.path.dirname(seq))
        return f"a photo of a {category.replace('_', ' ')}"

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.pairs)

    def _read_view(self, seq: str, view: int) -> Tuple[np.ndarray, np.ndarray]:
        path, c2w = self.frames[seq][view]
        with open(path, "rb") as f:
            img = _load_image_from_bytes(f.read(), self.image_size)
        return img, c2w.copy()

    def view_groups(self, num_targets: int) -> List[ViewGroup]:
        by_obj: Dict[Tuple[str, int], List[ViewPair]] = {}
        for p in self.pairs:
            by_obj.setdefault((p.zip_path, p.source_view), []).append(p)
        groups = []
        for (seq, src), plist in by_obj.items():
            tgts = sorted({p.target_view for p in plist})
            for i in range(0, len(tgts) - num_targets + 1, num_targets):
                groups.append(
                    ViewGroup(seq, src, tuple(tgts[i : i + num_targets]), plist[0].prompt)
                )
        return groups

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        """Self-healing read mirroring ObjaverseDataset.__getitem__
        (reference objaverse_dataset.py:215-253)."""
        for _ in range(3):
            if not self.pairs:
                raise RuntimeError("dataset exhausted: all pairs evicted")
            pair = self.pairs[idx % len(self.pairs)]
            try:
                src_img, src_cam = self._read_view(pair.zip_path, pair.source_view)
                tgt_img, tgt_cam = self._read_view(pair.zip_path, pair.target_view)
                return {
                    "source_image": src_img,
                    "target_image": tgt_img,
                    "source_camera": src_cam,
                    "target_camera": tgt_cam,
                    "prompt": pair.prompt,
                }
            except Exception as e:
                logger.warning(
                    "dropping bad pair %s (%d->%d): %s",
                    pair.zip_path, pair.source_view, pair.target_view, e,
                )
                self.pairs = [p for p in self.pairs if p is not pair]
                idx += 1
        raise RuntimeError("3 consecutive corrupt samples")

    # ------------------------------------------------------------------
    def state_dict(self) -> Dict:
        return {
            "rng_state": json.dumps(self.rng.getstate(), default=list),
            "split": self.split,
            "seed": self.seed,
        }

    def load_state_dict(self, state: Dict):
        self.seed = state.get("seed", self.seed)
        self.rng = random.Random(self.seed)
        rs = state.get("rng_state")
        if rs:
            loaded = json.loads(rs)
            self.rng.setstate((loaded[0], tuple(loaded[1]), loaded[2]))
        self._build()
