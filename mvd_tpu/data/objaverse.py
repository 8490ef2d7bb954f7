"""Objaverse multi-view dataset (zip contract) + resumable loader.

Rebuild of reference src/data/objaverse_dataset.py:23-535. The on-disk
contract is unchanged (produced by the offline render/caption toolchain,
tools/rendering + tools/cleaning): one zip per object containing
``NNN.png`` renders, ``NNN.npy`` 4x4 camera-to-world matrices,
``prompt.txt``, ``metadata.json``.

Behavior kept from the reference:
  * glob ``<root>/renders_final/*.zip`` (objaverse_dataset.py:46-50),
  * deterministic shuffled 0.8/0.1/0.1 split, seed 42, with an md5 hash of
    the split file list (objaverse_dataset.py:61-92),
  * ordered source->target pairs over up to ``max_views_per_object`` sampled
    views, all i<j pairs, ``dataset_samples`` cap, JSON pair cache keyed by
    split-hash + cap (objaverse_dataset.py:94-201),
  * 3-retry self-healing reads that evict missing/corrupt zip entries from
    the pair list live (objaverse_dataset.py:215-253),
  * RGBA -> white composite, LANCZOS resize, [-1,1] normalize
    (objaverse_dataset.py:259-294),
  * ``state_dict``/``load_state_dict`` persisting the RNG state so resumed
    runs rebuild identical splits/pairs (objaverse_dataset.py:302-337).

TPU-native changes: images come back as NHWC float32 numpy (feeding the
device pipeline directly); the loader groups ``views_per_sample`` target
views of one object per sample for joint multi-view training (the reference
is strictly pairwise).
"""

from __future__ import annotations

import hashlib
import io
import json
import logging
import os
import random
import threading
import queue as queue_mod
import zipfile
from dataclasses import dataclass
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

try:
    from PIL import Image

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


def _load_image_from_bytes(data: bytes, image_size: int) -> np.ndarray:
    """PNG bytes -> (H, W, 3) float32 in [-1, 1], white-composited."""
    img = Image.open(io.BytesIO(data))
    if img.mode == "RGBA":
        bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
        img = Image.alpha_composite(bg, img)
    img = img.convert("RGB")
    if img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.LANCZOS)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


@dataclass
class ViewPair:
    zip_path: str
    source_view: int
    target_view: int
    prompt: str


@dataclass
class ViewGroup:
    """One source view conditioning V target views of the same object —
    the joint multi-view training unit (north-star extension of the
    reference's strictly pairwise samples, SURVEY §5.7)."""

    zip_path: str
    source_view: int
    target_views: tuple
    prompt: str


class ObjaverseDataset:
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
        cache_dir: Optional[str] = None,
        views_per_sample: int = 1,
        use_native: Optional[bool] = None,
        latent_cache_dir: Optional[str] = None,
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
        self.cache_dir = cache_dir or os.path.join(data_root, ".mvd_cache")
        self.views_per_sample = views_per_sample
        # Precomputed VAE latent-moment cache (data/latent_cache.py): when
        # set, samples carry "{source,target}_moments" (2,h,w,4) posteriors
        # instead of pixels and the train step skips the in-step VAE encode
        # entirely (reference training.py:173-177 re-encodes per step).
        self.latent_cache_dir = latent_cache_dir
        self.latent_cache = None
        if use_native is None:
            from . import native_loader

            use_native = native_loader.available()
        self.use_native = use_native
        self.rng = random.Random(seed)

        self._zip_lock = threading.Lock()
        self._zip_handles: Dict[str, zipfile.ZipFile] = {}

        self._build()

    # ------------------------------------------------------------------
    def _build(self):
        files = sorted(glob(os.path.join(self.data_root, "renders_final", "*.zip")))
        if not files:
            files = sorted(glob(os.path.join(self.data_root, "*.zip")))
        self.all_files = files
        self._split_dataset()
        self._build_view_pairs()
        if self.latent_cache_dir:
            from .latent_cache import LatentCacheReader

            self.latent_cache = LatentCacheReader(
                self.latent_cache_dir, image_size=self.image_size
            )
            missing = self.latent_cache.coverage(
                sorted({p.zip_path for p in self.pairs})
            )
            if missing:
                raise FileNotFoundError(
                    f"latent cache at {self.latent_cache_dir!r} is missing "
                    f"{len(missing)} of the split's zips (e.g. {missing[:3]}) — "
                    "run cli/precompute_latents.py over the corpus first"
                )
            # per-view completeness: a stale cache file (zip re-rendered
            # with more/renumbered views after caching) must fail HERE, not
            # crash mid-epoch when the pair is first drawn
            need: Dict[str, set] = {}
            for p in self.pairs:
                need.setdefault(p.zip_path, set()).update(
                    (p.source_view, p.target_view)
                )
            stale = []
            for zp, views in sorted(need.items()):
                keys = set(self.latent_cache.view_keys(zp))
                wanted = {f"{v:03d}" for v in views}
                if not wanted <= keys:
                    stale.append((zp, sorted(wanted - keys)))
            if stale:
                raise ValueError(
                    f"latent cache at {self.latent_cache_dir!r} is STALE for "
                    f"{len(stale)} zips (e.g. {stale[0][0]} lacks views "
                    f"{stale[0][1][:4]}) — re-run cli/precompute_latents.py "
                    "with --overwrite"
                )

    def _split_dataset(self):
        assert self.val_split + self.test_split < 1.0
        files = list(self.all_files)
        rng = random.Random(self.seed)
        rng.shuffle(files)
        n = len(files)
        n_test = int(n * self.test_split)
        n_val = int(n * self.val_split)
        splits = {
            "test": files[:n_test],
            "val": files[n_test : n_test + n_val],
            "train": files[n_test + n_val :],
        }
        self.files = splits[self.split]
        h = hashlib.md5("".join(self.files).encode()).hexdigest()[:12]
        self.split_hash = h

    def _pair_cache_path(self) -> str:
        cap = self.dataset_samples or "all"
        return os.path.join(
            self.cache_dir,
            f"pairs_{self.split}_{self.split_hash}_{self.max_views}_{cap}.json",
        )

    def _build_view_pairs(self):
        cache = self._pair_cache_path()
        if os.path.exists(cache):
            try:
                with open(cache) as f:
                    raw = json.load(f)
                self.pairs = [ViewPair(**p) for p in raw]
                logger.info("loaded %d pairs from cache %s", len(self.pairs), cache)
                return
            except Exception:
                logger.warning("pair cache unreadable, rebuilding: %s", cache)

        pairs: List[ViewPair] = []
        for zp in self.files:
            try:
                with zipfile.ZipFile(zp) as z:
                    names = z.namelist()
                    views = sorted(
                        int(os.path.splitext(os.path.basename(n))[0])
                        for n in names
                        if n.endswith(".png")
                        and os.path.splitext(os.path.basename(n))[0].isdigit()
                    )
                    prompt = "3D object"
                    for n in names:
                        if n.endswith("prompt.txt"):
                            prompt = z.read(n).decode("utf-8", "replace").strip() or prompt
                            break
            except Exception as e:
                logger.warning("skipping corrupt zip %s: %s", zp, e)
                continue
            if len(views) < 2:
                continue
            if len(views) > self.max_views:
                views = self.rng.sample(views, self.max_views)
                views.sort()
            for i in range(len(views)):
                for j in range(i + 1, len(views)):
                    pairs.append(ViewPair(zp, views[i], views[j], prompt))
            if self.dataset_samples and len(pairs) >= self.dataset_samples:
                pairs = pairs[: self.dataset_samples]
                break
        self.pairs = pairs

        try:
            os.makedirs(self.cache_dir, exist_ok=True)
            with open(cache, "w") as f:
                json.dump([p.__dict__ for p in pairs], f)
        except OSError as e:
            logger.warning("could not write pair cache: %s", e)

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.pairs)

    def _zip(self, path: str) -> zipfile.ZipFile:
        with self._zip_lock:
            if path not in self._zip_handles:
                self._zip_handles[path] = zipfile.ZipFile(path)
            return self._zip_handles[path]

    def _read_view(self, zp: str, view: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.use_native:
            from . import native_loader

            try:
                img = native_loader.load_view(zp, f"{view:03d}.png", self.image_size)
                cam = np.load(
                    io.BytesIO(native_loader.read_entry(zp, f"{view:03d}.npy"))
                ).astype(np.float32)
                if cam.shape == (3, 4):
                    cam = np.concatenate(
                        [cam, np.array([[0, 0, 0, 1]], np.float32)], axis=0
                    )
                return img, cam
            except RuntimeError:
                pass  # fall through to the PIL path (and its error handling)
        z = self._zip(zp)
        names = z.namelist()
        png = next(n for n in names if n.endswith(f"{view:03d}.png"))
        npy = next(n for n in names if n.endswith(f"{view:03d}.npy"))
        img = _load_image_from_bytes(z.read(png), self.image_size)
        cam = np.load(io.BytesIO(z.read(npy))).astype(np.float32)
        if cam.shape == (3, 4):
            cam = np.concatenate([cam, np.array([[0, 0, 0, 1]], np.float32)], axis=0)
        return img, cam

    def _read_camera(self, zp: str, view: int) -> np.ndarray:
        z = self._zip(zp)
        npy = next(n for n in z.namelist() if n.endswith(f"{view:03d}.npy"))
        cam = np.load(io.BytesIO(z.read(npy))).astype(np.float32)
        if cam.shape == (3, 4):
            cam = np.concatenate([cam, np.array([[0, 0, 0, 1]], np.float32)], axis=0)
        return cam

    def _view_payload(self, zp: str, view: int, role: str) -> Dict[str, np.ndarray]:
        """One view as sample entries: pixels (``<role>_image``) normally, or
        cached latent moments (``<role>_moments``) when a latent cache is
        attached. Cameras always come from the zip (tiny)."""
        if self.latent_cache is not None:
            return {
                f"{role}_moments": self.latent_cache.read(zp, view),
                f"{role}_camera": self._read_camera(zp, view),
            }
        img, cam = self._read_view(zp, view)
        return {f"{role}_image": img, f"{role}_camera": cam}

    def view_groups(self, num_targets: int) -> List[ViewGroup]:
        """Group the pair list into per-object (source, V targets) units."""
        by_obj: Dict[Tuple[str, int], List[ViewPair]] = {}
        for p in self.pairs:
            by_obj.setdefault((p.zip_path, p.source_view), []).append(p)
        groups = []
        for (zp, src), plist in by_obj.items():
            tgts = sorted({p.target_view for p in plist})
            for i in range(0, len(tgts) - num_targets + 1, num_targets):
                groups.append(
                    ViewGroup(zp, src, tuple(tgts[i : i + num_targets]), plist[0].prompt)
                )
        return groups

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        """Self-healing read: 3 retries, evicting broken pairs live
        (reference objaverse_dataset.py:215-253)."""
        for _ in range(3):
            if not self.pairs:
                raise RuntimeError("dataset exhausted: all pairs evicted")
            pair = self.pairs[idx % len(self.pairs)]
            try:
                return {
                    **self._view_payload(pair.zip_path, pair.source_view, "source"),
                    **self._view_payload(pair.zip_path, pair.target_view, "target"),
                    "prompt": pair.prompt,
                }
            except (zipfile.BadZipFile, FileNotFoundError, OSError) as e:
                # whole archive unreadable -> evict every pair from it
                logger.warning("dropping unreadable zip %s: %s", pair.zip_path, e)
                with self._zip_lock:
                    self._zip_handles.pop(pair.zip_path, None)
                if self.latent_cache is not None:
                    self.latent_cache.evict(pair.zip_path)
                self.pairs = [p for p in self.pairs if p.zip_path != pair.zip_path]
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
            self.rng.setstate(
                (loaded[0], tuple(loaded[1]), loaded[2])
            )
        self._build()


def collate(
    samples: Sequence[Dict[str, np.ndarray]],
    tokenizer,
    views_per_sample: int = 1,
) -> Dict[str, np.ndarray]:
    """Stack samples into (B, V, ...) arrays + tokenized prompts."""
    V = views_per_sample
    assert len(samples) % V == 0
    B = len(samples) // V

    def stack(key):
        return np.stack([s[key] for s in samples]).reshape(
            (B, V) + samples[0][key].shape
        )

    ids = tokenizer([s["prompt"] for s in samples]).reshape(B, V, -1)
    # stack every array entry the samples carry — pixel batches have
    # {source,target}_image, latent-cache batches {source,target}_moments
    out = {k: stack(k) for k in samples[0] if k != "prompt"}
    out["input_ids"] = ids
    return out


class DataLoader:
    """Background-thread prefetching loader producing (B, V, ...) numpy
    batches — the host side of the input pipeline (device-put + sharding is
    the trainer's job). Replaces torch DataLoader workers
    (objaverse_dataset.py:403-431)."""

    def __init__(
        self,
        dataset: ObjaverseDataset,
        tokenizer,
        batch_size: int,
        views_per_sample: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 4,
        drop_last: bool = True,
        process_count: int = 1,
        process_index: int = 0,
    ):
        self.ds = dataset
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.V = views_per_sample
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0
        # multi-host: every process computes the SAME global batch order
        # (seeded shuffle) and loads only its contiguous row block of each
        # batch — the DistributedSampler analogue (mvd_tpu/distributed.py
        # stitches the blocks back into one global array). batch_size stays
        # the GLOBAL batch; __len__ stays the global step count.
        self.process_count = max(1, process_count)
        self.process_index = process_index
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch_size ({batch_size}) must be divisible by the "
                f"process count ({self.process_count})"
            )

    def __len__(self):
        if self.V > 1:
            return len(self.ds.view_groups(self.V)) // self.batch_size
        n = len(self.ds) // (self.batch_size * self.V)
        if not self.drop_last and len(self.ds) % (self.batch_size * self.V):
            n += 1
        return n

    def _payload(self, zp: str, view: int, role: str) -> Dict[str, np.ndarray]:
        fn = getattr(self.ds, "_view_payload", None)
        if fn is not None:  # latent-cache-aware datasets (objaverse)
            return fn(zp, view, role)
        img, cam = self.ds._read_view(zp, view)
        return {f"{role}_image": img, f"{role}_camera": cam}

    def _load_group(self, group: ViewGroup) -> List[Dict[str, np.ndarray]]:
        """V samples sharing one source view (joint multi-view unit)."""
        src = self._payload(group.zip_path, group.source_view, "source")
        out = []
        for tv in group.target_views:
            tgt = self._payload(group.zip_path, tv, "target")
            out.append({**src, **tgt, "prompt": group.prompt})
        return out

    def __iter__(self):
        if self.V > 1:
            groups = self.ds.view_groups(self.V)
            order = list(range(len(groups)))
        else:
            groups = None
            order = list(range(len(self.ds)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        per_batch = self.batch_size if groups is not None else self.batch_size * self.V
        batches = [
            order[i : i + per_batch]
            for i in range(0, len(order) - per_batch + 1, per_batch)
        ]
        if self.process_count > 1:
            # contiguous per-process row block of every global batch, in
            # process order — matches make_array_from_process_local_data's
            # row placement over the process-major ``data`` mesh axis
            k = per_batch // self.process_count
            lo = self.process_index * k
            batches = [bi[lo : lo + k] for bi in batches]

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checked(item) -> bool:
            # bounded put that re-checks `stop`: a worker blocked forever in
            # q.put after the consumer exits early would leak producer
            # threads across re-iterations of the loader
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker(batch_indices_slice):
            for bi in batch_indices_slice:
                if stop.is_set():
                    return
                try:
                    if groups is not None:
                        samples = [s for i in bi for s in self._load_group(groups[i])]
                    else:
                        samples = [self.ds[i] for i in bi]
                    if not put_checked(collate(samples, self.tokenizer, self.V)):
                        return
                except Exception as e:  # keep the loop alive (self-healing)
                    logger.warning("batch skipped: %s", e)
            put_checked(None)

        shards = [batches[i :: self.num_workers] for i in range(self.num_workers)]
        threads = [
            threading.Thread(target=worker, args=(s,), daemon=True) for s in shards
        ]
        for t in threads:
            t.start()
        done = 0
        try:
            while done < len(threads):
                item = q.get()
                if item is None:
                    done += 1
                    continue
                yield item
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=2.0)


class ObjaverseDataModule:
    """train/val/test datasets + loaders + checkpointable state
    (reference objaverse_dataset.py:340-478).

    ``dataset_format`` selects the corpus layout: "objaverse" (rendered-zip
    shards, the reference's contract) or "co3d" (CO3D-style real-image
    multi-view sequence shards, mvd_tpu/data/co3d.py — BASELINE config 5)."""

    def __init__(self, data_root: str, tokenizer, image_size=768,
                 batch_size=6, max_views_per_object=8, dataset_samples=None,
                 views_per_sample=1, num_workers=4, seed=42,
                 dataset_format: str = "objaverse",
                 latent_cache_dir: Optional[str] = None,
                 process_count: int = 1, process_index: int = 0):
        self.kwargs = dict(
            data_root=data_root,
            image_size=image_size,
            max_views_per_object=max_views_per_object,
            dataset_samples=dataset_samples,
            seed=seed,
            views_per_sample=views_per_sample,
        )
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.views_per_sample = views_per_sample
        self.num_workers = num_workers
        self.dataset_format = dataset_format
        # train split only: validation generates images (needs source pixels)
        # and compares against target pixels, so val/test stay on pixels
        self.latent_cache_dir = latent_cache_dir
        self.process_count = process_count
        self.process_index = process_index
        self.datasets: Dict[str, ObjaverseDataset] = {}

    def _dataset_cls(self):
        if self.dataset_format == "co3d":
            from .co3d import CO3DDataset

            return CO3DDataset
        if self.dataset_format != "objaverse":
            raise ValueError(f"unknown dataset_format: {self.dataset_format!r}")
        return ObjaverseDataset

    def setup(self):
        cls = self._dataset_cls()
        if self.latent_cache_dir and cls is not ObjaverseDataset:
            # dropping the cache silently would re-enable full per-step VAE
            # encoding with no indication why training got slower
            raise ValueError(
                f"latent_cache_dir is set but dataset_format="
                f"{self.dataset_format!r} does not support a latent cache "
                "(only the objaverse rendered-zip format does); unset one"
            )
        for split in ("train", "val", "test"):
            kw = dict(self.kwargs)
            if split == "train" and self.latent_cache_dir and cls is ObjaverseDataset:
                kw["latent_cache_dir"] = self.latent_cache_dir
            self.datasets[split] = cls(split=split, **kw)

    def loader(self, split: str, shuffle: Optional[bool] = None) -> DataLoader:
        if split not in self.datasets:
            self.setup()
        return DataLoader(
            self.datasets[split],
            self.tokenizer,
            batch_size=self.batch_size,
            views_per_sample=self.views_per_sample,
            shuffle=shuffle if shuffle is not None else split == "train",
            num_workers=self.num_workers,
            process_count=self.process_count,
            process_index=self.process_index,
        )

    def state_dict(self):
        return {k: d.state_dict() for k, d in self.datasets.items()}

    def load_state_dict(self, state):
        if not self.datasets:
            self.setup()
        for k, s in state.items():
            if k in self.datasets:
                self.datasets[k].load_state_dict(s)


def visualize_sample(sample: Dict[str, np.ndarray], path: str):
    """Source|target comparison sheet for one sample (reference
    objaverse_dataset.py:481-535's smoke visualization)."""
    from ..utils import save_image, side_by_side

    sheet = side_by_side(
        [(sample["source_image"] + 1) / 2, (sample["target_image"] + 1) / 2]
    )
    save_image(sheet, path)


if __name__ == "__main__":
    # smoke entry (the reference's runnable dataset main,
    # objaverse_dataset.py:504-535): load one batch and dump a visualization
    import argparse

    from .tokenizer import HashTokenizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--out", default="sample_visualization.png")
    a = ap.parse_args()
    ds = ObjaverseDataset(a.data_root, "train", image_size=a.image_size)
    print(f"{len(ds)} pairs, split hash {ds.split_hash}")
    s = ds[0]
    print({k: getattr(v, "shape", v) for k, v in s.items()})
    visualize_sample(s, a.out)
    dl = DataLoader(ds, HashTokenizer(), batch_size=2)
    b = next(iter(dl))
    print("batch:", {k: v.shape for k, v in b.items()})
