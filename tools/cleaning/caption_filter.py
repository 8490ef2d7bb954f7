"""VLM caption + usefulness filter for rendered objects.

Rebuild of reference src/data/cleaning/main.py:1-460: a vision-language
model describes up to 3 views per object (reference :153-207), the
descriptions are distilled into a 2-sentence prompt (:210-255), the object
is classified useful/useless (:258-305), the prompt is injected into the
zip as ``prompt.txt`` (:308-344), and the zip moves to ``renders_final/``
or ``rejected/`` with SQLite progress tracking (:79-94, 347-457).

The VLM backend is pluggable: the default tries Qwen2.5-VL via
transformers (as the reference uses) and degrades to a deterministic
heuristic captioner in hermetic environments (no model weights) so the
pipeline — selection, prompt injection, moves, resume — still runs and is
testable.
"""

from __future__ import annotations

import argparse
import io
import logging
import os
import shutil
import zipfile
from glob import glob
from typing import List, Optional, Tuple

import numpy as np

from .progress_db import ProgressDB

logger = logging.getLogger(__name__)


class HeuristicCaptioner:
    """Weights-free stand-in backend: judges usefulness by image statistics
    (non-empty, some contrast/color variety) and emits a generic prompt."""

    def describe(self, images) -> List[str]:
        return [f"render with std {np.asarray(i).std():.1f}" for i in images]

    def distill(self, descriptions: List[str]) -> str:
        return "A 3D object rendered from multiple views. High quality textured asset."

    def classify(self, images, descriptions) -> bool:
        stds = [np.asarray(i, dtype=np.float64).std() for i in images]
        return bool(np.mean(stds) > 5.0)


class QwenVLCaptioner:
    """transformers Qwen2.5-VL backend (reference cleaning/main.py:60-76)."""

    def __init__(self, model_name: str = "Qwen/Qwen2.5-VL-3B-Instruct"):
        from transformers import AutoProcessor, Qwen2_5_VLForConditionalGeneration

        self.processor = AutoProcessor.from_pretrained(model_name)
        self.model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
            model_name, torch_dtype="auto", device_map="auto"
        )

    def _chat(self, prompt: str, image=None) -> str:
        content = [{"type": "text", "text": prompt}]
        if image is not None:
            content = [{"type": "image", "image": image}] + content
        messages = [{"role": "user", "content": content}]
        text = self.processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        inputs = self.processor(
            text=[text], images=[image] if image is not None else None,
            return_tensors="pt",
        ).to(self.model.device)
        out = self.model.generate(**inputs, max_new_tokens=128)
        return self.processor.batch_decode(
            out[:, inputs.input_ids.shape[1]:], skip_special_tokens=True
        )[0]

    def describe(self, images) -> List[str]:
        return [
            self._chat("Describe this rendered 3D object in one sentence.", img)
            for img in images[:3]
        ]

    def distill(self, descriptions: List[str]) -> str:
        joined = " ".join(descriptions)
        return self._chat(
            "Combine these view descriptions into a single 2-sentence prompt "
            f"describing the 3D object: {joined}"
        ).strip()

    def classify(self, images, descriptions) -> bool:
        ans = self._chat(
            "Is this a useful, recognizable 3D object for training a "
            "generative model? Answer only 'useful' or 'useless'. "
            f"Descriptions: {' '.join(descriptions)}"
        )
        return "useless" not in ans.lower()


def load_views(zip_path: str, max_views: int = 3):
    from PIL import Image

    images = []
    with zipfile.ZipFile(zip_path) as z:
        names = sorted(
            n for n in z.namelist()
            if n.endswith(".png")
            and os.path.splitext(os.path.basename(n))[0].isdigit()
        )
        for name in names[:max_views]:
            img = Image.open(io.BytesIO(z.read(name)))
            if img.mode == "RGBA":
                bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
                img = Image.alpha_composite(bg, img)
            images.append(img.convert("RGB"))
    return images


def add_prompt_to_zip(zip_path: str, prompt: str):
    """Inject prompt.txt (reference cleaning/main.py:308-344). Zip entries
    can't be replaced in place; rewrite without any existing prompt.txt."""
    tmp = zip_path + ".tmp"
    with zipfile.ZipFile(zip_path) as zin, zipfile.ZipFile(
        tmp, "w", zipfile.ZIP_DEFLATED
    ) as zout:
        for item in zin.infolist():
            if item.filename.endswith("prompt.txt"):
                continue
            zout.writestr(item, zin.read(item.filename))
        zout.writestr("prompt.txt", prompt)
    os.replace(tmp, zip_path)


def make_captioner(backend: str = "auto"):
    if backend == "heuristic":
        return HeuristicCaptioner()
    try:
        return QwenVLCaptioner()
    except Exception as e:
        if backend == "qwen":
            raise
        logger.warning("VLM unavailable (%s); using heuristic captioner", e)
        return HeuristicCaptioner()


def process_zip(zp: str, captioner, output_dir: str, rejected_dir: str, db: ProgressDB):
    name = os.path.basename(zp)
    images = load_views(zp)
    if not images:
        db.mark(name, "error", "no views")
        return False
    descriptions = captioner.describe(images)
    useful = captioner.classify(images, descriptions)
    if useful:
        prompt = captioner.distill(descriptions)
        add_prompt_to_zip(zp, prompt)
        shutil.move(zp, os.path.join(output_dir, name))
        db.mark(name, "accepted", prompt[:200])
    else:
        shutil.move(zp, os.path.join(rejected_dir, name))
        db.mark(name, "rejected")
    return useful


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--rejected-dir", required=True)
    p.add_argument("--db", default=None)
    p.add_argument("--backend", default="auto", choices=["auto", "qwen", "heuristic"])
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(args.rejected_dir, exist_ok=True)
    db = ProgressDB(args.db or os.path.join(args.input_dir, "caption_filter.db"))
    captioner = make_captioner(args.backend)

    n_acc = n_rej = n_skip = 0
    for zp in sorted(glob(os.path.join(args.input_dir, "*.zip"))):
        name = os.path.basename(zp)
        if db.is_processed(name):
            n_skip += 1
            continue
        try:
            ok = process_zip(zp, captioner, args.output_dir, args.rejected_dir, db)
            n_acc += ok
            n_rej += not ok
        except Exception as e:
            logger.warning("failed on %s: %s", zp, e)
            db.mark(name, "error", str(e))
    print(f"accepted={n_acc} rejected={n_rej} skipped={n_skip}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
