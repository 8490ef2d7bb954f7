"""Observability: metric logging, debug tracing, NaN guards.

Replaces the reference's W&B plumbing (training.py:227-262, 557-717,
train.py:95-110) and its hand-rolled file tracer (utils.py:25-34, threaded
through the models via cross_attention_kwargs). W&B is used when the package
+ env are available; otherwise metrics stream to JSONL (always written, so
runs are inspectable offline either way).
"""

from __future__ import annotations

import json
import logging
import os
import time
from datetime import datetime
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def create_output_dirs(base: str = "outputs") -> Dict[str, str]:
    """Timestamped run dir with checkpoints/comparisons/samples/logs
    (reference utils.py:8-22)."""
    ts = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    root = os.path.join(base, ts)
    dirs = {"root": root}
    for sub in ("checkpoints", "comparisons", "samples", "logs"):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        dirs[sub] = d
    return dirs


def reuse_output_dirs(root: str) -> Dict[str, str]:
    """Re-enter an existing timestamped run dir (elastic resume: the
    resubmitted job keeps writing checkpoints/comparisons/logs into the SAME
    run instead of minting a fresh one — reference train.py:205-209 resumes
    into the ckpt's run)."""
    root = os.path.abspath(root)
    dirs = {"root": root}
    for sub in ("checkpoints", "comparisons", "samples", "logs"):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        dirs[sub] = d
    return dirs


def log_debug(path: Optional[str], msg: str) -> None:
    """Append-only timestamped debug tracer (reference utils.py:25-34)."""
    if not path:
        return
    with open(path, "a") as f:
        f.write(f"[{datetime.now().isoformat(timespec='milliseconds')}] {msg}\n")


class MetricLogger:
    """W&B when importable + configured, JSONL always."""

    def __init__(
        self,
        log_dir: str,
        project: str = "mvd",
        run_name: Optional[str] = None,
        run_id: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        use_wandb: bool = True,
        enabled: bool = True,
    ):
        # ``enabled=False`` turns the logger into a no-op sink — multi-host
        # runs log from the primary process only (DDP rank_zero_only
        # semantics; mvd_tpu/distributed.py:is_primary)
        self.enabled = enabled
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.jsonl_path, "a") if enabled else None
        self.wandb = None
        self.run_id = run_id
        if use_wandb and enabled:
            try:
                import wandb  # noqa: PLC0415

                self.wandb = wandb.init(
                    project=project,
                    name=run_name,
                    id=run_id,
                    resume="must" if run_id else None,
                    config=config,
                )
                self.run_id = self.wandb.id
            except Exception as e:
                logger.info("wandb unavailable (%s); JSONL only", e)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        if not self.enabled:
            return
        clean = {}
        for k, v in metrics.items():
            if hasattr(v, "item"):
                try:
                    v = float(np.asarray(v))
                except Exception:
                    continue
            clean[k] = v
        rec = {"step": step, "time": time.time(), **clean}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.wandb is not None:
            self.wandb.log(clean, step=step)

    def log_histograms(
        self, hists: Dict[str, np.ndarray], step: Optional[int] = None, bins: int = 16
    ):
        """Raw-value sample vectors -> W&B histograms (native binning, as the
        reference's Lightning/wandb gradient histograms, training.py:603-647)
        plus a compact binned record in the JSONL stream."""
        if not self.enabled:
            return
        rec: Dict[str, Any] = {"step": step, "time": time.time()}
        for k, v in hists.items():
            v = np.asarray(v, np.float64)
            counts, edges = np.histogram(v[np.isfinite(v)], bins=bins)
            rec[k] = {
                "counts": counts.tolist(),
                "lo": float(edges[0]),
                "hi": float(edges[-1]),
            }
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.wandb is not None:
            import wandb  # noqa: PLC0415

            self.wandb.log(
                {k: wandb.Histogram(np.asarray(v)) for k, v in hists.items()},
                step=step,
            )

    def log_images(self, images: Dict[str, np.ndarray], step: Optional[int] = None):
        if self.wandb is not None:
            import wandb  # noqa: PLC0415

            self.wandb.log(
                {k: wandb.Image(np.asarray(v)) for k, v in images.items()}, step=step
            )

    def finish(self):
        if self._f is not None:
            self._f.close()
        if self.wandb is not None:
            self.wandb.finish()


def check_finite(tree, name: str = "tree") -> bool:
    """Host-side NaN/Inf sweep (reference training.py:582-589's guard)."""
    import jax

    ok = True
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            logger.error("non-finite values in %s%s", name, jax.tree_util.keystr(path))
            ok = False
    return ok


def enable_nan_debugging():
    """jax-level NaN trap (SURVEY §5.2 plan: debug_nans as the TSAN
    stand-in for a functional runtime)."""
    import jax

    jax.config.update("jax_debug_nans", True)


def enable_compilation_cache(path: Optional[str] = None):
    """Persistent XLA compilation cache — repeat runs of the big pipeline
    programs skip the multi-minute first compile."""
    import jax

    path = path or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "mvd_tpu", "xla_cache",
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:
        logger.info("compilation cache unavailable: %s", e)
