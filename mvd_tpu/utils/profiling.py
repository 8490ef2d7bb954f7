"""Profiling: jax.profiler traces + step timing.

The reference's only performance tooling is perf_counter around pipeline
calls (val.py:331-347) plus a Lightning Timer. TPU-side we add real
profiler traces (SURVEY §5.1 plan): wrap any region in ``trace()`` and load
the result in TensorBoard/XProf; ``time_fn`` gives block_until_ready
steady-state timings for jitted callables.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling regions inside a trace."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 3, **kwargs) -> Dict[str, float]:
    """Steady-state timing with block_until_ready (the TPU analogue of
    reference val.py:331-347)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters": iters}


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GiB (when the backend reports it)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_gib": s.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_gib": s.get("peak_bytes_in_use", 0) / 2**30,
            }
        except Exception:
            pass
    return out
