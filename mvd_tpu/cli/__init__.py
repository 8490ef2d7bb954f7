"""Command-line entry points (reference train.py / infer.py / val.py).

``apply_platform_env()`` makes ``JAX_PLATFORMS=cpu python -m mvd_tpu.cli.*``
behave as documented: under out-of-tree PJRT plugins registered by a
sitecustomize (the axon TPU tunnel), the environment variable alone does
not always win — ``jax.config.update("jax_platforms", ...)`` before the
first backend instantiation does. Every CLI main calls it first.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
