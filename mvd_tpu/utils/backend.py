"""Bounded backend probing.

Under the axon PJRT tunnel, TPU backend initialisation can not only *raise*
(UNAVAILABLE) but *hang* for minutes when the tunnel is down.  Any entry
point that must never hang (the driver contract in ``__graft_entry__.py``,
``bench.py``) therefore probes the backend in a **subprocess with a
timeout** before letting the current process touch it.

``tpu_usable()`` returns True only if a fresh interpreter can initialise a
TPU backend within ``timeout`` seconds.  On False, callers should force the
CPU platform with ``jax.config.update("jax_platforms", "cpu")`` *before*
any backend is instantiated in the current process (the env var alone does
not beat a sitecustomize-registered plugin).
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE_CODE = (
    "import jax, sys\n"
    "sys.exit(0 if any(d.platform == 'tpu' for d in jax.devices()) else 3)\n"
)


def tpu_usable(timeout: float = 120.0) -> bool:
    """True iff a fresh interpreter sees a TPU device within ``timeout`` s.

    Runs the probe in a subprocess so a hanging backend init (tunnel down)
    cannot hang the caller.  Set ``MVD_SKIP_TPU_PROBE=1`` to bypass the
    probe and report True (useful when the caller knows the backend is up
    and wants to save the ~10 s probe cost).
    """
    skip = os.environ.get("MVD_SKIP_TPU_PROBE", "")
    if skip == "1":
        return True
    env = dict(os.environ)
    env.pop("_MVD_DRYRUN_CHILD", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            env=env,
            timeout=timeout,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return proc.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def devices_available(n: int, timeout: float = 120.0) -> bool:
    """True iff a fresh interpreter (same env) sees >= ``n`` devices within
    ``timeout`` s.  Bounded like :func:`tpu_usable` — a hanging backend init
    reports False instead of hanging the caller."""
    code = f"import jax, sys\nsys.exit(0 if len(jax.devices()) >= {int(n)} else 3)\n"
    env = dict(os.environ)
    env.pop("_MVD_DRYRUN_CHILD", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            timeout=timeout,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return proc.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def require_backend(prefer_tpu: bool = True, timeout: float = 120.0) -> bool:
    """Bounded backend selection for hang-proof entry points.

    Probes TPU availability in a subprocess; if unusable (raises OR hangs),
    pins the current process to the CPU platform before any backend is
    instantiated.  Returns True iff the TPU is usable.  Must be called
    before anything touches ``jax.devices()`` / array ops in this process.
    """
    import jax

    if prefer_tpu and tpu_usable(timeout=timeout):
        return True
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already instantiated; caller got a working one
    return False
