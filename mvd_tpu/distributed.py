"""Multi-host (multi-process) runtime bootstrap.

The reference scales with torch DDP: one process per GPU, NCCL all-reduce,
SLURM rank wiring (reference train.py:175-186 DDPStrategy +
SLURMEnvironment, train.sh:5-9). The JAX equivalent at pod scale is one
process per HOST: ``jax.distributed.initialize`` joins the processes into
one runtime, ``jax.devices()`` becomes the *global* device list, and the
existing mesh/shardings (mvd_tpu/mesh.py) simply span hosts — the same
jitted train step runs unchanged, with XLA routing collectives over
ICI within a host/slice and DCN across them.

This module owns the process-level plumbing that JAX does not do for you:

  * :func:`initialize` — explicit flags > ``MVD_*`` env vars > cluster
    auto-detection (SLURM et al., via jax.distributed's own detectors).
    No-op for single-process runs, so every entry point can call it
    unconditionally.
  * primary-process helpers (:func:`is_primary`) — metrics/W&B/PNG IO
    happens on process 0 only (the DDP ``rank_zero_only`` equivalent).
  * :func:`broadcast_str` — run-dir agreement: every process must write
    checkpoints into the SAME timestamped run dir (orbax coordinates a
    multi-host save; mismatched dirs deadlock the barrier).
  * :func:`global_batch` — assemble per-process loader output into global
    jax.Arrays over the batch sharding (the input half of DDP, replacing
    torch's DistributedSampler + per-rank loaders:
    reference objaverse_dataset.py:403-431 gives each rank its own
    DataLoader; here each process loads its contiguous row block of every
    global batch — data/objaverse.py DataLoader(process_count=...) — and
    this function stitches the blocks into one mesh-sharded array).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

_INITIALIZED = False


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Join the multi-process JAX runtime; no-op for single-process runs.

    Resolution order per field: explicit argument, then ``MVD_COORDINATOR``/
    ``MVD_NUM_PROCESSES``/``MVD_PROCESS_ID`` env vars, then jax.distributed's
    own cluster auto-detection (SLURM, TPU pod metadata, ...). Returns True
    when a multi-process runtime was (already) initialized.

    Must run before the first backend touch (any ``jax.devices()`` /
    array op); entry points call it right after parsing args.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("MVD_COORDINATOR") or None
    if num_processes is None and os.environ.get("MVD_NUM_PROCESSES"):
        num_processes = int(os.environ["MVD_NUM_PROCESSES"])
    if process_id is None and os.environ.get("MVD_PROCESS_ID"):
        process_id = int(os.environ["MVD_PROCESS_ID"])

    explicit = coordinator is not None or (num_processes or 0) > 1
    # SLURM multi-task allocations auto-detect (the reference's
    # SLURMEnvironment role); single-task runs stay single-process
    auto = int(os.environ.get("SLURM_NTASKS", "1")) > 1
    if not explicit and not auto:
        return False
    if num_processes == 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    logger.info(
        "multi-host runtime up: process %d/%d, %d local of %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.local_devices()),
        jax.device_count(),
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the logging/IO process (DDP rank-zero equivalent)."""
    return jax.process_index() == 0


def broadcast_str(s: Optional[str], max_len: int = 512) -> Optional[str]:
    """Broadcast a string from the primary process to all others.

    Used for run-dir agreement: the timestamped run dir is minted on the
    primary (utils/logging.py:create_output_dirs) and every other process
    re-enters it, so orbax's coordinated multi-host save sees one path.
    Single-process: identity.
    """
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    data = (s or "").encode("utf-8")
    if len(data) > max_len:
        raise ValueError(f"string too long to broadcast ({len(data)} > {max_len})")
    buf = np.zeros((max_len,), np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    text = bytes(out[out != 0]).decode("utf-8")
    return text or None


def replicate_to_mesh(mesh, tree):
    """Host-local pytree -> globally-replicated jax.Arrays over ``mesh``.

    Multi-process jit requires every input to be a global array; params/opt
    state initialized locally (identically on every process — same PRNG
    seed) are stitched into replicated global arrays here. Single-process:
    identity (jit replicates uncommitted arrays implicitly).
    """
    if jax.process_count() == 1:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def put(x):
        if not hasattr(x, "shape") and not isinstance(x, (int, float, np.number)):
            return x
        return jax.make_array_from_process_local_data(repl, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def global_batch(mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Per-process local (B_local, V, ...) arrays -> global mesh-sharded
    jax.Arrays with B over the ``data`` axis and V over ``view``.

    Single-process: identity (the train step's own device_put handles
    placement). Multi-process: ``jax.make_array_from_process_local_data``
    stitches each process's contiguous row block (the slice its DataLoader
    loaded) into one global array without any cross-host copy of the data
    itself. Requires the mesh's ``view``/``model`` axes to live within a
    process (they are ICI axes by construction — mesh.py) so that only the
    ``data`` axis spans hosts.
    """
    if jax.process_count() == 1:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_local = len(mesh.local_devices)
    vm = mesh.shape.get("view", 1) * mesh.shape.get("model", 1)
    if n_local % vm:
        raise ValueError(
            f"mesh view*model ({vm}) must divide the per-process device "
            f"count ({n_local}): the view/model axes are ICI axes and must "
            "not span hosts"
        )

    def put(x):
        nd = np.ndim(x)
        spec = P("data", *(["view"] if nd > 1 else []), *([None] * max(0, nd - 2)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    return {k: put(v) for k, v in batch.items()}
