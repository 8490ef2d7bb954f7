"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's NCCL/Lightning DDP stack
(reference train.py:175-186: DDPStrategy over 4 GPUs — data parallelism
only). Here parallelism is expressed once, as shardings over a named mesh:

  * ``data``  — batch axis (the DDP equivalent; gradient all-reduce over ICI
    is inserted by XLA),
  * ``view``  — the multi-view axis; cross-view (joint) attention over a
    sharded view axis runs as a ring collective
    (mvd_tpu/kernels/ring_attention.py) — the moral equivalent of ring/
    sequence parallelism for this workload (SURVEY §5.7),
  * ``model`` — reserved tensor-parallel axis for the UNet's widest matmuls
    (not required at SD2.1 scale on one v5e chip, wired for larger variants).

On CI/CPU the same code runs against 8 virtual host devices
(``--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "view", "model")


def make_mesh(
    data: int = 1,
    view: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    num_slices: int = 1,
) -> Mesh:
    """Build the ("data","view","model") mesh.

    ``num_slices > 1`` builds a multi-slice (DCN) mesh: the data axis spans
    slices — its outermost factor is the slice index, so the gradient
    all-reduce decomposes into an in-slice reduce over ICI plus one
    cross-slice reduce over DCN — while view/model stay entirely within a
    slice (ICI-only collectives, where the per-step ring attention lives).
    Devices are grouped by their ``slice_index`` attribute when the platform
    reports one (real multi-slice TPU); otherwise the device list is split
    into ``num_slices`` contiguous groups (CPU-mesh tests).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = data * view * model
    if need > len(devices):
        raise ValueError(f"mesh {data}x{view}x{model} needs {need} devices, have {len(devices)}")
    if num_slices > 1:
        if data % num_slices:
            raise ValueError(
                f"data axis ({data}) must be divisible by num_slices ({num_slices})"
            )
        per_slice = need // num_slices
        if any(getattr(d, "slice_index", None) is not None for d in devices):
            groups: Dict[int, list] = {}
            for d in devices:
                groups.setdefault(getattr(d, "slice_index", 0), []).append(d)
            slices = [groups[k] for k in sorted(groups)]
            if len(slices) < num_slices or any(
                len(s) < per_slice for s in slices[:num_slices]
            ):
                raise ValueError(
                    f"need {num_slices} slices x {per_slice} devices, have "
                    f"{[len(s) for s in slices]}"
                )
        else:
            slices = [
                devices[i * per_slice : (i + 1) * per_slice]
                for i in range(num_slices)
            ]
        # (slice, data_in_slice, view, model) -> (data, view, model): the
        # slice index is the outermost factor of the data axis
        dev = np.asarray(
            [s[:per_slice] for s in slices[:num_slices]]
        ).reshape(num_slices, data // num_slices, view, model)
        return Mesh(dev.reshape(data, view, model), AXES)
    dev = np.asarray(devices[:need]).reshape(data, view, model)
    return Mesh(dev, AXES)


def mesh_from_shape(shape: Dict[str, int], devices=None) -> Mesh:
    return make_mesh(
        data=shape.get("data", 1),
        view=shape.get("view", 1),
        model=shape.get("model", 1),
        devices=devices,
        num_slices=shape.get("num_slices", 1),
    )


def auto_mesh_shape(n_devices: int, num_views: int = 1) -> Dict[str, int]:
    """Default policy: give the view axis as many devices as divide both the
    device count and the view count; rest goes to data."""
    view = 1
    for v in range(min(n_devices, num_views), 0, -1):
        if n_devices % v == 0 and num_views % v == 0:
            view = v
            break
    return {"data": n_devices // view, "view": view, "model": 1}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading axis sharded over (data, view) — for flat (B*V, ...) batches."""
    return NamedSharding(mesh, P(("data", "view"), *([None] * (ndim - 1))))


def view_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """(B, V, ...) batches: B over data, V over view."""
    return NamedSharding(mesh, P("data", "view", *([None] * (ndim - 2))))


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of (B*V, ...) arrays with the batch sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree
    )
