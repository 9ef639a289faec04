"""SPMD data parallelism over a 1-D device mesh.

The workload's models are small (<160M params), so the one strategy that
matters is data parallelism over ICI: batches are sharded on a
`Mesh(('data',))`, parameters are replicated, and XLA inserts the gradient
all-reduce (psum) automatically when a jitted loss is differentiated over a
sharded batch.  TP/PP/SP/EP are deliberate non-goals (SURVEY.md §2.4) — the
largest matmul here fits comfortably on one chip's MXU.

The reference has no distributed analog (it is strictly single-GPU,
reference utils/trainer.py:41); this module generalizes its per-batch step to
N chips.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, axis name 'data'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Pad the leading dim up to a multiple; returns (padded, real_count).

    Eval batches must divide evenly across chips; padded rows are masked out
    of metric accumulation by the caller (preserving the reference's exact
    per-sample averaging, utils/tester.py:281-299).
    """
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad_width = [(0, rem)] + [(0, 0)] * (batch.ndim - 1)
    return np.pad(batch, pad_width), n


def shard_batch(batch, mesh: Mesh):
    """Device-put a host array sharded across the data axis."""
    return jax.device_put(batch, batch_sharding(mesh))


def require_divisible_batch(mesh: Mesh, *loaders) -> None:
    """Fail fast when a loader's batch cannot shard across the data axis.

    device_put of an indivisible batch dies deep inside XLA with an opaque
    sharding error (r3 advisor finding); name the fix instead."""
    for ld in loaders:
        if ld is None:
            continue
        if ld.batch_size % mesh.size != 0:
            rounded = -(-ld.batch_size // mesh.size) * mesh.size
            raise ValueError(
                f"batch_size={ld.batch_size} does not divide across the "
                f"{mesh.size}-device data-parallel mesh; use a multiple of "
                f"{mesh.size} (e.g. {rounded}).")
