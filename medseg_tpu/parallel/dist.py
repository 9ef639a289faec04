"""Cross-host (DCN) scaling: multi-process JAX initialization + global mesh.

The reference is strictly single-process/single-GPU (utils/trainer.py:41 —
`torch.device("cuda" ...)`; SURVEY.md §2.4 found zero distributed code).
Within one TPU slice this framework scales over ICI with a
`Mesh(('data',))` (parallel/sharding.py).  This module is the optional
third tier: the SAME pjit programs spanning multiple hosts over DCN.

Design (the standard JAX multi-controller recipe, scaling-book style):

- every host runs the same program and calls `initialize_from_env()` once,
  before any backend touch;
- `jax.distributed.initialize` wires the coordinator; afterwards
  `jax.devices()` is the GLOBAL device set while
  `jax.local_devices()` is this host's — `data_parallel_mesh()` over the
  global set then spans DCN with no other code change (the jitted
  train/eval programs are process-count agnostic: XLA routes the gradient
  psum over ICI within a slice and DCN across slices);
- each host feeds only its own rows: `shard_process_local` assembles a
  global batch from per-process shards via
  `jax.make_array_from_process_local_data`, so no host ever materializes
  (or transfers) the full global batch.

Environment contract (explicit, nothing auto-fires):

    MEDSEG_COORDINATOR = host:port of process 0
    MEDSEG_NUM_PROCESSES, MEDSEG_PROCESS_ID = integers

On TPU pods with the standard metadata service, `MEDSEG_COORDINATOR=auto`
defers every argument to jax.distributed's own autodetection.  With none of
the variables set this module is a no-op and the framework stays
single-process (the only mode this dev environment can run for real — one
v5e chip behind a relay).  The 2-process CPU test
(tests/test_distributed.py) is the fake-backend certification: two
coordinated processes build the global mesh and their data-parallel train
step matches the single-process step bit-for-bit.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .sharding import batch_sharding, data_parallel_mesh

_INITIALIZED = False


def initialize_from_env(env=os.environ) -> bool:
    """`jax.distributed.initialize` from MEDSEG_* variables; no-op without.

    Must run before the backend initializes (before any jax computation or
    device query).  Returns True when multi-process mode was entered.
    Idempotent: repeat calls after a successful init are no-ops."""
    global _INITIALIZED
    coord = env.get("MEDSEG_COORDINATOR")
    if not coord:
        return False
    if _INITIALIZED:
        return True
    if coord == "auto":
        # TPU-pod path: coordinator/process count/id all from the runtime's
        # own autodetection (metadata service / megascale vars)
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(env["MEDSEG_NUM_PROCESSES"]),
            process_id=int(env["MEDSEG_PROCESS_ID"]),
        )
    _INITIALIZED = True
    return True


def global_data_parallel_mesh():
    """1-D 'data' mesh over the GLOBAL device set (all processes).

    Identical to parallel.data_parallel_mesh() — jax.devices() is already
    global after initialize_from_env(); the alias exists so call sites read
    as explicitly multi-host."""
    return data_parallel_mesh()


def shard_process_local(local_batch: np.ndarray, mesh) -> jax.Array:
    """Assemble the global batch from this process's rows.

    Every process passes its own `local_batch` (global_batch /
    num_processes rows, same order contract as the loader's shuffle seed);
    the returned jax.Array has global shape
    [num_processes * local_rows, ...] sharded over the mesh's data axis,
    with no cross-host host-side transfer — each host device_puts only what
    it loaded.  Single-process this degrades to a plain sharded device_put.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)
