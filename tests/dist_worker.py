"""Worker process for tests/test_distributed.py — NOT collected by pytest.

Runs as one of N coordinated processes: multi-process init via
parallel.dist.initialize_from_env, global 'data' mesh over all processes'
CPU devices, one REAL classification train step (the framework's
cls_train_body: ResNet-style ConvBN model, sync-BN + gradient psum ride the
sharded batch) on a deterministic per-process slice of the global batch,
then prints the post-step loss and a parameter checksum.  The parent
asserts every process prints the same values and that they match the
single-process step on the assembled global batch bit-for-bit.
"""
import os
import sys

# run as a plain script (`python tests/dist_worker.py`): sys.path[0] is
# tests/, not the repo root — put the root first so medseg_tpu imports
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from medseg_tpu.parallel import dist  # noqa: E402  (pre-backend init)

assert dist.initialize_from_env(), "MEDSEG_COORDINATOR must be set"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dist_case import GLOBAL_BATCH, build_case, run_step  # noqa: E402

mesh = dist.global_data_parallel_mesh()
proc, nproc = jax.process_index(), jax.process_count()
assert mesh.size == len(jax.devices())

images, labels, state, step = build_case(mesh)
rows = GLOBAL_BATCH // nproc
sl = slice(proc * rows, (proc + 1) * rows)
images_g = dist.shard_process_local(np.ascontiguousarray(images[sl]), mesh)
labels_g = dist.shard_process_local(np.ascontiguousarray(labels[sl]), mesh)

loss, checksum = run_step(step, state, images_g, labels_g)
print(f"DIST_RESULT {proc}/{nproc} loss={loss:.10f} checksum={checksum:.10f}",
      flush=True)
