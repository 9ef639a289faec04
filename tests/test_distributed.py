"""Cross-host (DCN) scaling certification on the CPU fake backend.

SURVEY.md §2.4 lists cross-host scaling as the optional third tier (the
reference is strictly single-GPU, utils/trainer.py:41).  parallel/dist.py
implements it; this test certifies the full path without TPU pods: TWO
coordinated OS processes (jax.distributed over a localhost coordinator,
gloo CPU collectives, 2 devices each) build the 4-device global 'data'
mesh, each feeds only its own rows through
jax.make_array_from_process_local_data, and the framework's real
classification train step (gradient psum + sync-BN riding the sharded
batch) produces — in every process — the loss and post-step parameters of
the single-process step on the assembled global batch (bit-identical
across workers; float32-reduction-order-tight vs the single-process
topology).
"""
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_step_matches_single_process():
    port = _free_port()
    env_common = {
        "MEDSEG_COORDINATOR": f"127.0.0.1:{port}",
        "MEDSEG_NUM_PROCESSES": "2",
    }
    procs = []
    for pid in range(2):
        import os

        env = dict(os.environ, **env_common, MEDSEG_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "dist_worker.py")],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))

    results = {}
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        m = re.search(r"DIST_RESULT (\d)/2 loss=([-\d.]+) checksum=([-\d.]+)",
                      out)
        assert m, f"worker {pid} printed no result:\n{out}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))

    assert set(results) == {0, 1}
    # both processes computed the identical global step
    assert results[0] == results[1]

    # single-process oracle on the assembled global batch (run in a
    # subprocess so this pytest process's JAX config/backend stays
    # untouched).  Workers are bit-identical to EACH OTHER (same global
    # program); vs the single-process topology the gradient psum reduces in
    # a different order, so the contract is float32-tight, not bit-exact
    # (measured ~1e-7 relative).
    oracle = subprocess.run(
        [sys.executable, "-c", """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
import sys
sys.path.insert(0, "tests")
from medseg_tpu.parallel.sharding import data_parallel_mesh, shard_batch
from dist_case import build_case, run_step
mesh = data_parallel_mesh()
images, labels, state, step = build_case(mesh)
loss, checksum = run_step(step, state,
                          shard_batch(images, mesh), shard_batch(labels, mesh))
print(f"ORACLE loss={loss:.10f} checksum={checksum:.10f}")
"""],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert oracle.returncode == 0, oracle.stdout + oracle.stderr
    m = re.search(r"ORACLE loss=([-\d.]+) checksum=([-\d.]+)", oracle.stdout)
    assert m, oracle.stdout
    loss1, sum1 = float(m.group(1)), float(m.group(2))
    loss2, sum2 = results[0]
    assert abs(loss1 - loss2) <= 1e-5 * max(1.0, abs(loss1))
    assert abs(sum1 - sum2) <= 1e-4 * max(1.0, abs(sum1))


def test_initialize_noop_without_env():
    from medseg_tpu.parallel import dist

    assert dist.initialize_from_env(env={}) is False
