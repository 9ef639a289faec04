"""Transient-failure classification for the tunneled TPU runtime.

Failure signatures of the demand-driven relay/transport layer observed on
real hardware (e.g. "INTERNAL: .../remote_compile: read body: response body
closed before all bytes were read" killed a run at the stage-2 first
compile).  These are retryable: nothing about the program or data is wrong.
Deliberately NOT matched: RESOURCE_EXHAUSTED (a real OOM re-fails forever)
and anything that is not a runtime error (tracing/shape bugs).

Shared by training auto-restart (train/trainer.py), eval retry
(eval/harness.py) and the bench harness — the reference has no analogue
(a torch crash just loses the run); this is the failure-detection subsystem
of SURVEY.md §5.
"""

from __future__ import annotations

import jax

TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection reset",
    "Socket closed",
)


def is_transient_runtime_error(e: BaseException) -> bool:
    """True for runtime failures of the transport/relay layer worth a retry."""
    if not isinstance(e, jax.errors.JaxRuntimeError):
        return False
    msg = str(e)
    return any(marker in msg for marker in TRANSIENT_MARKERS)


def is_transient_error(e: BaseException) -> bool:
    """Broader match that also covers the plain RuntimeError jax.xla_bridge
    raises when backend init itself fails ("Unable to initialize backend
    'axon': UNAVAILABLE ..." — the exact BENCH_r03 killer)."""
    if is_transient_runtime_error(e):
        return True
    return isinstance(e, (RuntimeError, OSError)) and any(
        m in str(e) for m in TRANSIENT_MARKERS)


def _platform_tokens(platforms) -> list:
    return [t.strip() for t in (platforms or "").split(",") if t.strip()]


def _wants_tpu() -> bool:
    """True when this process will init the axon/TPU backend (as opposed to
    an explicit CPU-only selection via jax.config or JAX_PLATFORMS).

    Must parse the platform LIST: the axon sitecustomize's register() sets
    jax.config jax_platforms to "axon,cpu" (overriding the env var), and a
    substring test for "cpu" would misread that as CPU-only — the exact bug
    that let a backend-init hang run unprobed for 25 min in the r4 outage."""
    import os

    configured = getattr(jax.config, "jax_platforms", None)
    if configured is None:
        configured = os.environ.get("JAX_PLATFORMS")
    toks = _platform_tokens(configured) or ["tpu"]
    return any(t != "cpu" for t in toks)


def force_cpu_if_requested() -> bool:
    """Re-assert a CPU-only JAX_PLATFORMS env selection into jax.config.

    The axon sitecustomize's register() runs at interpreter startup and sets
    jax.config jax_platforms="axon,cpu" regardless of the env var, so
    `JAX_PLATFORMS=cpu medseg eval` would still dial the relay first (and
    hang with it down — observed live in r4).  Called by CPU-capable entry
    points before any backend init; returns True when CPU was forced."""
    import os

    toks = _platform_tokens(os.environ.get("JAX_PLATFORMS"))
    if toks and all(t == "cpu" for t in toks):
        jax.config.update("jax_platforms", "cpu")
        return True
    return False


def probe_backend(timeout_s: float = 240.0):
    """Attempt backend init in a THROWAWAY subprocess with a hard timeout;
    returns (ok, error_headline).

    Needed because in-process init cannot be timed out (the relay RPC blocks
    inside C++), and the r4 outage showed init HANGING 25+ minutes rather
    than failing — a retry loop around the blocking call never gets control
    back.  Killing a hung PROBE child is safe: a process stuck in init holds
    no TPU claim yet (the documented wedge risk is killing mid-execution)."""
    import subprocess
    import sys

    code = "import jax; jax.devices(); print('medseg-probe-ok')"
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False, f"backend init hung >{timeout_s:.0f}s (probe killed)"
    if r.returncode == 0 and "medseg-probe-ok" in r.stdout:
        return True, ""
    tail = [ln for ln in (r.stderr or "").splitlines() if ln.strip()]
    return False, (tail[-1] if tail else f"probe exited rc={r.returncode}")


def init_backend_with_retry(attempts: int = 5,
                            sleeps=(60, 180, 240, 240),
                            log=None, probe=None, probe_timeout: float = 240.0):
    """Bounded retry around JAX backend init; returns (backend, n_devices).

    Each attempt first PROBES the backend in a killable subprocess (see
    probe_backend — in-process init can hang unboundedly, not just fail) and
    only then inits in-process.  jax.xla_bridge.backends() does not cache
    failures (_backends stays empty when the plugin factory raises), so the
    in-process call genuinely re-attempts.  The known fail-fast mode is the
    relay's device-claim wedge, which clears in ~10 min; the default schedule
    (5 attempts, sleeps 60/180/240/240s ≈ 12 min of backoff, plus up to
    probe_timeout per hung attempt) covers it.  Non-transient errors re-raise
    immediately; after the last attempt the error re-raises.

    probe: injectable () -> (ok, msg) for tests; default probes a subprocess
    on the TPU path and is a no-op under an explicit CPU platform (CPU init
    cannot hang, and test suites monkeypatch jax.devices in-process)."""
    import time

    attempts = max(1, attempts)  # env-var 0/negative still means "try once"
    if probe is None:
        if _wants_tpu():
            probe = lambda: probe_backend(probe_timeout)  # noqa: E731
        else:
            probe = lambda: (True, "")  # noqa: E731

    for i in range(attempts):
        ok, msg = probe()
        err = RuntimeError(f"backend probe failed: {msg}") if not ok else None
        if err is None:
            try:
                return jax.default_backend(), len(jax.devices())
            except Exception as e:  # plain RuntimeError from xla_bridge
                err = e
        hung = "hung >" in str(err)
        if i + 1 >= attempts or not (hung or is_transient_error(err)):
            raise err
        headline = str(err).splitlines()[0] if str(err) else repr(err)
        wait = sleeps[min(i, len(sleeps) - 1)]
        if log is not None:
            log(f"[backend] init attempt {i + 1}/{attempts} failed "
                f"({headline}); retrying in {wait}s")
        time.sleep(wait)
    raise AssertionError("unreachable")
