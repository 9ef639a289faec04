"""bench.py resilience: the driver perf artifact must survive relay outages.

BENCH_r03 died at backend init ("Unable to initialize backend 'axon':
UNAVAILABLE") with rc=1 and no JSON line — these tests pin the r4 hardening:
bounded init retry, per-section transient retry, error recording instead of
tracebacks, and the partial-results sidecar.
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _no_sleep(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "ERRORS", {})
    monkeypatch.setattr(bench, "PARTIAL", {})
    monkeypatch.setattr(bench, "DEADLINE", None)


def test_is_transient_matches_backend_init_error():
    # the exact r3 killer is a plain RuntimeError, not a JaxRuntimeError
    e = RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE: "
                     "TPU backend setup/compile error (Unavailable).")
    assert bench._is_transient(e)
    assert not bench._is_transient(ValueError("shape mismatch"))
    assert not bench._is_transient(RuntimeError("RESOURCE_EXHAUSTED: OOM"))


def test_init_retry_recovers(monkeypatch):
    import jax
    calls = {"n": 0}
    real = jax.devices

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("Unable to initialize backend 'axon': "
                               "UNAVAILABLE")
        return real()

    monkeypatch.setattr(jax, "devices", flaky)
    monkeypatch.setenv("BENCH_INIT_RETRIES", "3")
    backend, n = bench._init_backend_with_retry()
    assert backend == "cpu" and n >= 1 and calls["n"] == 2


def test_init_retry_gives_up_and_records(monkeypatch):
    import jax

    def dead():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(jax, "devices", dead)
    monkeypatch.setenv("BENCH_INIT_RETRIES", "2")
    backend, n = bench._init_backend_with_retry()
    assert backend is None and n == 0
    assert "backend_init" in bench.ERRORS


def test_init_nontransient_fails_fast(monkeypatch):
    import jax
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise RuntimeError("INVALID_ARGUMENT: bad plugin")

    monkeypatch.setattr(jax, "devices", broken)
    monkeypatch.setenv("BENCH_INIT_RETRIES", "5")
    backend, _ = bench._init_backend_with_retry()
    assert backend is None and calls["n"] == 1  # no retries burned


def test_section_retries_transient_once():
    state = {"n": 0}

    def flaky(x):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("remote_compile: response body closed")
        return x * 2

    assert bench._section("s", flaky, 21) == 42
    assert state["n"] == 2 and bench.ERRORS == {}


def test_section_records_failure_and_continues():
    def boom(_):
        raise ValueError("tracing bug")

    assert bench._section("boom", boom, 1) is None
    assert "tracing bug" in bench.ERRORS["boom"]


def test_partial_checkpoint_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    bench.PARTIAL["infer"] = 123.4
    bench.ERRORS["zoo_CLIP"] = "UNAVAILABLE"
    bench._checkpoint_partial()
    data = json.loads((tmp_path / "bench_partial.json").read_text())
    assert data["infer"] == 123.4
    assert data["errors"]["zoo_CLIP"] == "UNAVAILABLE"


def test_zoo_fast_names_cover_every_family():
    fams = {"ResNet18": "resnet", "ResNet50": "resnet", "VGG16": "vgg",
            "VGG19": "vgg", "ResNetUnet": "unet", "AttentionUNet": "unet",
            "R2Unet": "r2", "R2AttUnet": "r2", "CLIP": "clip",
            "CLIPSeg": "clipseg"}
    assert {fams[n] for n in bench.ZOO_FAST_NAMES} == set(fams.values())
    assert set(bench.ZOO_FAST_NAMES) <= {z[0] for z in bench.ZOO}


def test_init_retry_survives_hung_probe(monkeypatch):
    """r4 outage finding: backend init can HANG (25+ min blocked in the
    relay RPC, 2s CPU), not just raise — the retry loop must regain control.
    core.errors probes in a killable subprocess; a hang counts as a
    transient attempt."""
    from medseg_tpu.core import errors

    state = {"n": 0}

    def probe():
        state["n"] += 1
        if state["n"] == 1:
            return False, "backend init hung >240s (probe killed)"
        return True, ""

    backend, n = errors.init_backend_with_retry(attempts=3, log=None,
                                                probe=probe)
    assert backend == "cpu" and n >= 1 and state["n"] == 2


def test_init_retry_hung_probe_exhausts(monkeypatch):
    from medseg_tpu.core import errors

    monkeypatch.setattr(errors, "probe_backend", None)  # must not be hit
    with pytest.raises(RuntimeError, match="hung"):
        errors.init_backend_with_retry(
            attempts=2, sleeps=(0,), log=None,
            probe=lambda: (False, "backend init hung >240s (probe killed)"))


def test_wants_tpu_parses_platform_list(monkeypatch):
    """register() sets jax.config jax_platforms="axon,cpu" (stomping the env
    var); a substring test for "cpu" misread that as CPU-only and skipped the
    hang-proof probe — the bug that let init hang unprobed for 25 min in the
    r4 relay outage."""
    import jax

    from medseg_tpu.core import errors

    def with_config(val):
        monkeypatch.setattr(type(jax.config), "jax_platforms",
                            property(lambda self: val), raising=False)
        return errors._wants_tpu()

    assert with_config("axon,cpu") is True
    assert with_config("cpu") is False
    assert with_config("cpu,cpu") is False
    assert with_config("tpu") is True


def test_force_cpu_if_requested(monkeypatch):
    """JAX_PLATFORMS=cpu in the env must win over register()'s config stomp
    for CPU-capable entry points (CLI); non-CPU or unset env is untouched."""
    import jax

    from medseg_tpu.core import errors

    updates = []
    monkeypatch.setattr(jax.config, "update",
                        lambda k, v: updates.append((k, v)))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert errors.force_cpu_if_requested() is True
    assert updates == [("jax_platforms", "cpu")]

    updates.clear()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert errors.force_cpu_if_requested() is False
    monkeypatch.delenv("JAX_PLATFORMS")
    assert errors.force_cpu_if_requested() is False
    assert updates == []


def test_probe_skipped_on_cpu_platform():
    """Under the test suite's forced-CPU config the default probe is a no-op
    (CPU init cannot hang; in-process monkeypatches must keep working)."""
    from medseg_tpu.core import errors

    assert not errors._wants_tpu()
    backend, n = errors.init_backend_with_retry(attempts=1, log=None)
    assert backend == "cpu" and n >= 1


def test_init_retry_attempts_zero_means_once():
    """MEDSEG_INIT_RETRIES=0 must try once, not die on an 'unreachable'
    assertion (review r4 finding)."""
    from medseg_tpu.core import errors

    backend, n = errors.init_backend_with_retry(attempts=0, log=None)
    assert backend == "cpu" and n >= 1


def test_cli_bench_skips_eager_backend_init(monkeypatch):
    """`medseg bench` must NOT init the backend in cli.main(): bench.py pins
    its own platform (BENCH_SMALL=1 forces CPU after main() runs — an
    already-initialized backend would ignore it) and has its own retry."""
    import runpy

    from medseg_tpu.apps import cli
    from medseg_tpu.core import errors

    def boom(*a, **k):
        raise AssertionError("cli.main initialized the backend for bench")

    monkeypatch.setattr(errors, "init_backend_with_retry", boom)
    ran = {}
    monkeypatch.setattr(runpy, "run_path",
                        lambda path, run_name=None: ran.setdefault(
                            "path", path))
    cli.main(["bench"])
    assert ran["path"].endswith("bench.py")


def test_watchdog_emits_partial_json_and_disarms(monkeypatch, capsys):
    """If a section hangs in the relay RPC, the watchdog must print a
    parseable headline JSON from the partial results (incl. the r4
    dispatched-continuity numbers); a normal finish disarms it."""
    import os

    exited = {}
    monkeypatch.setattr(os, "_exit", lambda rc: exited.setdefault("rc", rc))
    monkeypatch.setattr(bench, "DISPATCHED", {"e2e": 99.0})

    bench.PARTIAL["infer"] = 111.0
    bench.PARTIAL["train"] = 55.0
    done = bench._arm_watchdog(100.0)
    done.fire("simulated hang")  # what the watch thread calls on stall
    out = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(out)
    assert data["value"] == 111.0 and data["train"] == 55.0
    assert data["dispatched"] == {"e2e": 99.0}
    assert "watchdog" in data["errors"] and exited["rc"] == 1

    # disarmed: firing after done.set() prints nothing
    done.set()
    done.fire("late")
    assert capsys.readouterr().out == ""


def test_watchdog_is_progress_aware(monkeypatch):
    """Past the budget the watchdog holds fire while heartbeats arrive
    (healthy cold-cache runs keep compiling) and trips only after 900s of
    silence — or unconditionally at the absolute hard cap."""
    import time as _time

    t0 = _time.monotonic()
    done = bench._arm_watchdog(100.0)  # hard cap = max(200, 3700) = 3700
    try:
        # inside budget+grace: never fires, stalled or not
        bench.LAST_PROGRESS[0] = t0 - 5000.0
        assert done.check(t0 + 600.0) is None
        # past budget+grace but recent heartbeat: keep waiting
        bench._mark_progress()
        assert done.check(t0 + 800.0) is None
        # past budget+grace and stalled >900s: fire
        bench.LAST_PROGRESS[0] = t0 - 200.0
        assert "no progress" in done.check(t0 + 800.0)
        # hard cap is ALSO stall-gated (never kill an advancing run
        # mid-TPU-flight: the claim-wedge rule), 300s threshold
        bench.LAST_PROGRESS[0] = t0 + 3600.0  # heartbeat 101s before check
        assert done.check(t0 + 3701.0) is None
        bench.LAST_PROGRESS[0] = t0 + 3300.0  # stalled 401s at t0+3701
        assert "hard cap" in done.check(t0 + 3701.0)
        # unconditional extreme cap 2h past the hard cap: fires even with
        # a fresh heartbeat
        bench.LAST_PROGRESS[0] = t0 + 3700.0 + 7200.0
        assert "extreme cap" in done.check(t0 + 3700.0 + 7201.0)
    finally:
        done.set()
        bench._mark_progress()
