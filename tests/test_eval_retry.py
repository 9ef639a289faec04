"""Eval transient-failure retry (VERDICT r3 #4): a relay blip mid-zoo must
retry the (stateless) model eval once, and a persisted transport failure must
be labeled distinctly from a real model failure in the skip log."""

import time

import jax
import pytest

from medseg_tpu.eval import harness


class _Loader:
    num_samples = 4


def _stub(results):
    """evaluate_model stand-in popping scripted results/exceptions per call."""
    calls = []

    def fake_evaluate(name, loader, variables, cfg, extra, log, mesh=None):
        calls.append(name)
        r = results.pop(0)
        if isinstance(r, BaseException):
            raise r
        return r

    return fake_evaluate, calls


def test_transient_failure_retries_once_and_recovers(monkeypatch):
    monkeypatch.setattr(time, "sleep", lambda s: None)
    fake, calls = _stub([jax.errors.JaxRuntimeError("UNAVAILABLE: relay"),
                         {"accuracy": 97.0}])
    monkeypatch.setattr(harness, "evaluate_model", fake)
    monkeypatch.setattr(harness, "CLS_MODELS", ("ResNet18",))
    logs = []
    res = harness.test_all_models(_Loader(), None, log=logs.append)
    assert res == {"ResNet18": {"accuracy": 97.0}}
    assert len(calls) == 2
    assert any("transient runtime failure testing ResNet18" in l
               for l in logs)


def test_persistent_transient_failure_is_labeled(monkeypatch):
    monkeypatch.setattr(time, "sleep", lambda s: None)
    fake, calls = _stub([jax.errors.JaxRuntimeError("UNAVAILABLE: relay"),
                         jax.errors.JaxRuntimeError("UNAVAILABLE: relay")])
    monkeypatch.setattr(harness, "evaluate_model", fake)
    monkeypatch.setattr(harness, "CLS_MODELS", ("ResNet18",))
    logs = []
    res = harness.test_all_models(_Loader(), None, log=logs.append)
    assert res == {} and len(calls) == 2
    assert any("transient transport failure persisted" in l for l in logs)


def test_real_failure_does_not_retry(monkeypatch):
    fake, calls = _stub([ValueError("bad shape")])
    monkeypatch.setattr(harness, "evaluate_model", fake)
    monkeypatch.setattr(harness, "CLS_MODELS", ("ResNet18",))
    logs = []
    res = harness.test_all_models(_Loader(), None, log=logs.append)
    assert res == {} and len(calls) == 1  # no retry burned on a program bug
    assert any("Failed to test ResNet18 (error)" in l for l in logs)
    assert not any("transient" in l for l in logs)


def test_oom_is_not_transient():
    from medseg_tpu.core.errors import is_transient_runtime_error
    assert not is_transient_runtime_error(
        jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: out of memory"))
    assert is_transient_runtime_error(
        jax.errors.JaxRuntimeError("DEADLINE_EXCEEDED: relay"))
    # plain RuntimeErrors are NOT retried by eval (only bench's init path
    # broadens the match)
    assert not is_transient_runtime_error(RuntimeError("UNAVAILABLE"))


def test_require_divisible_batch_message():
    from medseg_tpu.data import BatchLoader, synthetic_cls
    from medseg_tpu.parallel import data_parallel_mesh, require_divisible_batch

    mesh = data_parallel_mesh()
    ld = BatchLoader(synthetic_cls(n=24, img_size=32), 12, shuffle=False)
    with pytest.raises(ValueError, match="multiple of 8"):
        require_divisible_batch(mesh, ld)
    require_divisible_batch(mesh, None)  # None loaders are skipped
