"""Persistent-compilation-cache setup (core/jax_cache.py).

The TPU-measured cold/warm numbers live in PERF.md; these tests cover the
configuration plumbing on CPU: directory resolution, the env kill switch,
and restoration hygiene.
"""

import jax
import pytest

from medseg_tpu.core import jax_cache


@pytest.fixture
def restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_sets_config_and_creates_dir(tmp_path, restore_cache_config):
    target = tmp_path / "jaxcache"
    got = jax_cache.enable_persistent_cache(str(target))
    assert got == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)


def test_env_dir_override(tmp_path, monkeypatch, restore_cache_config):
    target = tmp_path / "from_env"
    monkeypatch.setenv("MEDSEG_JAX_CACHE_DIR", str(target))
    assert jax_cache.enable_persistent_cache() == str(target)
    assert target.is_dir()


def test_kill_switch(monkeypatch, restore_cache_config):
    monkeypatch.setenv("MEDSEG_JAX_CACHE", "0")
    prev = jax.config.jax_compilation_cache_dir
    assert jax_cache.enable_persistent_cache() is None
    assert jax.config.jax_compilation_cache_dir == prev


def test_uncreatable_dir_is_nonfatal(tmp_path, restore_cache_config):
    blocker = tmp_path / "file"
    blocker.write_text("")
    # a path under a regular file cannot be mkdir'd -> disabled, no raise
    assert jax_cache.enable_persistent_cache(str(blocker / "sub")) is None
