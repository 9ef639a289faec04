"""Test env: force CPU with 8 virtual devices so sharding logic is exercised
without TPU hardware (the TPU-ecosystem 'fake backend', SURVEY.md §4).

Note: the machine's sitecustomize imports jax at interpreter startup and the
shell presets JAX_PLATFORMS=axon (remote TPU tunnel), so plain env-var edits
here are too late — we must go through jax.config, which is honored until the
first backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# zero-egress build: make HF from_pretrained fail fast instead of hanging
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend()
)
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
