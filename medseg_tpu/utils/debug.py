"""Numerics debugging (SURVEY.md §5 race-detection/sanitizer analog).

The reference has no sanitizers; the JAX-native equivalents are:
- `nan_check_mode()`: enable jax_debug_nans so any NaN-producing op raises
  with location (the 'sanitizer' for numerics)
- `assert_finite(tree)`: host-side finite check over a pytree, usable after
  a step when debug mode is too slow
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


@contextlib.contextmanager
def nan_check_mode():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "tree"):
    bad = []

    def check(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")
