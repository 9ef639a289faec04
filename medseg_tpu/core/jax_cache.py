"""Persistent XLA compilation cache for cold-start latency.

The reference pays no compile cost (eager torch); the TPU framework's jitted
programs do, and through the axon relay that cost is front-loaded into the
first execution of each program (the relay compiles/stages on demand).  The
JAX persistent compilation cache works through the relay and removes most of
it across process restarts — measured on the headline fused aug+infer
program (ResNet18 bf16, B=384, single v5e):

    | phase               | cold (pass 1) | warm cache (pass 2) |
    |---------------------|---------------|---------------------|
    | client lower+compile|        10.4 s |               1.4 s |
    | first execution     |       490.4 s |              62.4 s |
    | 10 steady steps     |         1.8 s |               0.3 s |

This makes restarted `medseg serve` / `medseg eval` / bench processes skip
the multi-minute warmup of programs they have compiled before.  Enabled by
default for CLI and bench entry points; opt out with MEDSEG_JAX_CACHE=0 or
point MEDSEG_JAX_CACHE_DIR somewhere else.  Tests do NOT enable it (they
compile thousands of tiny CPU programs; churning a disk cache helps nothing).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

DEFAULT_DIR = "~/.cache/medseg_tpu/jax"


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Point jax's persistent compilation cache at a writable directory.

    Returns the directory in use, or None when disabled via MEDSEG_JAX_CACHE=0
    or when the directory cannot be created (best-effort: a read-only home
    must not break the CLI).  Safe to call more than once.
    """
    if os.environ.get("MEDSEG_JAX_CACHE", "1") == "0":
        return None
    cache_dir = (path or os.environ.get("MEDSEG_JAX_CACHE_DIR")
                 or os.path.expanduser(DEFAULT_DIR))
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
    except OSError:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return cache_dir
