"""Precision policy: the TPU-native equivalent of CUDA AMP.

The reference wraps forward passes in `torch.cuda.amp.autocast` with a
GradScaler (reference utils/helpers.py:285,321-336).  On TPU the idiomatic
policy is: parameters and batch-norm statistics in float32, matmul/conv
compute in bfloat16 on the MXU.  bfloat16 shares float32's exponent range, so
no loss scaling is needed — the GradScaler has no analog here by design.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32


def policy_from_name(name: str) -> Policy:
    if name in ("bfloat16", "bf16", "mixed"):
        return Policy()
    if name in ("float32", "fp32", "full"):
        return Policy(compute_dtype=jnp.float32)
    raise ValueError(f"Unknown precision policy: {name}")
