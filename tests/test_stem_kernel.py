"""Fused Pallas stem kernel (conv7x7/s2+BN+ReLU+maxpool) vs XLA oracle.

The kernel is the r3 answer to the r2 stage profile's "stem at 11% MFU"
finding; these tests pin its numerics (interpret mode on CPU) against the
exact XLA conv pipeline and against the full unmodified ResNet forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medseg_tpu.ops.pallas.stem_kernel import (
    fold_bn,
    pack_weights_paired,
    stem_conv_pool_pallas,
    stem_conv_pool_reference,
)


def _random_stem(rng):
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, 64), jnp.float32)
    return k, fold_bn(scale, bias, mean, var)


@pytest.mark.parametrize("size", [32, 64])
def test_stem_kernel_matches_xla_oracle(rng_np, size):
    x = jnp.asarray(rng_np.standard_normal((4, size, size, 3)), jnp.float32)
    k, (g, b) = _random_stem(rng_np)
    ref = stem_conv_pool_reference(x, k, g, b)
    w2, b2 = pack_weights_paired(k, g, b)
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(4, 3 * size, size)
    out = stem_conv_pool_pallas(planes, w2, b2, interpret=True)
    assert out.shape == (4, size // 4, size // 4, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_stem_edge_zero_padding_exact(rng_np):
    """Constant-1 input exposes any padding mismatch at all four borders."""
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    k, (g, b) = _random_stem(rng_np)
    ref = stem_conv_pool_reference(x, k, g, b)
    w2, b2 = pack_weights_paired(k, g, b)
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(2, 96, 32)
    out = stem_conv_pool_pallas(planes, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_apply_with_pallas_stem_full_model_parity(rng_np):
    """apply_with_pallas_stem == model.apply on ResNet18 (random init)."""
    from medseg_tpu.core.registry import get_model
    from medseg_tpu.models.resnet import apply_with_pallas_stem

    model = get_model("ResNet18")["factory"]()
    x = jnp.asarray(rng_np.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(0)}, x)
    ref = model.apply(variables, x)
    out = apply_with_pallas_stem(model, variables, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_apply_with_pallas_stem_planar_input(rng_np):
    """The fused-aug path feeds the warp kernel's planar layout directly."""
    from medseg_tpu.core.registry import get_model
    from medseg_tpu.models.resnet import apply_with_pallas_stem

    model = get_model("ResNet50")["factory"]()
    x = jnp.asarray(rng_np.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(0)}, x)
    ref = model.apply(variables, x)
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(2, 192, 64)
    out = apply_with_pallas_stem(model, variables, planes, planar=True,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
