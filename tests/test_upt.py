"""ConvT2x2AsDot (models/resnet_unet.py) vs nn.ConvTranspose(k=2, s=2):
identical parameter tree and exact math.  A stride-2 2x2 transposed conv
writes each output pixel from exactly ONE input pixel, so it is a channel
contraction [Ci -> 4*Co] followed by depth-to-space; the tap mapping is
out[2i+dy, 2j+dx] = x[i,j] @ W[1-dy, 1-dx] + b (flax/XLA SAME-padding
convention — THE pin this file provides).  These tests make the lowering
safe to A/B on hardware across ResNetUnet's five k=2/s=2 deconvs
(reference models/segmentation_models/ResnetUnet.py:19,63)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from medseg_tpu.models.resnet_unet import ConvT2x2AsDot, ResNetUnet


def _paths(tree):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(7)
    plain = nn.ConvTranspose(6, (2, 2), strides=(2, 2))
    dot = ConvT2x2AsDot(6)
    x = jnp.asarray(rng.standard_normal((2, 5, 9, 10)), jnp.float32)
    variables = plain.init(jax.random.key(0), x)
    # non-zero bias so the bias tap mapping is exercised too
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.1 if a.ndim == 1 else a, variables)
    return plain, dot, variables, x


def test_param_tree_identical(pair):
    plain, dot, variables, x = pair
    vs = dot.init(jax.random.key(0), x)
    assert _paths(vs) == _paths(variables)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(vs)[0],
            jax.tree_util.tree_flatten_with_path(variables)[0]):
        assert p1 == p2 and a.shape == b.shape and a.dtype == b.dtype


def test_output_matches(pair):
    plain, dot, variables, x = pair
    out_p = plain.apply(variables, x)
    out_d = dot.apply(variables, x)
    assert out_d.shape == out_p.shape == (2, 10, 18, 6)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_p),
                               rtol=0, atol=2e-6)


def test_tap_mapping_is_flipped(pair):
    """Pin the spatial-flip convention with a delta input: the output 2x2
    cell at (2i+dy, 2j+dx) must be W[1-dy, 1-dx]."""
    plain, dot, variables, x = pair
    delta = jnp.zeros((1, 4, 4, 10)).at[0, 1, 2].set(
        jnp.ones(10, jnp.float32))
    w = variables["params"]["kernel"]  # [2,2,10,6]
    bias = variables["params"]["bias"]
    for mod in (plain, dot):
        out = np.asarray(mod.apply(variables, delta))
        for dy in range(2):
            for dx in range(2):
                np.testing.assert_allclose(
                    out[0, 2 + dy, 4 + dx],
                    np.asarray(w[1 - dy, 1 - dx].sum(0) + bias),
                    rtol=0, atol=2e-6, err_msg=f"dy={dy} dx={dx} {mod}")


def test_gradients_match(pair):
    plain, dot, variables, x = pair

    def loss(module, params):
        out = module.apply({"params": params}, x)
        return (out ** 2).mean()

    g_p = jax.grad(lambda p: loss(plain, p))(variables["params"])
    g_d = jax.grad(lambda p: loss(dot, p))(variables["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_d)[0],
            jax.tree_util.tree_flatten_with_path(g_p)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-6, err_msg=str(pa))


def test_resnet_unet_up_as_dot_equivalent():
    """up_as_dot=True swaps all five deconvs for the contraction lowering
    with the SAME variables; model outputs must match the plain graph."""
    plain = ResNetUnet(dtype=jnp.float32)
    dot = ResNetUnet(dtype=jnp.float32, up_as_dot=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    variables = plain.init(jax.random.key(0), x)
    out_p = plain.apply(variables, x, train=False)
    out_d = dot.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_p),
                               rtol=0, atol=1e-4)
