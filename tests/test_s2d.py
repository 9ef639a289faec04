"""Space-to-depth block twins (nn/s2d.py) vs the plain full-resolution
blocks: identical parameter trees (checkpoints/converters untouched),
identical eval outputs, train-mode outputs / running-stat updates /
gradients equal to reduction-order tolerance.  These pins make the s2d
variants safe to A/B on hardware (PERF.md r3 item: 256px C=64 blocks at
17-44% MFU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg_tpu.nn.blocks import DoubleConv, UpConv
from medseg_tpu.nn.s2d import (DoubleConvS2D, UpConvS2D, depth_to_space,
                               space_to_depth)


def _paths(tree):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 6, 5)),
                    jnp.float32)
    s = space_to_depth(x)
    assert s.shape == (2, 4, 3, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(s)),
                                  np.asarray(x))
    # channel layout: sub-position-major — block (dy,dx) of pixel (i,j)
    np.testing.assert_array_equal(np.asarray(s[0, 1, 1, 5:10]),
                                  np.asarray(x[0, 2, 3]))  # (dy=0,dx=1)


@pytest.fixture(scope="module", params=["up", "double"])
def pair(request):
    rng = np.random.default_rng(3)
    if request.param == "up":
        plain, s2d = UpConv(12), UpConvS2D(12)
        x = jnp.asarray(rng.standard_normal((2, 6, 8, 10)), jnp.float32)
    else:
        plain, s2d = DoubleConv(12), DoubleConvS2D(12)
        x = jnp.asarray(rng.standard_normal((2, 12, 16, 3)), jnp.float32)
    variables = plain.init(jax.random.key(0), x)
    return plain, s2d, variables, x


def test_param_tree_identical(pair):
    plain, s2d, variables, x = pair
    vs = s2d.init(jax.random.key(0), x)
    assert _paths(vs) == _paths(variables)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(vs)[0],
            jax.tree_util.tree_flatten_with_path(variables)[0]):
        assert p1 == p2 and a.shape == b.shape and a.dtype == b.dtype


def test_eval_mode_matches(pair):
    plain, s2d, variables, x = pair
    out_p = plain.apply(variables, x, train=False)
    out_s = s2d.apply(variables, x, train=False)
    assert out_s.shape == out_p.shape
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p),
                               rtol=0, atol=3e-5)


def test_train_mode_outputs_and_stats(pair):
    plain, s2d, variables, x = pair
    out_p, mut_p = plain.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    out_s, mut_s = s2d.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p),
                               rtol=0, atol=5e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(mut_s)[0],
            jax.tree_util.tree_flatten_with_path(mut_p)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5, err_msg=str(pa))


def test_gradients_match(pair):
    plain, s2d, variables, x = pair

    def loss(module, params):
        out, _ = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return (out.astype(jnp.float32) ** 2).mean()

    g_p = jax.grad(lambda p: loss(plain, p))(variables["params"])
    g_s = jax.grad(lambda p: loss(s2d, p))(variables["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_s)[0],
            jax.tree_util.tree_flatten_with_path(g_p)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=3e-5, err_msg=str(pa))


def test_keep_s2d_layout(pair):
    plain, s2d, variables, x = pair
    full = s2d.apply(variables, x, train=False)
    kept = s2d.apply(variables, x, train=False, keep_s2d=True)
    np.testing.assert_allclose(np.asarray(depth_to_space(kept)),
                               np.asarray(full), rtol=0, atol=0)


@pytest.mark.parametrize("name,kw", [
    ("AttentionUNet", {}),
    ("R2Unet", {"t": 2}),
    ("R2AttUnet", {"t": 2}),
])
def test_model_s2d_up_flag_equivalent(name, kw):
    """s2d_up=True swaps every decoder UpConv for UpConvS2D with the same
    variables; model outputs must match the plain lowering."""
    from medseg_tpu.core.registry import get_model

    factory = get_model(name)["factory"]
    plain = factory(dtype=jnp.float32, **kw)
    s2d = factory(dtype=jnp.float32, s2d_up=True, **kw)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    variables = plain.init(jax.random.key(0), x)
    out_p = plain.apply(variables, x, train=False)
    out_s = s2d.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p),
                               rtol=0, atol=1e-4)
