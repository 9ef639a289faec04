"""Fused-statistics AttentionGate vs the unfused reference lowering.

The fused path (nn/blocks._FusedConvBN1x1) folds the gate's W_g/W_x
BatchNorms into the pointwise convs and computes the train-mode batch
statistics ALGEBRAICALLY from the inputs' channel mean/Gram instead of
materializing the full-resolution conv outputs (reference gate math:
models/segmentation_models/AttentionUNet.py:29-54).  The r4 hardware A/B
measured it SLOWER at the full-step level, so it ships default-OFF
(PERF.md post-mortem); these tests pin the contract that keeps the
opt-in lowering safe:

- identical variable tree (checkpoints/converters untouched),
- identical eval-mode outputs (exact fold, no stats involved),
- train-mode outputs, running-stat updates and gradients equal to the
  unfused lowering to f32 reduction-order tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg_tpu.nn.blocks import AttentionGate


def _tree_paths(tree):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.fixture(scope="module")
def gate_pair():
    fused = AttentionGate(f_int=8, fused_stats=True)
    plain = AttentionGate(f_int=8, fused_stats=False)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    variables = plain.init(jax.random.key(0), g, x)
    return fused, plain, variables, g, x


def test_variable_tree_identical(gate_pair):
    fused, plain, variables, g, x = gate_pair
    vf = fused.init(jax.random.key(0), g, x)
    assert _tree_paths(vf) == _tree_paths(variables)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(vf)[0],
            jax.tree_util.tree_flatten_with_path(variables)[0]):
        assert p1 == p2 and a.shape == b.shape and a.dtype == b.dtype


def test_eval_mode_exact(gate_pair):
    fused, plain, variables, g, x = gate_pair
    out_f = fused.apply(variables, g, x, train=False)
    out_p = plain.apply(variables, g, x, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=0, atol=2e-6)


def test_train_mode_outputs_and_stats(gate_pair):
    fused, plain, variables, g, x = gate_pair
    out_f, mut_f = fused.apply(variables, g, x, train=True,
                               mutable=["batch_stats"])
    out_p, mut_p = plain.apply(variables, g, x, train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=0, atol=1e-5)
    for pf, pp in zip(jax.tree_util.tree_leaves(mut_f),
                      jax.tree_util.tree_leaves(mut_p)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pp),
                                   rtol=1e-5, atol=1e-6)


def test_train_mode_gradients(gate_pair):
    fused, plain, variables, g, x = gate_pair

    def loss(mod, params):
        out, _ = mod.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           g, x, train=True, mutable=["batch_stats"])
        return (out.astype(jnp.float32) ** 2).mean()

    gf = jax.grad(lambda p: loss(fused, p))(variables["params"])
    gp = jax.grad(lambda p: loss(plain, p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_unfused_option_still_available():
    """fused_stats=False is the default lowering after the r4 full-step
    A/B (PERF.md records the measurement)."""
    gate = AttentionGate(f_int=4, fused_stats=False)
    g = jnp.zeros((1, 4, 4, 8))
    v = gate.init(jax.random.key(1), g, g)
    out = gate.apply(v, g, g, train=False)
    assert out.shape == (1, 4, 4, 8)


def test_fused_gate_stats_sync_under_mesh():
    """The algebraic channel mean/Gram must reduce over the GLOBAL batch
    when the input is sharded across a data-parallel mesh (the fused twin
    of flax BN's free cross-replica sync; jit inserts the collectives).
    Sharded train-mode output must equal the single-device one."""
    from medseg_tpu.parallel import (batch_sharding, data_parallel_mesh,
                                     replicated)

    mesh = data_parallel_mesh()
    gate = AttentionGate(f_int=8, fused_stats=True)
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.standard_normal((8, 4, 4, 16)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 4, 4, 16)), jnp.float32)
    variables = gate.init(jax.random.key(0), g, x)

    @jax.jit
    def train_out(v, g, x):
        out, mut = gate.apply(v, g, x, train=True, mutable=["batch_stats"])
        return out, mut

    ref, mut_ref = train_out(variables, g, x)
    vs = jax.device_put(variables, replicated(mesh))
    gs = jax.device_put(g, batch_sharding(mesh))
    xs = jax.device_put(x, batch_sharding(mesh))
    out, mut = train_out(vs, gs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut),
                    jax.tree_util.tree_leaves(mut_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)
