"""Explicit shard_map+psum train step vs automatic-sharding train step.

Exact equality is checked on a BatchNorm-free model (per-shard BN statistics
legitimately differ from global-batch BN, so CNNs can't be compared
bit-for-bit; the explicit step pmean-syncs running stats, which matches the
running-average update but not the in-batch normalization).  A ResNet18
smoke run covers the CNN path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from medseg_tpu.core.registry import get_model
from medseg_tpu.parallel import batch_sharding, data_parallel_mesh, replicated
from medseg_tpu.parallel.spmd import make_cls_train_step_explicit
from medseg_tpu.train import steps as S
from medseg_tpu.train.freeze import all_trainable


class TinyMLP(nn.Module):
    """BN-free stand-in with the zoo's (x, train) call signature."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(32)(x))
        return nn.Dense(3)(x)


def test_explicit_collectives_match_auto_sharding_exactly():
    mesh = data_parallel_mesh()
    model = TinyMLP()
    variables = {"params": model.init(jax.random.key(0),
                                      jnp.zeros((1, 8, 8, 3)))["params"]}
    opt = S.build_optimizer(1e-2, 1e-4, 1.0, all_trainable(variables["params"]))

    B = 16
    images = np.random.default_rng(0).standard_normal(
        (B, 8, 8, 3)).astype(np.float32)
    labels = np.random.default_rng(1).integers(0, 3, B).astype(np.int32)
    xs = jax.device_put(images, batch_sharding(mesh))
    ys = jax.device_put(labels, batch_sharding(mesh))
    key = jax.random.key(42)

    # deep-copy FIRST: each step donates its state, and the two states would
    # otherwise alias the same initial buffers
    variables2 = jax.tree.map(lambda a: jnp.array(a, copy=True), variables)

    state_a = jax.device_put(S.init_state(model, variables, opt),
                             replicated(mesh))
    state_a, loss_a, corr_a = S.make_cls_train_step(model, opt)(
        state_a, xs, ys, key)

    state_e = jax.device_put(S.init_state(model, variables2, opt),
                             replicated(mesh))
    state_e, loss_e, corr_e = make_cls_train_step_explicit(model, opt, mesh)(
        state_e, xs, ys, key)

    assert int(corr_a) == int(corr_e)
    assert float(loss_a) == pytest.approx(float(loss_e), rel=1e-6)
    for a, e in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_e.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-6)


def test_explicit_step_runs_resnet_on_mesh():
    mesh = data_parallel_mesh()
    model = get_model("ResNet18")["factory"](dropout=0.0)
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, 32, 32, 3), jnp.float32))
    opt = S.build_optimizer(1e-3, 5e-4, 1.0, all_trainable(variables["params"]))
    state = jax.device_put(S.init_state(model, variables, opt),
                           replicated(mesh))
    step = make_cls_train_step_explicit(model, opt, mesh)
    B = 16
    xs = jax.device_put(np.zeros((B, 32, 32, 3), np.float32),
                        batch_sharding(mesh))
    ys = jax.device_put(np.zeros((B,), np.int32), batch_sharding(mesh))
    state, loss, corr = step(state, xs, ys, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert 0 <= int(corr) <= B
