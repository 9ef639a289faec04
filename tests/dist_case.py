"""Shared fixture for the cross-host (DCN) certification test: one small
classification model + deterministic batch + the framework's REAL train
step, identical in the multi-process workers (tests/dist_worker.py) and the
single-process oracle (tests/test_distributed.py).  Not collected by pytest.
"""
import jax
import jax.numpy as jnp
import numpy as np

from medseg_tpu.train import steps as S

GLOBAL_BATCH = 8
IMG = 16


def build_case(mesh):
    """(images, labels, sharded TrainState, jitted step) — deterministic."""
    import flax.linen as nn

    from medseg_tpu.nn.blocks import ConvBN

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = ConvBN(8, kernel=3, stride=2)(x, train)
            x = x.mean(axis=(1, 2))
            return nn.Dense(3)(x)

    model = TinyNet()
    rng = np.random.default_rng(0)
    images = rng.standard_normal((GLOBAL_BATCH, IMG, IMG, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (GLOBAL_BATCH,)).astype(np.int32)

    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, IMG, IMG, 3), jnp.float32))
    from medseg_tpu.train.freeze import all_trainable

    optimizer = S.build_optimizer(1e-2, 1e-4, 1.0,
                                  all_trainable(variables["params"]))
    state = S.init_state(model, variables, optimizer)
    if mesh is not None:
        from medseg_tpu.parallel.sharding import replicated

        state = jax.device_put(state, replicated(mesh))
    step = jax.jit(S.cls_train_body(model, optimizer))
    return images, labels, state, step


def run_step(step, state, images, labels):
    """One train step; returns (loss, post-step parameter checksum)."""
    state, loss, _ = step(state, images, labels, jax.random.key(7))
    checksum = sum(jnp.sum(jnp.abs(l.astype(jnp.float64)))
                   for l in jax.tree_util.tree_leaves(state.params))
    return float(loss), float(checksum)
