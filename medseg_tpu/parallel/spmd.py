"""Explicit-collective SPMD training step (shard_map + psum).

The default path lets XLA insert the gradient all-reduce from sharding
annotations (train/steps.py under jit over a sharded batch).  This module is
the explicit formulation of the same program — per-shard gradients are
averaged with `jax.lax.psum` over the 'data' mesh axis inside `shard_map` —
for cases where hand-placed collectives are preferred (custom overlap,
debugging, or porting to pipelining later).  Both paths are numerically
verified against each other in tests/test_spmd.py.

Note on BatchNorm: the explicit step also psum-averages the per-shard batch
statistics, reproducing the global-batch (sync) BN the automatic path gets
for free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from medseg_tpu.train import losses
from medseg_tpu.train.steps import TrainState


def make_cls_train_step_explicit(model, optimizer, mesh: Mesh,
                                 label_smoothing: float = 0.1):
    """shard_map train step: batch sharded on 'data', state replicated.

    Returns jitted (state, images, labels, rng) -> (state, loss, correct)
    with gradients / loss / batch stats explicitly psum-reduced over ICI.
    """

    def shard_step(state: TrainState, images, labels, rng):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            loss = losses.cross_entropy(out, labels, label_smoothing)
            return loss, (out, mutated.get("batch_stats", {}))

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # Explicit data-parallel collectives over the ICI mesh axis:
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        # Sync BN: average the per-shard running statistics (each shard
        # computed batch stats over its local slice).
        new_stats = jax.lax.pmean(new_stats, "data")
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        correct = jax.lax.psum(
            (jnp.argmax(out, axis=-1) == labels).sum(), "data")
        state = state.replace(params=params, batch_stats=new_stats,
                              opt_state=new_opt, step=state.step + 1)
        return state, loss, correct

    mapped = shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))
