"""Jit-compiled train/eval steps and the optimizer stack.

One compiled program per (model, stage): the two-stage classification recipe
(reference utils/helpers.py:258-311) is two jitted phases with different
optimizer masks, not Python mutation mid-step.  The learning rate lives in
the optimizer state (optax.inject_hyperparams), so the host-side schedulers
adjust it per epoch without recompilation.  Gradient clipping (global norm
1.0, helpers.py:332-333) applies to trainable leaves only, matching torch's
grad=None skipping.  Train state is donated, so parameters update in place
on device.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from medseg_tpu.train import losses


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def build_optimizer(lr: float, weight_decay: float, clip_norm: float,
                    trainable_mask) -> optax.GradientTransformation:
    inner = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay),
    )
    # optax.masked passes masked-out leaves through UNTOUCHED (they are not
    # zeroed), so frozen updates must be explicitly zeroed first — this also
    # keeps frozen grads out of the global-norm clip, matching torch's
    # grad=None skipping.
    frozen_mask = jax.tree.map(lambda t: not t, trainable_mask)
    return optax.chain(
        optax.masked(optax.set_to_zero(), frozen_mask),
        optax.masked(inner, trainable_mask),
    )


def set_learning_rate(opt_state, lr: float):
    """Write the epoch LR into the injected hyperparams (host -> device)."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=jnp.asarray(lr))


def get_learning_rate(opt_state) -> float:
    return float(optax.tree_utils.tree_get(opt_state, "learning_rate"))


def init_state(model, variables, optimizer) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def cls_train_body(model, optimizer, label_smoothing: float = 0.1,
                   prep=None):
    """Un-jitted step body (state, images, labels, rng, aug_rng) ->
    (state, loss, correct) — jitted whole by make_cls_train_step, or scanned
    K-at-a-time by scan_epoch (one dispatched program per K steps)."""

    def step(state: TrainState, images, labels, rng, aug_rng=None):
        if prep is not None:
            images, labels = prep(aug_rng, images, labels)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            loss = losses.cross_entropy(out, labels, label_smoothing)
            return loss, (out, mutated.get("batch_stats", {}))

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        correct = (jnp.argmax(out, axis=-1) == labels).sum()
        state = state.replace(params=params, batch_stats=new_stats,
                              opt_state=new_opt, step=state.step + 1)
        return state, loss, correct

    return step


def make_cls_train_step(model, optimizer, label_smoothing: float = 0.1,
                        prep=None):
    """Returns jitted (state, images, labels, rng) -> (state, loss, correct).

    prep: optional (rng, images, targets) -> (x, targets) preprocessing
    (the device augmentation chain) fused INTO the step program — one
    dispatch per step instead of two, and the augmented batch never
    round-trips through HBM between programs.  With prep, the step takes an
    extra aug_rng arg so the caller's key stream matches the unfused form."""
    return jax.jit(cls_train_body(model, optimizer, label_smoothing, prep),
                   donate_argnums=(0,))


def seg_train_body(model, optimizer, loss_name: str = "bce", prep=None):
    """Un-jitted step body (state, images, masks, rng, aug_rng) ->
    (state, loss); see cls_train_body."""
    loss_fns = {
        "bce": losses.bce_with_logits,
        "combined": losses.combined_loss,
    }
    loss_fn_inner = loss_fns[loss_name]

    def step(state: TrainState, images, masks, rng, aug_rng=None):
        if prep is not None:
            images, masks = prep(aug_rng, images, masks)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            if out.ndim == 3:
                out = out[..., None]
            loss = loss_fn_inner(out, masks)
            return loss, mutated.get("batch_stats", {})

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(params=params, batch_stats=new_stats,
                              opt_state=new_opt, step=state.step + 1)
        return state, loss

    return step


def make_seg_train_step(model, optimizer, loss_name: str = "bce", prep=None):
    """Returns jitted (state, images, masks, rng) -> (state, loss).
    prep: optional fused preprocessing, as in make_cls_train_step."""
    return jax.jit(seg_train_body(model, optimizer, loss_name, prep),
                   donate_argnums=(0,))


def scan_epoch(body, donate_carry: bool = True, split_rng: bool = True,
               data_sharding=None):
    """Multi-step driver: run K steps of `body` inside ONE dispatched program
    via lax.scan over an HBM-resident dataset.

    Through the demand-driven relay every dispatched program pays a ~2-3 ms
    floor (PERF.md "relay dispatch floor") and the single-core host adds
    per-step Python dispatch work; scanning K steps per dispatch removes
    both, turning an epoch into ceil(n_steps/K) dispatches.  This is the
    idiomatic TPU epoch shape: device-resident data (BatchLoader
    device_cache), compiler control flow (lax.scan), host sync once per
    chunk.  The reference's hot loop dispatches per batch by construction
    (utils/helpers.py:317-337); this is the tpu-first redesign of it.

    body: (carry, images, targets, rng, aug_rng) -> (carry, *outs) — e.g.
        cls_train_body / seg_train_body (carry = TrainState).

    With split_rng=True (the trainer's path) the returned driver is
        drive(carry, images_all, targets_all, idx, rng) ->
        (carry, rng', *stacked_outs)
    and each scanned step performs `rng, aug_rng, drop_rng = split(rng, 3)`
    INSIDE the program — the exact key sequence of the per-step host loop,
    without the loop's K tiny split dispatches through the relay.  The
    caller threads rng' back as its running key.

    With split_rng=False the driver is
        drive(carry, images_all, targets_all, idx, *streams) ->
        (carry, *stacked_outs)
    where each stream is a [K, ...]-stacked per-step input (e.g. explicit
    key arrays) passed to the body after the gathered batch.

    images_all/targets_all are the full device-cached arrays and idx is
    [K, B] int32 (rows sorted, as BatchLoader yields).  Each scanned step
    gathers its batch on device — the same jnp.take the cached loader path
    performs, ~1% of a train step at 256px.

    data_sharding: optional `NamedSharding` over the data axis — the
    scan-epoch x data-parallel composition.  The dataset cache is
    REPLICATED across the mesh (BatchLoader._cached) so each step's gather
    is local; the constraint then reshards the gathered batch across the
    mesh (a local slice, no collective) and the body's forward/backward run
    SPMD exactly like the per-step mesh path — XLA inserts the gradient
    psum because params are replicated and the batch is sharded."""

    def _batch(arr, i):
        x = jnp.take(arr, i, axis=0, unique_indices=True,
                     indices_are_sorted=True)
        if data_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, data_sharding)
        return x

    if split_rng:
        def drive(carry, images_all, targets_all, idx, rng):
            def one(cs, i):
                c, r = cs
                r, aug_rng, drop_rng = jax.random.split(r, 3)
                out = body(c, _batch(images_all, i), _batch(targets_all, i),
                           drop_rng, aug_rng)
                return (out[0], r), out[1:]

            (carry, rng), outs = jax.lax.scan(one, (carry, rng), idx)
            return (carry, rng) + tuple(outs)
    else:
        def drive(carry, images_all, targets_all, idx, *streams):
            def one(c, xs):
                i, rest = xs[0], xs[1:]
                out = body(c, _batch(images_all, i), _batch(targets_all, i),
                           *rest)
                return out[0], out[1:]

            carry, outs = jax.lax.scan(one, carry, (idx,) + streams)
            return (carry,) + tuple(outs)

    return jax.jit(drive, donate_argnums=(0,) if donate_carry else ())


def scan_epoch_driver(loader, scan_chunk: int, scan_drive, carry,
                      on_chunk, on_step, reshard=None):
    """Shared scan-epoch routing — the ONE owner of the chunk/remainder/tail
    invariant: whole [scan_chunk, B] index chunks run inside `scan_drive`
    (one dispatched program per K steps); remainder full batches and the
    ragged tail ride `on_step` (the ordinary per-step program) so no second,
    differently-shaped scan program is ever staged through the relay
    (2-8 min first execution each, PERF.md).  The finetuners use it with
    rng-free scan_epoch(split_rng=False) drives; train_model threads its
    running rng through the carry with a small wrapper around the
    split_rng=True drive (train/trainer.py).

    carry threads scan_drive -> on_step and back; `on_chunk(outs)` receives
    each chunk's stacked non-carry outputs for host-side accumulation;
    `on_step(carry, images, targets) -> carry` runs one ordinary step and
    does its own accumulation.  reshard: under a mesh the replicated
    cache's gathers are full local batches — reshard them to the per-step
    batch sharding (a local slice, no collective) before on_step; the scan
    program applies its own with_sharding_constraint (scan_epoch).

    Batch order and remainder routing mirror train_model's inline scan path
    (train/trainer.py) by construction: loader.epoch_index_batches consumes
    the shuffle RNG exactly like one __iter__ pass, so a scan-driven epoch
    is the per-step epoch re-chunked for the compiler."""
    idx_full, idx_tail = loader.epoch_index_batches()
    images_d, target_d = loader._cached()
    n_scan = (len(idx_full) // scan_chunk) * scan_chunk
    for s in range(0, n_scan, scan_chunk):
        outs = scan_drive(carry, images_d, target_d,
                          jnp.asarray(idx_full[s:s + scan_chunk]))
        carry = outs[0]
        on_chunk(outs[1:])
    rest = list(idx_full[n_scan:])
    if idx_tail is not None:
        rest.append(idx_tail)
    for row in rest:
        idx_d = jax.device_put(row)
        images = loader._gather(images_d, idx_d)
        targets = loader._gather(target_d, idx_d)
        if reshard is not None:
            images = jax.device_put(images, reshard)
            targets = jax.device_put(targets, reshard)
        carry = on_step(carry, images, targets)
    return carry


def make_cls_eval_step(model, label_smoothing: float = 0.1):
    """(params, stats, images, labels, n_valid) -> (loss_sum, correct, preds).

    n_valid (int32 scalar): real sample count — under a data-parallel mesh
    ragged val tails pad by repeating the last sample (loader pad_to_multiple)
    and the pad rows must not bias the metrics (r3 advisor: drop_last used to
    silently exclude up to batch-1 tail samples from validation).  Pass
    images.shape[0] on unpadded batches: the masked sums are then exactly the
    unmasked ones."""

    def step(params, batch_stats, images, labels, n_valid):
        out = model.apply({"params": params, "batch_stats": batch_stats}, images)
        valid = losses.valid_mask(images.shape[0], n_valid)
        loss_sum = (losses.per_sample_cross_entropy(out, labels,
                                                    label_smoothing)
                    * valid).sum()
        preds = jnp.argmax(out, axis=-1)
        correct = ((preds == labels) & (valid > 0)).sum()
        return loss_sum, correct, preds

    return jax.jit(step)


def make_seg_eval_step(model, loss_name: str = "bce"):
    """(params, stats, images, masks, n_valid) -> (loss_sum, batch_iou);
    n_valid masks sharded-val pad rows out (see make_cls_eval_step)."""
    loss_fns = {"bce": losses.masked_bce_with_logits,
                "combined": losses.masked_combined_loss}
    loss_fn_inner = loss_fns[loss_name]

    def step(params, batch_stats, images, masks, n_valid):
        out = model.apply({"params": params, "batch_stats": batch_stats}, images)
        if out.ndim == 3:
            out = out[..., None]
        valid = losses.valid_mask(images.shape[0], n_valid)
        loss = loss_fn_inner(out, masks, valid)
        iou = losses.masked_batch_iou(jax.nn.sigmoid(out), masks, valid)
        return loss * jnp.maximum(n_valid, 1), iou

    return jax.jit(step)
