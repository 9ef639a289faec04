"""The training engine: two-stage classification and segmentation recipes.

Behavioral twin of reference utils/helpers.py:231-412 `train()`:

- classification: stage 1 (epochs 1-5) trains the head only, AdamW lr 1e-4
  wd 5e-4, cosine annealing over 5 epochs; stage 2 (epoch 6+) unfreezes all
  with a fresh AdamW at the caller lr (1e-6) and ReduceLROnPlateau(max, 0.1,
  patience 3) on val accuracy; loss = CE(label_smoothing=0.1)
- segmentation: single stage, AdamW at caller lr wd 5e-4, cosine annealing
  over all epochs, BCEWithLogits; ResNetUnet's encoder stays frozen
- both: global-norm-1.0 gradient clip, best-checkpoint save (val accuracy for
  cls, val loss for seg), early stop patience 10, and the reference's
  per-epoch print format

TPU realization: each stage is one jitted step function over a data-sharded
batch on the device mesh (stage transition = second compile, SURVEY.md §7);
the LR is injected into optimizer state per epoch, so host-side schedulers
never trigger recompilation; batch stats sync globally under jit.  The
compute dtype policy (bf16) replaces CUDA AMP; no loss scaling is needed.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medseg_tpu.core.config import AugmentConfig, TrainConfig
from medseg_tpu.core.precision import policy_from_name
from medseg_tpu.core.registry import get_model
from medseg_tpu.data.loader import BatchLoader
from medseg_tpu.ops.augment import augment_batch, preprocess_eval_batch
from medseg_tpu.train import checkpoint as ckpt
from medseg_tpu.train import steps as S
from medseg_tpu.train.freeze import (all_trainable, finetune_filter, head_only,
                                     mask_from_predicate)
from medseg_tpu.train.schedules import EarlyStopping, ReduceLROnPlateau, cosine_annealing


@dataclass
class TrainResult:
    name: str
    best_score: float
    epochs_run: int
    state: S.TrainState


# Transient relay/transport failure detection lives in core.errors (shared
# with eval retry and the bench harness); re-exported here for callers that
# learned the name from the training module.
from medseg_tpu.core.errors import is_transient_runtime_error  # noqa: E402,F401


def train_model_resilient(
    name, train_loader, val_loader, cfg=None, aug_cfg=None, *,
    max_restarts: int = 2, log: Callable[[str], None] = print, **kw,
) -> TrainResult:
    """train_model with automatic restart on transient runtime failures.

    The tunneled TPU runtime can drop a training run with a transport-level
    JaxRuntimeError (relay restart, remote-compile stream cut) that has
    nothing to do with the program.  Because every epoch writes a resume
    checkpoint, the safe recovery is NOT to retry the failed (donated-buffer)
    step but to re-enter train_model with resume=True — it rebuilds device
    state from the last epoch boundary, re-initializing optimizers across the
    stage boundary exactly as a manual `medseg train --resume` would.  The
    reference has no analogue (a torch crash loses the epoch); this is the
    failure-detection subsystem of SURVEY.md §5 realized for training.

    Requires save=True (resume checkpoints are the recovery mechanism);
    non-transient errors and save=False runs re-raise immediately.
    """
    cfg = cfg if cfg is not None else TrainConfig()
    aug_cfg = aug_cfg if aug_cfg is not None else AugmentConfig()
    resume = kw.pop("resume", False)
    save = kw.get("save", True)
    attempt = 0
    while True:
        try:
            return train_model(name, train_loader, val_loader, cfg, aug_cfg,
                               resume=resume or attempt > 0, log=log, **kw)
        except jax.errors.JaxRuntimeError as e:
            attempt += 1
            if not save or attempt > max_restarts \
                    or not is_transient_runtime_error(e):
                raise
            headline = str(e).splitlines()[0] if str(e) else repr(e)
            log(f"[WARN] transient runtime failure ({headline}); "
                f"restarting {name} from the resume checkpoint "
                f"(attempt {attempt}/{max_restarts})")


def _make_aug_fns(seg: bool, aug_cfg: AugmentConfig, compute_dtype):
    """Device-side train/eval preprocessing (uint8 -> model input).

    train_prep is NOT jitted here: it fuses into the train-step program
    (steps.make_*_train_step prep hook), so each step is ONE dispatch and
    the augmented batch never materializes between programs."""

    def train_prep(rng, images, targets):
        if seg:
            x, m = augment_batch(rng, images, targets, cfg=aug_cfg,
                                 out_dtype=compute_dtype)
            return x, m
        x, _ = augment_batch(rng, images, cfg=aug_cfg, out_dtype=compute_dtype)
        return x, targets

    @jax.jit
    def eval_prep(images, targets):
        if seg:
            x, m = preprocess_eval_batch(images, targets, cfg=aug_cfg,
                                         out_dtype=compute_dtype)
            return x, m
        x, _ = preprocess_eval_batch(images, cfg=aug_cfg, out_dtype=compute_dtype)
        return x, targets

    return train_prep, eval_prep


def train_model(
    name: str,
    train_loader: BatchLoader,
    val_loader: BatchLoader,
    cfg: TrainConfig = TrainConfig(),
    aug_cfg: AugmentConfig = AugmentConfig(),
    *,
    seed: int = 0,
    save: bool = True,
    mesh=None,
    resume: bool = False,
    scan_chunk: int = 0,
    log: Callable[[str], None] = print,
) -> TrainResult:
    """Train one registry model end-to-end; returns best score (acc% or loss).

    mesh: optional `jax.sharding.Mesh` — batches shard over its 'data' axis,
    parameters replicate, and XLA inserts the gradient all-reduce (the SPMD
    generalization of the reference's single-GPU loop, SURVEY.md §2.4).
    resume: restart from the `{name}_resume` orbax checkpoint if present
    (capability absent in the reference, SURVEY.md §5).
    scan_chunk: run K train steps per dispatched program via lax.scan over
    the HBM-resident dataset cache (steps.scan_epoch) — removes the relay's
    per-dispatch floor and the host's per-step Python work from the epoch.
    Requires train_loader.device_cache (falls back to the per-step loop
    with a log line otherwise).  Composes with mesh: the dataset cache
    replicates across the mesh and each scanned step reshards its batch
    over the data axis, so the scanned epoch is the same SPMD program the
    per-step mesh path runs (tests/test_scan_epoch.py pins both).  Math,
    RNG stream, and epoch statistics are EXACTLY the per-step loop's.
    """
    entry = get_model(name)
    if entry.get("needs_text_features"):
        raise ValueError(
            f"{name} uses the dedicated finetune recipe "
            f"(train.finetune_clip / train.finetune_clipseg), not train_model")
    seg = entry["task"] == "segmentation"
    policy = policy_from_name(cfg.compute_dtype)
    model = entry["factory"](dtype=policy.compute_dtype)

    if mesh is not None:
        from medseg_tpu.parallel import (batch_sharding, replicated,
                                         require_divisible_batch)

        require_divisible_batch(mesh, train_loader, val_loader)
        # shallow-copy so the caller's loaders are not left sharded /
        # tail-dropping / padded after the run (same fix as eval's)
        import copy

        train_loader = copy.copy(train_loader)
        val_loader = copy.copy(val_loader)
        train_loader.sharding = batch_sharding(mesh)
        val_loader.sharding = batch_sharding(mesh)
        # train batches must divide across the data axis; drop ragged tails
        # (epoch statistics still normalize by the samples actually seen).
        # Validation instead PADS ragged tails (repeat last sample) and the
        # eval step masks the pad rows out, so mesh and single-device runs
        # score the exact same sample set (r3 advisor: drop_last silently
        # excluded up to batch-1 tail samples from best-checkpoint choice).
        train_loader.drop_last = True
        val_loader.pad_to_multiple = mesh.size

    rng = jax.random.key(seed)
    rng, init_rng = jax.random.split(rng)
    sample_images, sample_targets = next(iter(train_loader))
    train_prep, eval_prep = _make_aug_fns(seg, aug_cfg, policy.compute_dtype)
    x0, _ = eval_prep(sample_images, sample_targets)
    variables = model.init({"params": init_rng, "dropout": init_rng}, x0)

    save_dir = str(cfg.seg_save_dir if seg else cfg.cls_save_dir)

    # --- resume metadata (decides which stage's optimizer to build) -------
    start_epoch = 1
    restored_tree = None
    resume_extras = {}
    if resume:
        restored = ckpt.load_resume(save_dir, name)
        if restored is not None:
            restored_tree, meta = restored
            want = jax.tree_util.tree_structure(variables["params"])
            got = jax.tree_util.tree_structure(restored_tree["params"])
            if want != got:
                raise ValueError(
                    f"resume checkpoint {name}_resume does not match model "
                    f"{name!r}: parameter trees differ (checkpoint from a "
                    f"different model/topology?). Delete the checkpoint or "
                    f"run without --resume.")
            start_epoch = int(meta["epoch"]) + 1
            resume_extras = meta

    in_stage2 = (not seg) and start_epoch > cfg.stage1_epochs
    # Which stage's optimizer wrote the resume checkpoint?  At the stage
    # boundary (interrupted right after epoch stage1_epochs) the saved
    # opt_state is still the stage-1 masked tree, whose leaf count differs
    # from the stage-2 optimizer's — restoring it would fail, and a fresh
    # run re-inits the optimizer at the transition anyway (helpers.py:295-311),
    # so we re-init instead of unflattening in that case.
    saved_stage = int(resume_extras.get("stage", 2 if in_stage2 else 1))
    resume_at_stage_boundary = in_stage2 and saved_stage == 1

    # --- optimizer / stage setup ------------------------------------------
    use_scan = scan_chunk > 1 and train_loader.device_cache
    if scan_chunk > 1 and not use_scan:
        log(f"[scan_chunk] disabled: requires device_cache "
            f"(device_cache={train_loader.device_cache})")

    def _scan_driver(optimizer):
        body = (S.seg_train_body(model, optimizer, prep=train_prep) if seg
                else S.cls_train_body(model, optimizer, cfg.label_smoothing,
                                      prep=train_prep))
        # scan x data-parallel: replicated dataset cache, per-step batch
        # resharded across the mesh inside the program (steps.scan_epoch)
        sharding = train_loader.sharding if mesh is not None else None
        return S.scan_epoch(body, data_sharding=sharding)

    if seg:
        mask = mask_from_predicate(variables["params"], finetune_filter(name))
        optimizer = S.build_optimizer(cfg.lr, cfg.weight_decay,
                                      cfg.grad_clip_norm, mask)
        train_step = S.make_seg_train_step(model, optimizer, prep=train_prep)
        eval_step = S.make_seg_eval_step(model)
        log(f"Training Segmentation model (all layers unfrozen) with LR: {cfg.lr}")
    else:
        if in_stage2:
            mask1 = all_trainable(variables["params"])
            lr0 = cfg.lr
        else:
            mask1 = mask_from_predicate(variables["params"], head_only(name))
            lr0 = cfg.stage1_lr
            log(f"--- STAGE 1: Feature Extraction (Epochs 1-{cfg.stage1_epochs}) ---")
        optimizer = S.build_optimizer(lr0, cfg.weight_decay,
                                      cfg.grad_clip_norm, mask1)
        train_step = S.make_cls_train_step(model, optimizer, cfg.label_smoothing,
                                           prep=train_prep)
        eval_step = S.make_cls_eval_step(model, cfg.label_smoothing)

    state = S.init_state(model, variables, optimizer)
    scan_drive = _scan_driver(optimizer) if use_scan else None

    stopper = EarlyStopping(cfg.early_stop_patience, mode="min" if seg else "max")
    plateau: Optional[ReduceLROnPlateau] = None
    best_score = float("inf") if seg else 0.0
    if in_stage2:
        plateau = ReduceLROnPlateau(
            float(resume_extras.get("plateau_lr", cfg.lr)), "max",
            cfg.plateau_factor, cfg.plateau_patience)
    if restored_tree is not None:
        params = jax.tree.map(jnp.asarray, restored_tree["params"])
        if resume_at_stage_boundary:
            opt_state = optimizer.init(params)
            log(f"Resume crosses the stage 1->2 boundary: re-initialized the "
                f"stage-2 optimizer (fresh AdamW, as the transition would).")
        else:
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(state.opt_state),
                jax.tree_util.tree_leaves(restored_tree["opt_state"]))
        state = state.replace(
            params=params,
            batch_stats=jax.tree.map(jnp.asarray, restored_tree["batch_stats"]),
            opt_state=opt_state,
            step=jnp.asarray(restored_tree["step"]))
        best_score = float(resume_extras["best_score"])
        stopper.best = best_score
        log(f"Resumed {name} from epoch {start_epoch - 1} (best {best_score:.4f})")
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    start = time.time()
    epochs_run = 0

    for epoch in range(start_epoch, cfg.epochs + 1):
        epochs_run = epoch
        # --- stage 2 transition (cls only, helpers.py:295-311) ------------
        if not seg and epoch == cfg.stage1_epochs + 1 and not in_stage2:
            log(f"\n--- STAGE 2: Full Fine-Tuning (Epochs {epoch}-{cfg.epochs}) ---")
            mask2 = all_trainable(state.params)
            optimizer = S.build_optimizer(cfg.lr, cfg.weight_decay,
                                          cfg.grad_clip_norm, mask2)
            train_step = S.make_cls_train_step(model, optimizer, cfg.label_smoothing,
                                               prep=train_prep)
            if use_scan:
                scan_drive = _scan_driver(optimizer)
            state = state.replace(opt_state=optimizer.init(state.params))
            plateau = ReduceLROnPlateau(cfg.lr, "max", cfg.plateau_factor,
                                        cfg.plateau_patience)
            log(f"Full fine-tuning (all layers unfrozen) with very low LR: "
                f"{cfg.lr}. Using ReduceLROnPlateau scheduler.")

        # --- per-epoch LR (host schedule -> device state) ------------------
        if seg:
            lr = cosine_annealing(cfg.lr, epoch - 1, cfg.epochs)
        elif epoch <= cfg.stage1_epochs:
            lr = cosine_annealing(cfg.stage1_lr, epoch - 1, cfg.stage1_epochs)
        else:
            lr = plateau.lr
        state = state.replace(opt_state=S.set_learning_rate(state.opt_state, lr))

        # --- train epoch -----------------------------------------------
        # Stats accumulate ON DEVICE and are fetched once per epoch: a
        # per-step float(loss) would sync the (demand-driven, tunneled)
        # runtime every step and serialize dispatch against execution —
        # the dominant cost of the r1 training loop (PERF.md).
        loss_acc = jnp.zeros((), jnp.float32)
        corr_acc = jnp.zeros((), jnp.int32)
        n_seen = 0

        def dispatch_one_step(images, targets):
            # shared single-step bookkeeping: the per-step loop and the scan
            # path's ragged tail MUST stay in lockstep (the equality
            # tests/test_scan_epoch.py protects), so there is exactly one
            # copy of it
            nonlocal state, rng, loss_acc, corr_acc, n_seen
            rng, aug_rng, drop_rng = jax.random.split(rng, 3)
            if seg:
                state, loss = train_step(state, images, targets, drop_rng,
                                         aug_rng)
            else:
                state, loss, corr = train_step(state, images, targets,
                                               drop_rng, aug_rng)
                corr_acc = corr_acc + corr
            loss_acc = loss_acc + loss * images.shape[0]
            n_seen += images.shape[0]

        if use_scan:
            # scan-epoch path: K steps per dispatched program over the HBM
            # dataset cache; batch order and RNG stream are EXACTLY the
            # per-step loop's (loader.epoch_index_batches consumes the same
            # shuffle, the key splits are the same sequence).  Chunk /
            # remainder / ragged-tail routing lives in steps.scan_epoch_driver
            # (one owner of the invariant, shared with the finetuners; the
            # rng rides the driver's carry since this recipe splits keys).
            bs = train_loader.batch_size

            def scan_with_rng(carry, images_all, targets_all, idx):
                st, r = carry
                outs = scan_drive(st, images_all, targets_all, idx, r)
                return ((outs[0], outs[1]),) + tuple(outs[2:])

            def on_chunk(outs):
                nonlocal loss_acc, corr_acc, n_seen
                losses_k = outs[0]
                if not seg:
                    corr_acc = corr_acc + outs[1].sum()
                loss_acc = loss_acc + losses_k.sum() * bs
                n_seen += losses_k.shape[0] * bs

            def on_step(carry, images, targets):
                nonlocal state, rng
                state, rng = carry
                dispatch_one_step(images, targets)
                return state, rng

            state, rng = S.scan_epoch_driver(
                train_loader, scan_chunk, scan_with_rng, (state, rng),
                on_chunk, on_step,
                reshard=train_loader.sharding if mesh is not None else None)
        else:
            for images, targets in train_loader:
                dispatch_one_step(images, targets)
        running_loss = float(loss_acc)
        correct = int(corr_acc)

        # --- validation --------------------------------------------------
        vloss_acc = jnp.zeros((), jnp.float32)
        vmetric_acc = jnp.zeros((), jnp.float32)
        n_batches = 0
        n_val_seen = 0
        for (images, targets), n_real in zip(val_loader,
                                             val_loader.real_counts()):
            x, t = eval_prep(images, targets)
            if seg:
                loss_sum, iou = eval_step(state.params, state.batch_stats,
                                          x, t, n_real)
                vmetric_acc = vmetric_acc + iou
            else:
                loss_sum, corr, _ = eval_step(state.params, state.batch_stats,
                                              x, t, n_real)
                vmetric_acc = vmetric_acc + corr
            vloss_acc = vloss_acc + loss_sum
            n_batches += 1
            n_val_seen += n_real
        val_loss = float(vloss_acc) / max(1, n_val_seen)
        val_metric = float(vmetric_acc)

        # --- scoring, logging (helpers.py:364-392) -------------------------
        if seg:
            val_iou = val_metric / max(1, n_batches)
            score = val_loss
            log(f"[{name}] Ep{epoch}: TrainLoss {running_loss / max(1, n_seen):.3f} | "
                f"ValLoss {val_loss:.3f} | IoU {val_iou:.3f}")
        else:
            train_acc = 100.0 * correct / max(1, n_seen)
            val_acc = 100.0 * val_metric / max(1, n_val_seen)
            score = val_acc
            log(f"[{name}] Ep{epoch}: TrainLoss {running_loss / max(1, n_seen):.3f} "
                f"(Acc {train_acc:.2f}%) | ValLoss {val_loss:.3f} | "
                f"ValAcc {val_acc:.2f}%")
            if plateau is not None:
                plateau.step(score)

        improved = stopper.update(score)
        if improved:
            best_score = score
            if save:
                ckpt.save_best(save_dir, name, seg, state.params,
                               state.batch_stats,
                               meta={"epoch": epoch, "score": float(score)})
        if save:
            extras = {"stage": 2 if (not seg and epoch > cfg.stage1_epochs) else 1}
            if plateau is not None:
                extras["plateau_lr"] = plateau.lr
            ckpt.save_resume(save_dir, name, state, epoch, float(best_score),
                             extra=extras)
        if stopper.should_stop:
            log(f"Early stopping at epoch {epoch}. Best score: {best_score:.2f}")
            break

    log(f"Training for {name} finished in {(time.time() - start) / 60:.2f} minutes.")
    if save and not seg and best_score <= 0.0:
        log(f"[WARNING] {name}: validation accuracy never exceeded 0% — no "
            f"best checkpoint was saved (eval/serve will skip this model). "
            f"Train longer or check the data.")
    return TrainResult(name, best_score, epochs_run, state)
