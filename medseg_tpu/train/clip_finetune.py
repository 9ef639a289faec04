"""CLIP vision-tower finetuning (behavioral twin of utils/clip_finetuner.py).

Recipe (clip_finetuner.py:85-192): text features for the three medical
prompts are encoded once and frozen; only the vision tower trains (text
tower, projections, logit_scale frozen); AdamW lr 5e-6 wd 5e-4, cosine
annealing over epochs, plain CE (no label smoothing), grad clip 1.0,
batch 32, full fp32 (the reference uses no AMP here), best-val-accuracy
checkpoint saved as "CLIP", early stop patience 10.

Inputs are packed uint8 images; the CLIP processor's resize+normalize runs
on device (ops/clip_prep.py), replacing the per-sample HF processor calls.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medseg_tpu.core.config import CLIP_IMG_SIZE, CLIPFinetuneConfig
from medseg_tpu.core.registry import get_model
from medseg_tpu.data.loader import BatchLoader
from medseg_tpu.ops.clip_prep import clip_preprocess
from medseg_tpu.train import checkpoint as ckpt
from medseg_tpu.train import steps as S
from medseg_tpu.train.freeze import finetune_filter, mask_from_predicate
from medseg_tpu.train.losses import (cross_entropy, per_sample_cross_entropy,
                                     valid_mask)
from medseg_tpu.train.schedules import EarlyStopping, cosine_annealing


def finetune_clip(
    train_loader: BatchLoader,
    val_loader: BatchLoader,
    variables,
    text_features: np.ndarray,
    cfg: CLIPFinetuneConfig = CLIPFinetuneConfig(),
    *,
    seed: int = 0,
    save: bool = True,
    mesh=None,
    model=None,
    image_size: int = CLIP_IMG_SIZE,
    scan_chunk: int = 0,
    log: Callable[[str], None] = print,
) -> float:
    """variables: CLIPClassifier variables (e.g. converted HF weights);
    text_features: [num_classes, dim] L2-normalized prompt embeddings.
    model/image_size are injectable for tests with tiny towers.
    mesh: optional `jax.sharding.Mesh` — batches shard over its 'data' axis,
    params/opt-state/text-features replicate, and XLA inserts the gradient
    all-reduce (same SPMD design as train/trainer.py, SURVEY.md §2.4).
    scan_chunk: run K train steps per dispatched program via lax.scan over
    the HBM-resident dataset cache (steps.scan_epoch / scan_epoch_driver) —
    the same dispatch-amortizing driver train_model has; requires a
    device_cache loader.  The finetune step is rng-free (deterministic
    clip_preprocess, no dropout), so the scanned epoch is bit-for-bit the
    per-step epoch re-chunked (tests/test_finetuners.py pins it)."""
    if model is None:
        model = get_model("CLIP")["factory"]()
    tf = jnp.asarray(text_features, jnp.float32)

    mask = mask_from_predicate(variables["params"], finetune_filter("CLIP"))
    optimizer = S.build_optimizer(cfg.lr, cfg.weight_decay, cfg.grad_clip_norm, mask)
    opt_state = optimizer.init(variables["params"])
    params = variables["params"]

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
        # Validation pads ragged tails and masks them out of the metrics so
        # best-checkpoint selection sees the exact same sample set as a
        # single-device run (r3 advisor fix).
        train_loader.drop_last = True
        val_loader.pad_to_multiple = mesh.size
        params, opt_state, tf = jax.device_put((params, opt_state, tf),
                                               replicated(mesh))

    def _step(params, opt_state, images_u8, labels):
        def loss_fn(p):
            x = clip_preprocess(images_u8, image_size)
            logits = model.apply({"params": p}, x, tf)
            return cross_entropy(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        correct = (jnp.argmax(logits, -1) == labels).sum()
        return params2, opt_state2, loss, correct

    train_step = jax.jit(_step)

    use_scan = scan_chunk > 1 and train_loader.device_cache
    if scan_chunk > 1 and not use_scan:
        log(f"[scan_chunk] disabled: requires device_cache "
            f"(device_cache={train_loader.device_cache})")
    if use_scan:
        def _scan_body(carry, images_u8, labels):
            p, o, loss, corr = _step(*carry, images_u8, labels)
            return (p, o), loss, corr

        # donate_carry=False: donation would invalidate the CALLER's
        # variables['params'] / fresh opt_state on the first chunk (they are
        # the scan carry) — unlike the per-step path (plain jit, no
        # donation).  The carry is small (CLIP params + opt state), so the
        # copy is cheap and finetune_clip keeps train_model's contract of
        # not consuming its inputs (r4 advisor).
        scan_drive = S.scan_epoch(
            _scan_body, donate_carry=False, split_rng=False,
            data_sharding=train_loader.sharding if mesh is not None else None)

    @jax.jit
    def eval_step(params, images_u8, labels, n_valid):
        x = clip_preprocess(images_u8, image_size)
        logits = model.apply({"params": params}, x, tf)
        valid = valid_mask(images_u8.shape[0], n_valid)
        loss_sum = (per_sample_cross_entropy(logits, labels) * valid).sum()
        correct = ((jnp.argmax(logits, -1) == labels) & (valid > 0)).sum()
        return loss_sum, correct

    stopper = EarlyStopping(cfg.early_stop_patience, mode="max")
    best = 0.0
    start = time.time()
    for epoch in range(1, cfg.epochs + 1):
        lr = cosine_annealing(cfg.lr, epoch - 1, cfg.epochs)
        opt_state = S.set_learning_rate(opt_state, lr)

        # stats accumulate on device; ONE host fetch per epoch (a per-step
        # float(loss) would sync the demand-driven runtime every step —
        # the dominant r1 training-loop cost, see train/trainer.py)
        loss_acc = jnp.zeros((), jnp.float32)
        corr_acc = jnp.zeros((), jnp.int32)
        total = 0
        if use_scan:
            bs = train_loader.batch_size

            def on_chunk(outs):
                nonlocal loss_acc, corr_acc, total
                losses_k, corrs_k = outs
                loss_acc = loss_acc + losses_k.sum() * bs
                corr_acc = corr_acc + corrs_k.sum()
                total += losses_k.shape[0] * bs

            def on_step(carry, images, labels):
                nonlocal loss_acc, corr_acc, total
                p, o, loss, corr = train_step(*carry, images, labels)
                loss_acc = loss_acc + loss * images.shape[0]
                corr_acc = corr_acc + corr
                total += images.shape[0]
                return p, o

            params, opt_state = S.scan_epoch_driver(
                train_loader, scan_chunk, scan_drive, (params, opt_state),
                on_chunk, on_step,
                reshard=train_loader.sharding if mesh is not None else None)
        else:
            for images, labels in train_loader:
                params, opt_state, loss, corr = train_step(params, opt_state,
                                                           images, labels)
                loss_acc = loss_acc + loss * images.shape[0]
                corr_acc = corr_acc + corr
                total += images.shape[0]
        run_loss, correct = float(loss_acc), int(corr_acc)

        vloss_acc = jnp.zeros((), jnp.float32)
        vcorr_acc = jnp.zeros((), jnp.int32)
        val_total = 0
        for (images, labels), n_real in zip(val_loader,
                                            val_loader.real_counts()):
            loss_sum, corr = eval_step(params, images, labels, n_real)
            vloss_acc = vloss_acc + loss_sum
            vcorr_acc = vcorr_acc + corr
            val_total += n_real
        val_loss, val_correct = float(vloss_acc), int(vcorr_acc)
        val_acc = 100.0 * val_correct / max(1, val_total)
        log(f"[CLIP] Ep{epoch}: TrainLoss {run_loss / max(1, total):.3f} "
            f"(Acc {100.0 * correct / max(1, total):.2f}%) | "
            f"ValLoss {val_loss / max(1, val_total):.3f} | ValAcc {val_acc:.2f}%")

        if stopper.update(val_acc):
            best = val_acc
            if save:
                save_dir = str(cfg.save_root) + "/classification_models"
                # embed the prompt features so eval/serve can drive this
                # checkpoint offline (no tokenizer assets needed)
                ckpt.save_best(save_dir, "CLIP", False, params, {},
                               meta={"epoch": epoch, "score": val_acc},
                               aux={"text_features": np.asarray(tf, np.float32)})
                log(f"Saved best model (Acc: {val_acc:.2f}%)")
        if stopper.should_stop:
            log(f"Early stopping at epoch {epoch}. Best accuracy: {best:.2f}%")
            break
    log(f"\nTraining finished in {(time.time() - start) / 60:.2f} minutes.")
    log(f"Best Validation Accuracy: {best:.2f}%")
    return best
