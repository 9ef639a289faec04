"""CLIPSeg decoder-only finetuning (behavioral twin of utils/clip_seg_finetuner.py).

Recipe (clip_seg_finetuner.py:121-258): only decoder params train (the CLIP
backbone is additionally under stop_gradient in the model, as in HF); AdamW
lr 1e-5 wd 0.01, cosine annealing, CombinedLoss = 0.5*BCE + 0.5*Dice on the
352x352 logit grid, batch 8, best-val-DICE checkpoint saved as "CLIPSeg",
early stop patience 10.  Ground-truth masks are bilinear-resized to 352
(reference utils/dataset.py:237-244); the conditional text embedding for the
fixed "lungs" prompt is precomputed once.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medseg_tpu.core.config import CLIPSEG_IMG_SIZE, CLIPSegFinetuneConfig
from medseg_tpu.core.registry import get_model
from medseg_tpu.data.loader import BatchLoader
from medseg_tpu.ops.clip_prep import clip_preprocess
from medseg_tpu.train import checkpoint as ckpt
from medseg_tpu.train import steps as S
from medseg_tpu.train.freeze import finetune_filter, mask_from_predicate
from medseg_tpu.train.losses import (combined_loss, masked_combined_loss,
                                     valid_mask)
from medseg_tpu.train.schedules import EarlyStopping, cosine_annealing


def _batch_dice(probs, targets, valid, threshold=0.5):
    """Whole-batch dice over valid rows only (pad rows zero out of every
    sum, so the masked value equals the trimmed single-device one)."""
    v = valid.reshape((-1,) + (1,) * (probs.ndim - 1))
    p = (probs > threshold).astype(jnp.float32) * v
    t = (targets > threshold).astype(jnp.float32) * v
    inter = (p * t).sum()
    return (2.0 * inter + 1e-7) / (p.sum() + t.sum() + 1e-7)


def finetune_clipseg(
    train_loader: BatchLoader,
    val_loader: BatchLoader,
    variables,
    cond: np.ndarray,
    cfg: CLIPSegFinetuneConfig = CLIPSegFinetuneConfig(),
    *,
    save: bool = True,
    mesh=None,
    model=None,
    image_size: int = CLIPSEG_IMG_SIZE,
    scan_chunk: int = 0,
    log: Callable[[str], None] = print,
) -> float:
    """variables: CLIPSegModel variables; cond: [1, dim] conditional text
    embedding for the fixed prompt.  model/image_size are injectable for
    tests with tiny towers.
    mesh: optional `jax.sharding.Mesh` — batches shard over its 'data' axis,
    params/opt-state/cond replicate, and XLA inserts the gradient all-reduce
    (same SPMD design as train/trainer.py, SURVEY.md §2.4).
    scan_chunk: run K decoder-train steps per dispatched program over the
    HBM dataset cache (steps.scan_epoch / scan_epoch_driver) — the step is
    rng-free, so the scanned epoch is the per-step epoch re-chunked
    (tests/test_finetuners.py pins it)."""
    if model is None:
        model = get_model("CLIPSeg")["factory"]()
    cond = jnp.asarray(cond, jnp.float32)

    mask = mask_from_predicate(variables["params"], finetune_filter("CLIPSeg"))
    # grad clip 1.0 (clip_seg_finetuner.py:172)
    optimizer = S.build_optimizer(cfg.lr, cfg.weight_decay, 1.0, mask)
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
        params, opt_state, cond = jax.device_put((params, opt_state, cond),
                                                 replicated(mesh))

    # logit-grid shape, computed ONCE and abstractly: inside the traced step
    # a dummy model.apply would bake the closure-captured params into every
    # program as constants (the r2 413-transport lesson) and leave XLA to
    # fold a dead forward; eval_shape costs zero FLOPs and no baking.
    out_hw = jax.eval_shape(
        lambda p, x, c: model.apply({"params": p}, x, cond=c),
        variables["params"],
        jax.ShapeDtypeStruct((1, image_size, image_size, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, cond.shape[-1]), jnp.float32)).shape[1:]

    def prep(images_u8, masks_u8):
        x = clip_preprocess(images_u8, image_size)
        m = masks_u8.astype(jnp.float32)[..., None] / 255.0
        b = m.shape[0]
        m = jax.image.resize(m, (b, out_hw[0], out_hw[1], 1),
                             method="bilinear")
        return x, m[..., 0]

    # r1 needed jax.checkpoint here: the un-remat'd backward SIGILLed XLA's
    # TpuPriorityFusionQueue on that v5e toolchain.  Re-tested r2: the
    # current toolchain compiles the plain backward cleanly in ~19s (the
    # remat'd graph had grown to a 7+ min compile) and the step runs 36%
    # faster (540 vs 398 img/s at B=8/352px) — workaround removed; if a
    # future toolchain regresses, wrap model.apply in jax.checkpoint again.

    def _step(params, opt_state, images_u8, masks_u8):
        def loss_fn(p):
            x, m = prep(images_u8, masks_u8)
            c = jnp.broadcast_to(cond, (x.shape[0], cond.shape[-1]))
            logits = model.apply({"params": p}, x, cond=c)
            return combined_loss(logits, m, cfg.bce_weight, cfg.dice_weight)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    train_step = jax.jit(_step)

    # Ragged-tail batches must NOT compile a second fwd+bwd program at the
    # tail's shape: this toolchain's tpu_compile_helper SIGILLs on the
    # 352px ViT backward at several batch shapes (r5 sweep: B>=16; r5 cert:
    # the B=5 tail) while B=8 is proven.  Tails therefore pad to the full
    # batch (repeat last row) and ride a masked-loss twin of the step at the
    # SAME proven shape; pad rows contribute literal-zero loss/grad terms,
    # so the result is exactly the unpadded step's
    # (tests/test_finetuners.py pins it).  Full batches keep the unmasked
    # program (byte-identical HLO to the persistent-cache entry).
    def _step_masked(params, opt_state, images_u8, masks_u8, n_valid):
        def loss_fn(p):
            x, m = prep(images_u8, masks_u8)
            c = jnp.broadcast_to(cond, (x.shape[0], cond.shape[-1]))
            logits = model.apply({"params": p}, x, cond=c)
            valid = valid_mask(x.shape[0], n_valid)
            return masked_combined_loss(logits, m, valid,
                                        cfg.bce_weight, cfg.dice_weight)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    bs_full = train_loader.batch_size
    tail_step = [None]  # jitted lazily: most epochs never see a tail

    def _pad_rows(*arrays, reps):
        return tuple(jnp.concatenate([a] + [a[-1:]] * reps) for a in arrays)

    def dispatch_train(params, opt_state, images, masks):
        """(params, opt_state, loss, n_real) for full OR ragged batches."""
        b = int(images.shape[0])
        if b == bs_full or mesh is not None:  # mesh: drop_last, no tails
            p, o, loss = train_step(params, opt_state, images, masks)
            return p, o, loss, b
        images, masks = _pad_rows(images, masks, reps=bs_full - b)
        if tail_step[0] is None:
            tail_step[0] = jax.jit(_step_masked)
        p, o, loss = tail_step[0](params, opt_state, images, masks, b)
        return p, o, loss, b

    use_scan = scan_chunk > 1 and train_loader.device_cache
    if scan_chunk > 1 and not use_scan:
        log(f"[scan_chunk] disabled: requires device_cache "
            f"(device_cache={train_loader.device_cache})")
    if use_scan:
        def _scan_body(carry, images_u8, masks_u8):
            p, o, loss = _step(*carry, images_u8, masks_u8)
            return (p, o), loss

        # donate_carry=False: the carry is the caller's variables['params']
        # + opt_state; donation would consume them on TPU (r4 advisor, see
        # clip_finetune.py for the full note)
        scan_drive = S.scan_epoch(
            _scan_body, donate_carry=False, split_rng=False,
            data_sharding=train_loader.sharding if mesh is not None else None)

    @jax.jit
    def eval_step(params, images_u8, masks_u8, n_valid):
        x, m = prep(images_u8, masks_u8)
        c = jnp.broadcast_to(cond, (x.shape[0], cond.shape[-1]))
        logits = model.apply({"params": params}, x, cond=c)
        valid = valid_mask(x.shape[0], n_valid)
        loss = masked_combined_loss(logits, m, valid,
                                    cfg.bce_weight, cfg.dice_weight)
        dice = _batch_dice(jax.nn.sigmoid(logits), m, valid)
        return loss * jnp.maximum(n_valid, 1), dice

    stopper = EarlyStopping(cfg.early_stop_patience, mode="max")
    best = 0.0
    start = time.time()
    for epoch in range(1, cfg.epochs + 1):
        opt_state = S.set_learning_rate(
            opt_state, cosine_annealing(cfg.lr, epoch - 1, cfg.epochs))
        # device-side stat accumulation, one fetch per epoch (train/trainer.py)
        loss_acc = jnp.zeros((), jnp.float32)
        total = 0
        if use_scan:
            bs = train_loader.batch_size

            def on_chunk(outs):
                nonlocal loss_acc, total
                (losses_k,) = outs
                loss_acc = loss_acc + losses_k.sum() * bs
                total += losses_k.shape[0] * bs

            def on_step(carry, images, masks):
                nonlocal loss_acc, total
                p, o, loss, n_real = dispatch_train(*carry, images, masks)
                loss_acc = loss_acc + loss * n_real
                total += n_real
                return p, o

            params, opt_state = S.scan_epoch_driver(
                train_loader, scan_chunk, scan_drive, (params, opt_state),
                on_chunk, on_step,
                reshard=train_loader.sharding if mesh is not None else None)
        else:
            for images, masks in train_loader:
                params, opt_state, loss, n_real = dispatch_train(
                    params, opt_state, images, masks)
                loss_acc = loss_acc + loss * n_real
                total += n_real
        run_loss = float(loss_acc)

        vloss_acc = jnp.zeros((), jnp.float32)
        dice_stack = []
        val_total = 0
        for (images, masks), n_real in zip(val_loader,
                                           val_loader.real_counts()):
            # ragged val tails pad to the val loader's full batch too (one
            # program; eval_step's n_valid mask makes pad rows exact no-ops)
            if mesh is None and images.shape[0] < val_loader.batch_size:
                images, masks = _pad_rows(
                    images, masks,
                    reps=val_loader.batch_size - int(images.shape[0]))
            loss_sum, dice = eval_step(params, images, masks, n_real)
            vloss_acc = vloss_acc + loss_sum
            dice_stack.append(dice)
            val_total += n_real
        val_loss = float(vloss_acc)
        val_dice = float(jnp.mean(jnp.stack(dice_stack))) if dice_stack else 0.0
        log(f"[CLIPSeg] Ep{epoch}: TrainLoss {run_loss / max(1, total):.3f} | "
            f"ValLoss {val_loss / max(1, val_total):.3f} | "
            f"ValDice {val_dice:.3f}")

        if stopper.update(val_dice):
            best = val_dice
            if save:
                save_dir = str(cfg.save_root) + "/segmentation_models"
                # embed the conditional embedding so eval/serve can drive
                # this checkpoint offline (no tokenizer assets needed)
                ckpt.save_best(save_dir, "CLIPSeg", True, params, {},
                               meta={"epoch": epoch, "dice": val_dice},
                               aux={"cond": np.asarray(cond, np.float32)})
                log(f"Saved best model (Dice: {val_dice:.4f})")
        if stopper.should_stop:
            log(f"Early stopping at epoch {epoch}. Best dice: {best:.4f}")
            break
    log(f"\nTraining finished in {(time.time() - start) / 60:.2f} minutes.")
    return best
