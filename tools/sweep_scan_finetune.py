"""Per-dispatch vs scan-epoch A/B for the CLIP finetune step (r4).

The finetuners grew the scan-epoch driver (train/clip_finetune.py
scan_chunk, steps.scan_epoch_driver); this measures what the dispatch
amortization is worth on the real chip for the production recipe shape:
full CLIPClassifier (ViT-B/32-scale towers), fp32 (the reference finetunes
without AMP, clip_finetuner.py:85-192), device-side clip_preprocess from
packed 299px uint8, vision-tower-only optimizer mask.

Usage (TPU, nohup — never timeout-kill a mid-flight jax process):

    SWEEP_CFGS="32x30,64x30" nohup python tools/sweep_scan_finetune.py &

Prints, per (B, K): per-dispatch img/s, scan img/s, and the delta — both
walls are best-of-3 windows forced by one scalar fetch (the relay's
block_until_ready returns before execution; bench.py methodology).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from medseg_tpu.core import jax_cache
    jax_cache.enable_persistent_cache()

    from medseg_tpu.core.registry import get_model
    from medseg_tpu.ops.clip_prep import clip_preprocess
    from medseg_tpu.train import steps as S
    from medseg_tpu.train.freeze import finetune_filter, mask_from_predicate
    from medseg_tpu.train.losses import cross_entropy
    sys.path.insert(0, "/root/repo")
    from bench import _epoch_idx

    image_size = 224
    model = get_model("CLIP")["factory"]()
    tf_np = np.random.default_rng(1).standard_normal((3, 512)).astype(np.float32)
    tf_np /= np.linalg.norm(tf_np, axis=-1, keepdims=True)
    tf = jnp.asarray(tf_np)
    rng = jax.random.key(0)
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)), tf)
    mask = mask_from_predicate(variables["params"], finetune_filter("CLIP"))
    optimizer = S.build_optimizer(5e-6, 5e-4, 1.0, mask)

    # the EXACT step math of train/clip_finetune.py (rng-free)
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

    step = jax.jit(_step)

    def _scan_body(carry, images_u8, labels):
        p, o, loss, corr = _step(*carry, images_u8, labels)
        return (p, o), loss, corr

    drive = S.scan_epoch(_scan_body, split_rng=False, donate_carry=False)

    def run(batch: int, steps: int):
        n_data = batch * int(os.environ.get("SWEEP_NDATA_MULT", "4"))
        data = jax.device_put(np.random.default_rng(2).integers(
            0, 256, (n_data, 299, 299, 3), dtype=np.uint8))
        lab = jax.device_put(np.random.default_rng(3).integers(
            0, 3, (n_data,), dtype=np.int32))
        idx = _epoch_idx(n_data, batch, steps)
        params, opt_state = variables["params"], optimizer.init(
            variables["params"])

        t0 = time.perf_counter()
        step_c = step.lower(params, opt_state, data[:batch], lab[:batch]).compile()
        drive_c = drive.lower((params, opt_state), data, lab, idx).compile()
        print(f"[sweep] compile B={batch} K={steps}: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

        # the production per-step path is device-cached gather + step dispatch
        # per batch (BatchLoader.__iter__ device_cache branch) — reproduce it
        gather = jax.jit(lambda arr, i: jnp.take(arr, i, axis=0,
                                                 unique_indices=True))

        def wall_loop(params, opt_state):
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.float32)
            for i in range(steps):
                params, opt_state, loss, _ = step_c(
                    params, opt_state, gather(data, idx[i]), gather(lab, idx[i]))
                acc = acc + loss
            float(acc)
            return time.perf_counter() - t0, params, opt_state

        def wall_scan(params, opt_state):
            t0 = time.perf_counter()
            (params, opt_state), losses_k, _ = drive_c((params, opt_state),
                                                       data, lab, idx)
            float(losses_k.sum())
            return time.perf_counter() - t0, params, opt_state

        out = {}
        for name, wall in (("loop", wall_loop), ("scan", wall_scan)):
            _, p, o = wall(params, opt_state)  # warmup (remote staging)
            best = 1e18
            for _ in range(3):
                t, p, o = wall(p, o)
                best = min(best, t)
            out[name] = batch * steps / best
        return out

    cfgs = os.environ.get("SWEEP_CFGS", "32x30,64x30")
    for batch, steps in [tuple(map(int, c.split("x")))
                         for c in cfgs.split(",")]:
        try:
            r = run(batch, steps)
            print(f"B={batch} K={steps}: loop {r['loop']:.1f} img/s, "
                  f"scan {r['scan']:.1f} img/s "
                  f"({(r['scan'] / r['loop'] - 1) * 100:+.1f}%)", flush=True)
        except Exception as e:  # OOM at large B is an expected outcome
            print(f"B={batch} K={steps}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
