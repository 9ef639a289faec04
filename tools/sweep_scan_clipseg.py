"""Per-dispatch vs scan-epoch A/B for the CLIPSeg finetune step (r5).

Twin of tools/sweep_scan_finetune.py for the second perf-dark recipe
(VERDICT r4 weak #1): full CLIPSegModel (rd64-refined scale), decoder-only
optimizer mask, CombinedLoss on the 352 logit grid, device-side
clip_preprocess + mask resize from packed 256px uint8 — the exact step math
of train/clipseg_finetune.py (reference hot loop:
utils/clip_seg_finetuner.py:121-258).

Usage (TPU, nohup — never timeout-kill a mid-flight jax process):

    SWEEP_CFGS="8x16,16x16,32x16" nohup python tools/sweep_scan_clipseg.py &

Prints, per (B, K): per-dispatch img/s, scan img/s, and the delta — both
walls are best-of-3 windows forced by one scalar fetch (bench.py
methodology; the relay's block_until_ready returns before execution).
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
    from medseg_tpu.train.losses import combined_loss
    sys.path.insert(0, "/root/repo")
    from bench import _epoch_idx

    image_size = 352
    model = get_model("CLIPSeg")["factory"]()
    cond = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 512)).astype(np.float32))
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, image_size, image_size, 3)),
                           cond=cond)
    mask = mask_from_predicate(variables["params"], finetune_filter("CLIPSeg"))
    optimizer = S.build_optimizer(1e-5, 0.01, 1.0, mask)
    out_hw = jax.eval_shape(
        lambda p, x, c: model.apply({"params": p}, x, cond=c),
        variables["params"],
        jax.ShapeDtypeStruct((1, image_size, image_size, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 512), jnp.float32)).shape[1:]

    # the EXACT step math of train/clipseg_finetune.py (rng-free)
    def _step(params, opt_state, images_u8, masks_u8):
        def loss_fn(p):
            x = clip_preprocess(images_u8, image_size)
            m = masks_u8.astype(jnp.float32)[..., None] / 255.0
            m = jax.image.resize(m, (m.shape[0], out_hw[0], out_hw[1], 1),
                                 method="bilinear")[..., 0]
            c = jnp.broadcast_to(cond, (x.shape[0], cond.shape[-1]))
            logits = model.apply({"params": p}, x, cond=c)
            return combined_loss(logits, m, 0.5, 0.5)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    step = jax.jit(_step)

    def _scan_body(carry, images_u8, masks_u8):
        p, o, loss = _step(*carry, images_u8, masks_u8)
        return (p, o), loss

    drive = S.scan_epoch(_scan_body, split_rng=False, donate_carry=False)

    def run(batch: int, steps: int):
        n_data = batch * int(os.environ.get("SWEEP_NDATA_MULT", "4"))
        data = jax.device_put(np.random.default_rng(2).integers(
            0, 256, (n_data, 256, 256, 3), dtype=np.uint8))
        msk = jax.device_put((np.random.default_rng(3).random(
            (n_data, 256, 256)) > 0.5).astype(np.uint8) * 255)
        idx = _epoch_idx(n_data, batch, steps)
        params, opt_state = variables["params"], optimizer.init(
            variables["params"])

        t0 = time.perf_counter()
        step_c = step.lower(params, opt_state, data[:batch], msk[:batch]).compile()
        drive_c = drive.lower((params, opt_state), data, msk, idx).compile()
        print(f"[sweep] compile B={batch} K={steps}: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

        gather = jax.jit(lambda arr, i: jnp.take(arr, i, axis=0,
                                                 unique_indices=True))

        def wall_loop(params, opt_state):
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.float32)
            for i in range(steps):
                params, opt_state, loss = step_c(
                    params, opt_state, gather(data, idx[i]), gather(msk, idx[i]))
                acc = acc + loss
            float(acc)
            return time.perf_counter() - t0, params, opt_state

        def wall_scan(params, opt_state):
            t0 = time.perf_counter()
            (params, opt_state), losses_k = drive_c((params, opt_state),
                                                    data, msk, idx)
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

    cfgs = os.environ.get("SWEEP_CFGS", "8x16,16x16,32x16")
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
