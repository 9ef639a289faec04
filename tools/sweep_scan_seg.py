"""B/K sweep for the scan-epoch seg headline programs (bench.py's
bench_seg_e2e / bench_training_seg scan variants, identical math).

Modes (env SWEEP_MODE): "e2e" = ResNetUnet fwd + fused aug + threshold;
"train" = AttentionUNet fused aug + fwd + bwd + AdamW.  Companion to
sweep_scan_e2e.py / sweep_scan_train.py.  Usage (TPU, nohup):

    SWEEP_MODE=e2e SWEEP_CFGS="64x40,128x20" \
        nohup python tools/sweep_scan_seg.py > log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from medseg_tpu.core import jax_cache
    jax_cache.enable_persistent_cache()

    from medseg_tpu.core.registry import get_model
    from medseg_tpu.ops.augment import augment_batch
    sys.path.insert(0, "/root/repo")
    from bench import _epoch_idx

    size = 256
    mode = os.environ.get("SWEEP_MODE", "e2e")

    def run_e2e(batch: int, steps: int) -> float:
        model = get_model("ResNetUnet")["factory"](dtype=jnp.bfloat16)
        rng = jax.random.key(0)
        variables = model.init({"params": rng, "dropout": rng},
                               jnp.zeros((1, size, size, 3), jnp.float32))
        n_data = batch * int(os.environ.get("SWEEP_NDATA_MULT", "4"))
        data = jax.device_put(np.random.default_rng(2).integers(
            0, 256, (n_data, size, size, 3), dtype=np.uint8))
        msk_all = jax.device_put((np.random.default_rng(3).random(
            (n_data, size, size)) > 0.5).astype(np.uint8) * 255)
        idx = _epoch_idx(n_data, batch, steps)

        @jax.jit
        def scan_prog(variables, data, msk_all, idx, key):
            def one(carry, i):
                k, acc = carry
                k, kstep = jax.random.split(k)
                imgs = jnp.take(data, i, axis=0, unique_indices=True,
                                indices_are_sorted=True)
                msks = jnp.take(msk_all, i, axis=0, unique_indices=True,
                                indices_are_sorted=True)
                x, m = augment_batch(kstep, imgs, msks,
                                     out_dtype=jnp.bfloat16)
                logits = model.apply(variables, x)
                pred = jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
                acc = acc + pred.sum() + m.astype(jnp.float32).sum()
                return (k, acc), None

            (_, acc), _ = jax.lax.scan(
                one, (key, jnp.zeros((), jnp.float32)), idx)
            return acc

        t0 = time.perf_counter()
        compiled = scan_prog.lower(variables, data, msk_all, idx,
                                   jax.random.key(0)).compile()
        print(f"[sweep] compile B={batch} K={steps}: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

        def wall(seed):
            t0 = time.perf_counter()
            float(compiled(variables, data, msk_all, idx,
                           jax.random.key(seed)))
            return time.perf_counter() - t0

        wall(0)
        return batch * steps / min(wall(100 + r) for r in range(3))

    def run_train(batch: int, steps: int) -> float:
        from medseg_tpu.train import steps as S
        from medseg_tpu.train.freeze import finetune_filter, \
            mask_from_predicate

        model = get_model("AttentionUNet")["factory"](dtype=jnp.bfloat16)
        rng = jax.random.key(0)
        variables = model.init({"params": rng, "dropout": rng},
                               jnp.zeros((1, size, size, 3), jnp.float32))
        mask = mask_from_predicate(variables["params"],
                                   finetune_filter("AttentionUNet"))
        optimizer = S.build_optimizer(1e-6, 5e-4, 1.0, mask)

        def prep(key, images_u8, masks_u8):
            x, m = augment_batch(key, images_u8, masks_u8,
                                 out_dtype=jnp.bfloat16)
            return x, m

        body = S.seg_train_body(model, optimizer, prep=prep)
        drive = S.scan_epoch(body)
        n_data = batch * int(os.environ.get("SWEEP_NDATA_MULT", "4"))
        data = jax.device_put(np.random.default_rng(2).integers(
            0, 256, (n_data, size, size, 3), dtype=np.uint8))
        msk = jax.device_put((np.random.default_rng(3).random(
            (n_data, size, size)) > 0.5).astype(np.uint8) * 255)
        idx = _epoch_idx(n_data, batch, steps)
        state = S.init_state(model, variables, optimizer)

        t0 = time.perf_counter()
        drive_c = drive.lower(state, data, msk, idx,
                              jax.random.key(0)).compile()
        print(f"[sweep] compile B={batch} K={steps}: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

        def wall(seed, state):
            t0 = time.perf_counter()
            outs = drive_c(state, data, msk, idx, jax.random.key(seed))
            state = outs[0]
            float(outs[2].sum())
            return time.perf_counter() - t0, state

        _, state = wall(0, state)
        best = 1e18
        for r in range(3):
            t, state = wall(100 + r, state)
            best = min(best, t)
        return batch * steps / best

    run = run_e2e if mode == "e2e" else run_train
    default = "64x40,128x20,128x40,32x80" if mode == "e2e" \
        else "16x64,8x64,32x32"
    cfgs = os.environ.get("SWEEP_CFGS", default)
    for batch, steps in [tuple(map(int, c.split("x")))
                         for c in cfgs.split(",")]:
        try:
            rate = run(batch, steps)
            print(f"B={batch} K={steps}: {rate:.1f} img/s", flush=True)
        except Exception as e:  # OOM at large B is an expected outcome
            print(f"B={batch} K={steps}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
