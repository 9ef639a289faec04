"""B/K sweep for the scan-epoch cls-train headline program (bench.py
bench_training's scan variant, identical math: fused aug + fwd + bwd +
AdamW via train/steps.scan_epoch).

Companion to sweep_scan_e2e.py — the shipping B=256 came from the r2 sweep
under the per-dispatch driver; the scan driver can prefer a different
(B, K).  Usage (TPU, nohup):

    SWEEP_CFGS="128x60,256x20" nohup python tools/sweep_scan_train.py ...

Prints one line per (B, K): img/s from best-of-3 walls (one scalar fetch
per window forces execution through the demand-driven relay).
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
    from medseg_tpu.train import steps as S
    from medseg_tpu.train.freeze import all_trainable
    sys.path.insert(0, "/root/repo")
    from bench import _epoch_idx

    size = 256
    model = get_model("ResNet18")["factory"](dtype=jnp.bfloat16)
    rng = jax.random.key(0)

    def prep(key, images_u8, labels):
        x, _ = augment_batch(key, images_u8, out_dtype=jnp.bfloat16)
        return x, labels

    def run(batch: int, steps: int) -> float:
        variables = model.init({"params": rng, "dropout": rng},
                               jnp.zeros((1, size, size, 3), jnp.float32))
        optimizer = S.build_optimizer(1e-6, 5e-4, 1.0,
                                      all_trainable(variables["params"]))
        body = S.cls_train_body(model, optimizer, 0.1, prep=prep)
        drive = S.scan_epoch(body)
        n_data = batch * int(os.environ.get("SWEEP_NDATA_MULT", "4"))
        data = jax.device_put(np.random.default_rng(2).integers(
            0, 256, (n_data, size, size, 3), dtype=np.uint8))
        lab = jax.device_put(np.random.default_rng(3).integers(
            0, 3, (n_data,), dtype=np.int32))
        idx = _epoch_idx(n_data, batch, steps)
        state = S.init_state(model, variables, optimizer)

        t0 = time.perf_counter()
        drive_c = drive.lower(state, data, lab, idx,
                              jax.random.key(0)).compile()
        print(f"[sweep] compile B={batch} K={steps}: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

        def wall(seed, state):
            t0 = time.perf_counter()
            outs = drive_c(state, data, lab, idx, jax.random.key(seed))
            state = outs[0]
            float(outs[2].sum())
            return time.perf_counter() - t0, state

        _, state = wall(0, state)  # warmup (first execution stages remotely)
        best = 1e18
        for r in range(3):
            t, state = wall(100 + r, state)
            best = min(best, t)
        return batch * steps / best

    cfgs = os.environ.get("SWEEP_CFGS",
                          "256x20,256x60,128x60,128x120,384x40,192x60")
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
