"""B/K sweep for the scan-epoch e2e headline program (bench.py
bench_inference's scan variant, identical math).

The shipping B=384 was chosen by the r2 sweep under the OLD per-dispatch
driver, where per-step dispatch/fetch overhead favored larger batches.  The
scan driver amortizes dispatch to zero, so the optimum can move — this
re-runs the sweep under the scan program.  Usage (TPU, nohup):

    nohup python tools/profile... sweep_scan_e2e.py > sweep.log 2>&1 &

Prints one line per (B, K): img/s from best-of-3 walls, relay-aware
(single scalar fetch forces execution).
"""
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
    model = get_model("ResNet18")["factory"](dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    init_x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, init_x)

    def run(batch: int, steps: int) -> float:
        import os
        n_data = batch * int(os.environ.get("SWEEP_NDATA_MULT", "4"))
        data = jax.device_put(np.random.default_rng(2).integers(
            0, 256, (n_data, size, size, 3), dtype=np.uint8))
        idx = _epoch_idx(n_data, batch, steps)

        @jax.jit
        def scan_prog(variables, data, idx, key):
            def one(carry, i):
                k, acc = carry
                k, kstep = jax.random.split(k)
                x, _ = augment_batch(
                    kstep,
                    jnp.take(data, i, axis=0, unique_indices=True,
                             indices_are_sorted=True),
                    out_dtype=jnp.bfloat16)
                logits = model.apply(variables, x)
                acc = acc + jnp.argmax(logits, -1).sum().astype(jnp.float32)
                return (k, acc), None

            (_, acc), _ = jax.lax.scan(
                one, (key, jnp.zeros((), jnp.float32)), idx)
            return acc

        t0 = time.perf_counter()
        compiled = scan_prog.lower(variables, data, idx,
                                   jax.random.key(0)).compile()
        print(f"[sweep] compile B={batch} K={steps}: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

        def wall(seed):
            t0 = time.perf_counter()
            float(compiled(variables, data, idx, jax.random.key(seed)))
            return time.perf_counter() - t0

        wall(0)  # warmup (first execution stages server-side)
        best = min(wall(100 + r) for r in range(3))
        return batch * steps / best

    import os
    cfgs = os.environ.get("SWEEP_CFGS",
                          "256x30,384x30,512x30,768x30,384x60,512x60,"
                          "256x60")
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
