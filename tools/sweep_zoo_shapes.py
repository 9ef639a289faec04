"""Re-sweep the slow-zoo inference batch shapes (r5, VERDICT r4 weak #3).

The r4 scan-program sweep found 128-multiple batches matter for XLA's conv
batch tiling (B=96/192 collapse ~15% on ResNet18); the zoo section's
R2Unet/R2AttUnet (B=16) and AttentionUNet (B=64) shapes predate that lesson
(r2 per-dispatch sweep).  This A/Bs each slow model's inference forward at
B in {16,32,64,128} (bench.py zoo methodology: AOT compile, best-of-3
fetch-forced windows) so bench.py:ZOO either adopts a better shape or the
negative is recorded in PERF.md.

Usage (TPU, nohup):

    SWEEP_MODELS="R2Unet,R2AttUnet,AttentionUNet" SWEEP_BATCHES="16,32,64,128" \
        nohup python tools/sweep_zoo_shapes.py &
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

    size = int(os.environ.get("SWEEP_SIZE", "256"))
    steps = int(os.environ.get("SWEEP_STEPS", "10"))

    def one(name: str, batch: int) -> float:
        model = get_model(name)["factory"](dtype=jnp.bfloat16)
        rng = jax.random.key(0)
        variables = model.init({"params": rng, "dropout": rng},
                               jnp.zeros((1, size, size, 3), jnp.float32))
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        x = jax.device_put(np.random.default_rng(0).standard_normal(
            (batch, size, size, 3)).astype(np.float32))
        t0 = time.perf_counter()
        fwd_c = fwd.lower(variables, x).compile()
        print(f"[sweep] compile {name} B={batch}: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

        def wall(k):
            t0 = time.perf_counter()
            outs = [fwd_c(variables, x) for _ in range(k)]
            float(jnp.stack([o.astype(jnp.float32).sum() for o in outs]).sum())
            return time.perf_counter() - t0

        wall(2)  # warmup (remote staging)
        return batch * steps / min(wall(steps) for _ in range(3))

    models = os.environ.get("SWEEP_MODELS",
                            "R2Unet,R2AttUnet,AttentionUNet").split(",")
    batches = [int(b) for b in os.environ.get("SWEEP_BATCHES",
                                              "16,32,64,128").split(",")]
    for name in models:
        for b in batches:
            try:
                ips = one(name, b)
                print(f"{name} B={b}: {ips:.1f} img/s", flush=True)
            except Exception as e:  # OOM at large B is an expected outcome
                print(f"{name} B={b}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
