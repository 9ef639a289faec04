#!/usr/bin/env python
"""End-to-end throughput benchmark: device-resident augment + infer at 256px.

Measures the BASELINE.json north-star metric — 256x256 images/sec/chip for
the full device pipeline (uint8 batch -> fused augmentation chain with the
Pallas gather-free warp -> ResNet18 bfloat16 forward -> prediction).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5000 (the >=5k img/s/chip target).

Timing notes: on the axon-tunneled TPU, `block_until_ready` returns before
execution (demand-driven); throughput is therefore measured as wall time of
K dispatched steps forced by a single scalar fetch, which bounds dispatch +
device time from above.  BENCH_SMALL=1 runs a tiny CPU smoke config.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    if small:
        jax.config.update("jax_platforms", "cpu")

    from medseg_tpu.core.registry import get_model
    from medseg_tpu.ops.augment import augment_batch

    batch = 32 if small else 256
    size = 64 if small else 256
    steps = 3 if small else 30
    warmup = 2 if small else 4

    model = get_model("ResNet18")["factory"](dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    init_x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, init_x)

    print(f"[bench] backend={jax.default_backend()} "
          f"devices={len(jax.devices())} batch={batch}", file=sys.stderr)

    @jax.jit
    def pipeline_step(variables, key, images_u8):
        x, _ = augment_batch(key, images_u8, out_dtype=jnp.bfloat16)
        logits = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1)

    images = jax.device_put(
        np.random.default_rng(0).integers(0, 256, (batch, size, size, 3),
                                          dtype=np.uint8))

    def wall(k: int, key0: int) -> float:
        t0 = time.perf_counter()
        outs = [pipeline_step(variables, jax.random.key(key0 + i), images)
                for i in range(k)]
        total = jnp.stack([o.sum().astype(jnp.float32) for o in outs]).sum()
        float(total)  # force full execution through the demand-driven runtime
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    wall(warmup, key0=0)
    print(f"[bench] compile+warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    best = min(wall(steps, key0=100), wall(steps, key0=200))
    imgs_per_sec = batch * steps / best

    result = {
        "metric": "images/sec/chip end-to-end (aug+infer, 256px, ResNet18 bf16)",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 5000.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
