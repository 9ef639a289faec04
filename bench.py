#!/usr/bin/env python
"""End-to-end throughput benchmark: device-resident augment + infer at 256px.

Measures the BASELINE.json north-star metric — 256x256 images/sec/chip for
the full device pipeline (uint8 batch -> fused augmentation chain -> model
forward -> prediction) on the flagship classifier (ResNet18, bfloat16).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5000 (the >=5k img/s/chip target).

Runs on whatever backend JAX selects (the real TPU chip under the driver;
CPU with BENCH_SMALL=1 for smoke-testing).
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

    batch = 64 if small else 512
    size = 64 if small else 256
    steps = 3 if small else 30
    warmup = 1 if small else 5

    model = get_model("ResNet18")["factory"](dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    init_x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, init_x)

    devs = jax.devices()
    print(f"[bench] backend={jax.default_backend()} devices={len(devs)}",
          file=sys.stderr)

    @jax.jit
    def pipeline_step(variables, key, images_u8):
        x, _ = augment_batch(key, images_u8, out_dtype=jnp.bfloat16)
        logits = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1)

    images = jax.device_put(
        np.random.default_rng(0).integers(0, 256, (batch, size, size, 3),
                                          dtype=np.uint8))
    keys = [jax.random.key(i) for i in range(steps + warmup)]

    # compile + warmup
    t0 = time.perf_counter()
    for i in range(warmup):
        pipeline_step(variables, keys[i], images).block_until_ready()
    print(f"[bench] compile+warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    out = None
    for i in range(steps):
        out = pipeline_step(variables, keys[warmup + i], images)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * steps / dt
    per_chip = imgs_per_sec  # single-chip program; per-chip == total here
    result = {
        "metric": "images/sec/chip end-to-end (aug+infer, 256px, ResNet18 bf16)",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / 5000.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
