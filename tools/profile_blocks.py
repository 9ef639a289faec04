"""Isolated hardware A/B of the r4 block experiments (run on the TPU).

Measures, at the exact shapes of the r3 per-block profile (PERF.md
"Segmentation backward", B=64):

- up2       : UpConv(64) on [B,128,128,128]   vs UpConvS2D      (0x FLOP delta)
- conv1     : DoubleConv(64) on [B,256,256,3] vs DoubleConvS2D  (4x FLOPs)
- up_conv2  : DoubleConv(64) on [B,256,256,128] vs DoubleConvS2D(4x FLOPs)
- att2 gate : AttentionGate(32) fused_stats True vs False (g,x [B,256,256,64])

Timing follows bench.py's relay methodology: AOT compile, post-compile
warmup, best-of-3 K-step windows forced by ONE scalar fetch.  fwd and
fwd+bwd (grads wrt params of a mean-square loss, train=True so BN batch
stats are live) are reported separately.

Usage:  nohup python tools/profile_blocks.py [exp ...] > /tmp/blocks.log 2>&1 &
        (exps default to all of: up2 conv1 up_conv2 gate; B via BLOCKS_B.
         Full-step modes: segstep — AttentionUNet train-step A/B of
         s2d_up/fused_gates/identity-gate, SEGSTEP_B; upt — ResNetUnet
         seg_e2e + train-step A/B of up_as_dot, UPT_E2E_B/UPT_TRAIN_B;
         resnetunet — decoder-block eval-fwd profile)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(name, fn, args, k=8, windows=3):
    compiled = fn.lower(*args).compile()
    t0 = time.perf_counter()
    float(jnp.asarray(compiled(*args)).astype(jnp.float32).sum())
    print(f"  [{name}] first exec {time.perf_counter() - t0:.1f}s",
          flush=True)

    def wall():
        t0 = time.perf_counter()
        outs = [compiled(*args) for _ in range(k)]
        total = jnp.stack([jnp.asarray(o).astype(jnp.float32).sum()
                           for o in outs]).sum()
        float(total)
        return time.perf_counter() - t0

    wall()  # warmup window
    best = min(wall() for _ in range(windows))
    ms = best / k * 1e3
    print(f"  [{name}] {ms:.2f} ms/step (best of {windows}, K={k})",
          flush=True)
    return ms


def _fwd_and_fb(label, module, variables, inputs):
    """Report fwd and fwd+bwd ms for `module.apply(variables, *inputs,
    train=True)` with params/batch_stats as jit ARGUMENTS."""

    @jax.jit
    def fwd(params, stats, *xs):
        out, _ = module.apply({"params": params, "batch_stats": stats},
                              *xs, train=True, mutable=["batch_stats"])
        return out.astype(jnp.float32).mean()

    @jax.jit
    def fb(params, stats, *xs):
        def loss(p):
            out, _ = module.apply({"params": p, "batch_stats": stats},
                                  *xs, train=True, mutable=["batch_stats"])
            return (out.astype(jnp.float32) ** 2).mean()
        l, g = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(x).astype(jnp.float32)
                       for x in jax.tree_util.tree_leaves(g))

    args = (variables["params"], variables["batch_stats"]) + tuple(inputs)
    f = _measure(f"{label} fwd", fwd, args)
    b = _measure(f"{label} f+b", fb, args)
    return f, b


def main():
    from medseg_tpu.nn.blocks import AttentionGate, DoubleConv, UpConv
    from medseg_tpu.nn.s2d import DoubleConvS2D, UpConvS2D

    exps = sys.argv[1:] or ["up2", "conv1", "up_conv2", "gate"]
    b = int(os.environ.get("BLOCKS_B", "64"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={b}", flush=True)
    results = {}

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape), dt)

    if "up2" in exps:
        x = rand(b, 128, 128, 128)
        plain, s2d = UpConv(64, dtype=dt), UpConvS2D(64, dtype=dt)
        v = plain.init(jax.random.key(0), x)
        print("== up2: UpConv(64) [B,128,128,128] -> 256px ==", flush=True)
        results["up2_plain"] = _fwd_and_fb("plain", plain, v, (x,))
        results["up2_s2d"] = _fwd_and_fb("s2d  ", s2d, v, (x,))

    if "conv1" in exps:
        x = rand(b, 256, 256, 3)
        plain, s2d = DoubleConv(64, dtype=dt), DoubleConvS2D(64, dtype=dt)
        v = plain.init(jax.random.key(0), x)
        print("== conv1: DoubleConv(64) [B,256,256,3] ==", flush=True)
        results["conv1_plain"] = _fwd_and_fb("plain", plain, v, (x,))
        results["conv1_s2d"] = _fwd_and_fb("s2d  ", s2d, v, (x,))

    if "up_conv2" in exps:
        x = rand(b, 256, 256, 128)
        plain, s2d = DoubleConv(64, dtype=dt), DoubleConvS2D(64, dtype=dt)
        v = plain.init(jax.random.key(0), x)
        print("== up_conv2: DoubleConv(64) [B,256,256,128] ==", flush=True)
        results["up_conv2_plain"] = _fwd_and_fb("plain", plain, v, (x,))
        results["up_conv2_s2d"] = _fwd_and_fb("s2d  ", s2d, v, (x,))

    if "gate" in exps:
        g = rand(b, 256, 256, 64)
        x = rand(b, 256, 256, 64)
        # fused_stats must be explicit: the r4 hardware A/B flipped the
        # class default to False, so relying on the default here would
        # silently time the plain lowering twice
        fused = AttentionGate(32, dtype=dt, fused_stats=True)
        plain = AttentionGate(32, dtype=dt, fused_stats=False)
        v = plain.init(jax.random.key(0), g, x)
        print("== att2: AttentionGate(32) g,x [B,256,256,64] ==", flush=True)
        results["gate_plain"] = _fwd_and_fb("plain", plain, v, (g, x))
        results["gate_fused"] = _fwd_and_fb("fused", fused, v, (g, x))

    if "segstep" in exps:
        # End-to-end AttentionUNet train step (fused aug + fwd + bwd + AdamW,
        # bench.py's exact config and window methodology): the adoption
        # decision for model-level lowerings (s2d_up, fused gates) is made on
        # THIS number — block isolation over-weights the shallow blocks.
        import numpy as _np

        from medseg_tpu.core.registry import get_model
        from medseg_tpu.ops.augment import augment_batch
        from medseg_tpu.train import steps as S
        from medseg_tpu.train.freeze import finetune_filter, \
            mask_from_predicate

        batch = int(os.environ.get("SEGSTEP_B", "16"))
        steps, size = 16, 256
        variants = [("base   ", dict()),  # shipped defaults
                    ("s2d_on ", dict(s2d_up=True)),
                    ("fused  ", dict(fused_gates=True)),
                    # diagnostic upper bound: gates replaced by identity —
                    # the most ANY gate lowering could save in-graph
                    ("nogate ", dict(_nogate=True))]

        from flax import linen as fnn

        import medseg_tpu.models.attention_unet as AU

        class _IdentityGate(fnn.Module):
            f_int: int
            dtype: jnp.dtype = jnp.float32
            fused_stats: bool = True

            @fnn.compact
            def __call__(self, g, x, train=False):
                return x

        _orig_gate = AU.AttentionGate
        images = jnp.asarray(_np.random.default_rng(0).integers(
            0, 256, (batch, size, size, 3), dtype=_np.uint8))
        masks = jnp.asarray((_np.random.default_rng(1).random(
            (batch, size, size)) > 0.5).astype(_np.uint8) * 255)
        print(f"== AttentionUNet full train step, B={batch} ==", flush=True)
        for label, kw in variants:
            AU.AttentionGate = _IdentityGate if kw.pop("_nogate", False) \
                else _orig_gate
            model = get_model("AttentionUNet")["factory"](
                dtype=jnp.bfloat16, **kw)
            rng = jax.random.key(0)
            variables = model.init(
                {"params": rng, "dropout": rng},
                jnp.zeros((1, size, size, 3), jnp.float32))
            mask = mask_from_predicate(variables["params"],
                                       finetune_filter("AttentionUNet"))
            optimizer = S.build_optimizer(1e-4, 5e-4, 1.0, mask)
            state = S.init_state(model, variables, optimizer)

            def prep(key, imgs, msks):
                return augment_batch(key, imgs, msks,
                                     out_dtype=jnp.bfloat16)

            train_step = S.make_seg_train_step(model, optimizer, prep=prep)

            def run(k, key0, state):
                t0 = time.perf_counter()
                acc = jnp.zeros((), jnp.float32)
                for i in range(k):
                    state, loss = train_step(
                        state, images, masks, jax.random.key(key0 + i),
                        jax.random.key(key0 + 10_000 + i))
                    acc = acc + loss
                float(acc)
                return time.perf_counter() - t0, state

            t0 = time.perf_counter()
            _, state = run(2, 0, state)
            print(f"  [{label}] compile+warmup "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            best = 1e18
            for r in range(3):
                t, state = run(steps, 100 + 50 * r, state)
                best = min(best, t)
            ms = best / steps * 1e3
            results[f"segstep_{label.strip()}"] = (float("nan"), ms)
            print(f"  [{label}] {ms:.1f} ms/step = "
                  f"{batch * steps / best:.1f} img/s", flush=True)
        AU.AttentionGate = _orig_gate

    if "upt" in exps:
        # Full-step A/B for the ConvT2x2AsDot lowering (resnet_unet.py):
        # (a) bench.py's exact seg_e2e recipe (fused 4-plane aug +
        # ResNetUnet bf16 fwd + threshold, B=128) and (b) the ResNetUnet
        # train step (frozen encoder, fused aug + fwd + bwd + AdamW).
        # Standing rule: the adoption decision is made on THESE numbers.
        import numpy as _np

        from medseg_tpu.core.registry import get_model
        from medseg_tpu.ops.augment import augment_batch
        from medseg_tpu.train import steps as S
        from medseg_tpu.train.freeze import finetune_filter, \
            mask_from_predicate

        size = 256
        be = int(os.environ.get("UPT_E2E_B", "128"))
        bt = int(os.environ.get("UPT_TRAIN_B", "32"))
        img_e = jnp.asarray(_np.random.default_rng(0).integers(
            0, 256, (be, size, size, 3), dtype=_np.uint8))
        msk_e = jnp.asarray((_np.random.default_rng(1).random(
            (be, size, size)) > 0.5).astype(_np.uint8) * 255)
        # independent tensors sized bt: slicing img_e[:bt] would silently
        # clamp to be rows when UPT_TRAIN_B > UPT_E2E_B and inflate img/s
        img_t = jnp.asarray(_np.random.default_rng(2).integers(
            0, 256, (bt, size, size, 3), dtype=_np.uint8))
        msk_t = jnp.asarray((_np.random.default_rng(3).random(
            (bt, size, size)) > 0.5).astype(_np.uint8) * 255)

        for label, kw in [("plain", dict()), ("asdot", dict(up_as_dot=True))]:
            model = get_model("ResNetUnet")["factory"](
                dtype=jnp.bfloat16, **kw)
            rng = jax.random.key(0)
            variables = model.init(
                {"params": rng, "dropout": rng},
                jnp.zeros((1, size, size, 3), jnp.float32))

            print(f"== ResNetUnet seg_e2e ({label}), B={be} ==", flush=True)

            @jax.jit
            def e2e(variables, key, images_u8, masks_u8):
                x, m = augment_batch(key, images_u8, masks_u8,
                                     out_dtype=jnp.bfloat16)
                logits = model.apply(variables, x)
                pred = jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
                return (pred.sum() + m.astype(jnp.float32).sum()
                        ).astype(jnp.float32)

            def wall_e2e(k, key0):
                t0 = time.perf_counter()
                outs = [e2e_c(variables, jax.random.key(key0 + i),
                              img_e, msk_e) for i in range(k)]
                float(jnp.stack(outs).sum())
                return time.perf_counter() - t0

            e2e_c = e2e.lower(variables, jax.random.key(0),
                              img_e, msk_e).compile()
            t0 = time.perf_counter()
            wall_e2e(2, 0)
            print(f"  [{label}] first exec+warmup "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            best = min(wall_e2e(10, 100 + 50 * r) for r in range(3))
            results[f"upt_e2e_{label}"] = (best / 10 * 1e3, float("nan"))
            print(f"  [{label}] {best / 10 * 1e3:.1f} ms/step = "
                  f"{be * 10 / best:.1f} img/s", flush=True)

            print(f"== ResNetUnet train step ({label}), B={bt} ==",
                  flush=True)
            mask = mask_from_predicate(variables["params"],
                                       finetune_filter("ResNetUnet"))
            optimizer = S.build_optimizer(1e-4, 5e-4, 1.0, mask)
            state = S.init_state(model, variables, optimizer)

            def prep(key, imgs, msks):
                return augment_batch(key, imgs, msks, out_dtype=jnp.bfloat16)

            train_step = S.make_seg_train_step(model, optimizer, prep=prep)

            def wall_tr(k, key0, state):
                t0 = time.perf_counter()
                acc = jnp.zeros((), jnp.float32)
                for i in range(k):
                    state, loss = train_step(
                        state, img_t, msk_t, jax.random.key(key0 + i),
                        jax.random.key(key0 + 10_000 + i))
                    acc = acc + loss
                float(acc)
                return time.perf_counter() - t0, state

            t0 = time.perf_counter()
            _, state = wall_tr(2, 0, state)
            print(f"  [{label}] compile+warmup "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            best, steps_ = 1e18, 16
            for r in range(3):
                t, state = wall_tr(steps_, 100 + 50 * r, state)
                best = min(best, t)
            results[f"upt_train_{label}"] = (float("nan"),
                                             best / steps_ * 1e3)
            print(f"  [{label}] {best / steps_ * 1e3:.1f} ms/step = "
                  f"{bt * steps_ / best:.1f} img/s", flush=True)

    if "r2attu" in exps:
        # Per-block MFU decomposition of R2AttU-Net's step (VERDICT r4 weak
        # #3: the model-level 52%-of-peak number existed since r2, but no
        # block breakdown — is it gates, recurrences, or resolution tiers
        # that hold it under R2U's 55%?).  FLOPs are XLA-counted per program
        # (compiled.cost_analysis), MFU vs the v5e's ~197 TFLOP/s bf16 peak.
        from medseg_tpu.nn.blocks import RRCNNBlock

        PEAK = 197e12

        def _mfu_pair(label, module, variables, inputs):
            @jax.jit
            def fwd(params, stats, *xs):
                out, _ = module.apply({"params": params, "batch_stats": stats},
                                      *xs, train=True, mutable=["batch_stats"])
                return out.astype(jnp.float32).mean()

            @jax.jit
            def fb(params, stats, *xs):
                def loss(p):
                    out, _ = module.apply(
                        {"params": p, "batch_stats": stats},
                        *xs, train=True, mutable=["batch_stats"])
                    return (out.astype(jnp.float32) ** 2).mean()
                l, g = jax.value_and_grad(loss)(params)
                return l + sum(jnp.sum(x).astype(jnp.float32)
                               for x in jax.tree_util.tree_leaves(g))

            args = (variables["params"], variables["batch_stats"]) + tuple(inputs)
            out = []
            for tag, fn in (("fwd", fwd), ("f+b", fb)):
                compiled = fn.lower(*args).compile()
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops = float(ca.get("flops", float("nan")))
                t0 = time.perf_counter()
                float(jnp.asarray(compiled(*args)).astype(jnp.float32).sum())
                print(f"  [{label} {tag}] first exec "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)

                def wall(k=8):
                    t0 = time.perf_counter()
                    outs = [compiled(*args) for _ in range(k)]
                    float(jnp.stack([jnp.asarray(o).astype(jnp.float32).sum()
                                     for o in outs]).sum())
                    return time.perf_counter() - t0

                wall()
                ms = min(wall() for _ in range(3)) / 8 * 1e3
                mfu = flops / (ms / 1e3) / PEAK * 100.0
                print(f"  [{label} {tag}] {ms:.2f} ms  "
                      f"{flops / 1e9:.1f} GFLOP  {mfu:.1f}% peak", flush=True)
                out.append((ms, mfu))
            results[f"r2attu_{label}"] = (out[0][0], out[1][0])
            return out

        rb = int(os.environ.get("R2ATTU_B", "16"))
        t_rec = 5
        print(f"== R2AttU-Net t=5 per-block profile (B={rb}, bf16) ==",
              flush=True)
        blocks = [
            ("rrcnn1", RRCNNBlock(64, t=t_rec, dtype=dt), (rb, 256, 256, 3)),
            ("rrcnn2", RRCNNBlock(128, t=t_rec, dtype=dt), (rb, 128, 128, 64)),
            ("rrcnn3", RRCNNBlock(256, t=t_rec, dtype=dt), (rb, 64, 64, 128)),
            ("rrcnn4", RRCNNBlock(512, t=t_rec, dtype=dt), (rb, 32, 32, 256)),
            ("rrcnn5", RRCNNBlock(1024, t=t_rec, dtype=dt), (rb, 16, 16, 512)),
            ("up_rrcnn5", RRCNNBlock(512, t=t_rec, dtype=dt), (rb, 32, 32, 1024)),
            ("up_rrcnn4", RRCNNBlock(256, t=t_rec, dtype=dt), (rb, 64, 64, 512)),
            ("up_rrcnn3", RRCNNBlock(128, t=t_rec, dtype=dt), (rb, 128, 128, 256)),
            ("up_rrcnn2", RRCNNBlock(64, t=t_rec, dtype=dt), (rb, 256, 256, 128)),
            ("up5", UpConv(512, dtype=dt), (rb, 16, 16, 1024)),
            ("up4", UpConv(256, dtype=dt), (rb, 32, 32, 512)),
            ("up3", UpConv(128, dtype=dt), (rb, 64, 64, 256)),
            ("up2", UpConv(64, dtype=dt), (rb, 128, 128, 128)),
        ]
        for label, mod, shape in blocks:
            x = rand(*shape)
            v = mod.init(jax.random.key(0), x)
            if "batch_stats" not in v:
                v = {"params": v["params"], "batch_stats": {}}
            _mfu_pair(label, mod, v, (x,))
        # the four attention gates (d, gated-skip pairs per decoder stage)
        gates = [("att5", 256, (rb, 32, 32, 512)),
                 ("att4", 128, (rb, 64, 64, 256)),
                 ("att3", 64, (rb, 128, 128, 128)),
                 ("att2", 32, (rb, 256, 256, 64))]
        for label, f_int, shape in gates:
            gx, xx = rand(*shape), rand(*shape)
            mod = AttentionGate(f_int, dtype=dt, fused_stats=False)
            v = mod.init(jax.random.key(0), gx, xx)
            _mfu_pair(label, mod, v, (gx, xx))
        # whole-model check: the sum of blocks should land near this
        from medseg_tpu.core.registry import get_model

        whole = get_model("R2AttUnet")["factory"](dtype=dt)
        xw = rand(rb, 256, 256, 3)
        vw = whole.init({"params": jax.random.key(0)}, xw)
        _mfu_pair("WHOLE", whole, vw, (xw,))

    if "resnetunet" in exps:
        # eval-mode fwd profile of the seg-e2e headline model's decoder tail
        # (encoder is 73% MXU-bound per the r2 zoo profile; the question is
        # where the decoder's time goes at 256px / low channel counts)
        from medseg_tpu.models.resnet_unet import DecoderBlock

        taps = {"e1": (128, 64), "e2": (64, 256), "e3": (32, 512),
                "e4": (16, 1024), "e5": (8, 2048)}
        feats = {"decoder5": (1024, "e5", "e4"), "decoder4": (512, "d5", "e3"),
                 "decoder3": (256, "d4", "e2"), "decoder2": (64, "d3", "e1")}
        shapes = dict(taps)
        shapes["d5"] = (16, 1024)
        shapes["d4"] = (32, 512)
        shapes["d3"] = (64, 256)
        print("== ResNetUnet decoder blocks (eval fwd, B=%d) ==" % b,
              flush=True)
        for name, (f, down, skip) in feats.items():
            hs, cd = shapes[down]
            hk, ck = shapes[skip]
            blk = DecoderBlock(f, dtype=dt)
            xd, xk = rand(b, hs, hs, cd), rand(b, hk, hk, ck)
            v = blk.init(jax.random.key(0), xd, xk)

            @jax.jit
            def fwd(params, stats, xd, xk):
                out = blk.apply({"params": params, "batch_stats": stats},
                                xd, xk, train=False)
                return out.astype(jnp.float32).mean()

            ms = _measure(name, fwd,
                          (v["params"], v["batch_stats"], xd, xk))
            results[name] = (ms, float("nan"))

    print("\nsummary (fwd ms, f+b ms):", flush=True)
    for k, (f, fb_) in results.items():
        print(f"  {k:16s} {f:8.2f} {fb_:8.2f}", flush=True)


if __name__ == "__main__":
    from medseg_tpu.core.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    main()
