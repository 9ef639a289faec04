"""Command-line interface for the framework.

One typed entry point replacing the reference's seven run-as-script modules
(utils/install_dataset.py, split_dataset.py, trainer.py, tester.py,
clip_finetuner.py, clip_seg_finetuner.py, demo/app.py):

  medseg install-data            # download Kaggle dataset (needs kagglehub)
  medseg split                   # seed-42 stratified 80/10/10 CSVs
  medseg pack                    # decode+resize into packed uint8 caches
  medseg train [MODELS...]       # train zoo models (default: the 8 CNNs)
  medseg eval                    # test all models -> summary + results CSVs
  medseg finetune-clip           # CLIP vision-tower finetune
  medseg finetune-clipseg        # CLIPSeg decoder finetune
  medseg demo                    # gradio web demo
  medseg bench                   # end-to-end throughput benchmark

Defaults reproduce the reference's hardcoded hyperparameters exactly.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from medseg_tpu.core.config import DataConfig, EvalConfig, TrainConfig

DEFAULT_TRAIN_MODELS = ["ResNet50", "ResNet18", "VGG16", "VGG19",
                        "ResNetUnet", "AttentionUNet", "R2Unet", "R2AttUnet"]


def _cmd_install_data(args):
    from medseg_tpu.data.install import install_dataset

    install_dataset(args.root)


def _cmd_split(args):
    from medseg_tpu.data.splits import generate_splits

    generate_splits(DataConfig(root=args.root,
                               splits_dir=f"{args.root}/splits"))


def _cmd_pack(args):
    from medseg_tpu.data.packed import pack_split, save_packed

    cfg = DataConfig(root=args.root, splits_dir=f"{args.root}/splits")
    for split in ("train", "val", "test"):
        for task in ("cls", "seg"):
            ds = pack_split(cfg, split, task)
            save_packed(ds, args.cache_dir, f"{split}_{task}")
            print(f"packed {split}/{task}: {len(ds)} samples")


def _loaders(cache_dir: str, task: str, batch_size: int, val_fraction: float,
             seed: int = 0, device_cache: bool = False,
             val_device_cache: bool | None = None):
    from medseg_tpu.data.loader import BatchLoader, split_train_val
    from medseg_tpu.data.packed import load_packed

    ds = load_packed(cache_dir, f"train_{task}")
    tr_idx, va_idx = split_train_val(len(ds), val_fraction, seed)
    train = BatchLoader(ds, batch_size, shuffle=True, seed=seed, indices=tr_idx,
                        device_cache=device_cache)
    # each cached loader device_puts the FULL packed split independently, so
    # callers that only need the train cache (the scan drivers) pass
    # val_device_cache=False to avoid holding a second whole-split copy in
    # HBM (r4 advisor)
    val = BatchLoader(ds, batch_size, shuffle=False, indices=va_idx,
                      device_cache=(device_cache if val_device_cache is None
                                    else val_device_cache))
    return train, val


def _mesh_if(args):
    """`--data-parallel` -> a 1-D mesh over all devices, else None.

    With MEDSEG_COORDINATOR set (see parallel/dist.py), the process joins
    the multi-host job first and the mesh spans every process's devices —
    the same pjit programs then scale over DCN with no other change."""
    if not getattr(args, "data_parallel", False):
        return None
    from medseg_tpu.parallel import data_parallel_mesh, initialize_from_env

    if initialize_from_env():
        import jax

        print(f"[INFO] multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}")
    mesh = data_parallel_mesh()
    print(f"[INFO] data-parallel over {mesh.size} devices")
    return mesh


def _cmd_train(args):
    from medseg_tpu.core.registry import get_model
    from medseg_tpu.train.trainer import train_model_resilient

    cfg = TrainConfig(epochs=args.epochs, lr=args.lr,
                      save_root=args.weights_root,
                      compute_dtype=args.dtype)
    mesh = _mesh_if(args)
    from medseg_tpu.utils import trace_context

    results = {}
    tasks = {}
    for name in args.models:
        task = get_model(name)["task"]
        tasks[name] = task
        seg = task == "segmentation"
        bs = args.batch_size or (cfg.seg_batch_size if seg else cfg.cls_batch_size)
        print(f"\n--- Training {task} model: {name} ---")
        # single-chip: keep the whole packed split HBM-resident (no per-step
        # H2D); mesh training keeps the host loader for sharded placement —
        # EXCEPT under --scan-chunk, whose driver needs the cache (it is
        # replicated across the mesh and each scanned step reshards its
        # gathered batch; train/steps.scan_epoch)
        train, val = _loaders(args.cache_dir, "seg" if seg else "cls", bs,
                              cfg.val_fraction,
                              device_cache=mesh is None or args.scan_chunk > 1)
        with trace_context(args.profile):
            res = train_model_resilient(name, train, val, cfg, mesh=mesh,
                                        resume=args.resume,
                                        scan_chunk=args.scan_chunk,
                                        max_restarts=args.auto_restart)
        results[name] = res.best_score

    print("\n\n=============== Training Summary ===============")
    # Same line formats as reference trainer.py:214-222, but selected by task
    # instead of name substring: the reference's `"Unet" in k` filter silently
    # drops AttentionUNet (capital N) from its own summary.
    for k, v in sorted(results.items()):
        if tasks[k] == "classification":
            print(f"{k:<15}: {v:.2f}% Acc (Classification)")
        else:
            print(f"{k:<15}: {v:.4f} Loss (Segmentation)")
    print("================================================")


def _cmd_eval(args):
    from medseg_tpu.data.loader import BatchLoader
    from medseg_tpu.data.packed import load_packed
    from medseg_tpu.eval import print_summary, save_results_to_csv, test_all_models

    cfg = EvalConfig(batch_size=args.batch_size, weights_root=args.weights_root,
                     results_dir=args.results_dir)
    cls_loader = seg_loader = None
    try:
        cls_loader = BatchLoader(load_packed(args.cache_dir, "test_cls"),
                                 cfg.batch_size, shuffle=False)
    except FileNotFoundError:
        print("[WARNING] Classification test cache not found; skipping.")
    try:
        seg_loader = BatchLoader(load_packed(args.cache_dir, "test_seg"),
                                 cfg.batch_size // 2, shuffle=False)
    except FileNotFoundError:
        print("[WARNING] Segmentation test cache not found; skipping.")
    results = test_all_models(cls_loader, seg_loader, cfg, mesh=_mesh_if(args))
    print_summary(results)
    cls_csv = f"{cfg.results_dir}/classification_test_results.csv"
    seg_csv = f"{cfg.results_dir}/segmentation_test_results.csv"
    save_results_to_csv(results, cls_csv, seg_csv)
    if args.compare:
        from pathlib import Path

        from medseg_tpu.eval.parity import compare_results_csv, format_parity_report

        for ours, ref_name in ((cls_csv, "classification_test_results.csv"),
                               (seg_csv, "segmentation_test_results.csv")):
            ref = Path(args.compare) / ref_name
            if Path(ours).exists() and ref.exists():
                print(f"\n=== Parity vs {ref} ===")
                format_parity_report(compare_results_csv(ours, str(ref)))


def _cmd_parity(args):
    """One-command real-data parity replay (readiness kit, VERDICT r1 #8):
    split -> pack the test split -> evaluate every model whose weights exist
    -> compare the produced CSVs against the reference's published
    results/*.csv.  Exits nonzero when any metric deviates beyond tolerance
    (reference ground truth: results/classification_test_results.csv:1-6,
    results/segmentation_test_results.csv:1-6)."""
    from pathlib import Path

    from medseg_tpu.data.loader import BatchLoader
    from medseg_tpu.data.packed import load_packed, pack_split, save_packed
    from medseg_tpu.data.splits import generate_splits
    from medseg_tpu.eval import print_summary, save_results_to_csv, test_all_models
    from medseg_tpu.eval.parity import compare_results_csv, format_parity_report

    data_cfg = DataConfig(root=args.root, splits_dir=f"{args.root}/splits")
    if not data_cfg.split_csv("test").exists():
        generate_splits(data_cfg)
    for task in ("cls", "seg"):
        if not (Path(args.cache_dir) / f"test_{task}_images.npy").exists():
            ds = pack_split(data_cfg, "test", task)
            save_packed(ds, args.cache_dir, f"test_{task}")
            print(f"packed test/{task}: {len(ds)} samples")

    cfg = EvalConfig(batch_size=args.batch_size, weights_root=args.weights_root,
                     results_dir=args.results_dir)
    cls_loader = BatchLoader(load_packed(args.cache_dir, "test_cls"),
                             cfg.batch_size, shuffle=False)
    seg_loader = BatchLoader(load_packed(args.cache_dir, "test_seg"),
                             max(1, cfg.batch_size // 2), shuffle=False)
    results = test_all_models(cls_loader, seg_loader, cfg)
    print_summary(results)
    cls_csv = f"{cfg.results_dir}/classification_test_results.csv"
    seg_csv = f"{cfg.results_dir}/segmentation_test_results.csv"
    save_results_to_csv(results, cls_csv, seg_csv)

    ok = True
    any_compared = False
    for ours, ref_name in ((cls_csv, "classification_test_results.csv"),
                           (seg_csv, "segmentation_test_results.csv")):
        ref = Path(args.reference) / ref_name
        if not (Path(ours).exists() and ref.exists()):
            continue
        any_compared = True
        print(f"\n=== Parity vs {ref} (tolerance {args.tolerance} pp) ===")
        report = compare_results_csv(ours, str(ref), tolerance=args.tolerance)
        format_parity_report(report)
        ok = ok and report["within_tolerance"]
    if not any_compared:
        print("[ERROR] nothing to compare: no produced/reference CSV pairs")
        raise SystemExit(2)
    print(f"\nPARITY {'PASS' if ok else 'FAIL'}")
    if not ok:
        raise SystemExit(1)


def _random_init_clip():
    """Real-scale CLIPClassifier at random init + random normalized prompt
    features — the offline stand-in for the HF pretrained tower (zero-egress
    environments: workflow certification, serving smoke).  Metrics from a
    run seeded this way are meaningless; the recipe, shapes, and checkpoint
    format are exactly the pretrained path's."""
    import jax
    import jax.numpy as jnp

    from medseg_tpu.core.config import CLIP_IMG_SIZE
    from medseg_tpu.core.registry import get_model

    print("[WARNING] --random-init: finetuning a RANDOMLY initialized CLIP "
          "(no HF weights; metrics will be meaningless — smoke/cert only)")
    model = get_model("CLIP")["factory"]()
    tf = np.random.default_rng(0).standard_normal((3, 512)).astype(np.float32)
    tf /= np.linalg.norm(tf, axis=-1, keepdims=True)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, CLIP_IMG_SIZE, CLIP_IMG_SIZE, 3), jnp.float32),
        jnp.asarray(tf))
    return variables, tf


def _random_init_clipseg():
    """Real-scale CLIPSegModel at random init + random conditional embedding
    (see _random_init_clip)."""
    import jax
    import jax.numpy as jnp

    from medseg_tpu.core.config import CLIPSEG_IMG_SIZE
    from medseg_tpu.core.registry import get_model

    print("[WARNING] --random-init: finetuning a RANDOMLY initialized "
          "CLIPSeg (no HF weights; metrics will be meaningless — "
          "smoke/cert only)")
    model = get_model("CLIPSeg")["factory"]()
    cond = np.random.default_rng(0).standard_normal((1, 512)).astype(np.float32)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, CLIPSEG_IMG_SIZE, CLIPSEG_IMG_SIZE, 3), jnp.float32),
        cond=jnp.asarray(cond))
    return variables, cond


def _cmd_finetune_clip(args):
    from medseg_tpu.core.config import CLIPFinetuneConfig
    from medseg_tpu.train.clip_finetune import finetune_clip

    cfg = CLIPFinetuneConfig(save_root=args.weights_root,
                             epochs=args.epochs,
                             **({"batch_size": args.batch_size}
                                if args.batch_size else {}))
    if args.random_init:
        variables, text_features = _random_init_clip()
    else:
        from medseg_tpu.interop.hf_pretrained import load_clip_classifier_pretrained

        variables, text_features = load_clip_classifier_pretrained()
    train, val = _loaders(args.cache_dir, "cls", cfg.batch_size, 0.1111,
                          device_cache=args.scan_chunk > 1,
                          val_device_cache=False)
    finetune_clip(train, val, variables, text_features, cfg,
                  mesh=_mesh_if(args), scan_chunk=args.scan_chunk)


def _cmd_finetune_clipseg(args):
    from medseg_tpu.core.config import CLIPSegFinetuneConfig
    from medseg_tpu.train.clipseg_finetune import finetune_clipseg

    cfg = CLIPSegFinetuneConfig(save_root=args.weights_root,
                                epochs=args.epochs,
                                **({"batch_size": args.batch_size}
                                   if args.batch_size else {}))
    if args.random_init:
        variables, cond = _random_init_clipseg()
    else:
        from medseg_tpu.interop.hf_pretrained import load_clipseg_pretrained

        variables, cond = load_clipseg_pretrained()
    train, val = _loaders(args.cache_dir, "seg", cfg.batch_size, 0.1111,
                          device_cache=args.scan_chunk > 1,
                          val_device_cache=False)
    finetune_clipseg(train, val, variables, cond, cfg, mesh=_mesh_if(args),
                     scan_chunk=args.scan_chunk)


def _cmd_demo(args):
    from medseg_tpu.apps.demo import launch_builtin_demo, launch_demo

    if args.builtin:
        launch_builtin_demo(host=args.host, port=args.port,
                            warmup=not args.no_warmup)
    else:
        launch_demo(share=args.share, host=args.host, port=args.port,
                    warmup=not args.no_warmup)


def _cmd_predict(args):
    import glob as _glob

    from medseg_tpu.core.config import EvalConfig
    from medseg_tpu.infer.batch import batch_predict

    paths = sorted(_glob.glob(f"{args.input}/*.png")
                   + _glob.glob(f"{args.input}/*.jpg"))
    if not paths:
        print(f"no images found under {args.input}")
        return
    batch_predict(paths, cls_name=args.cls_model, seg_name=args.seg_model,
                  cfg=EvalConfig(weights_root=args.weights_root),
                  batch_size=args.batch_size, output_dir=args.output)


def _cmd_export_torch(args):
    """Write a reference-format torch .pt from an orbax best checkpoint."""
    from pathlib import Path

    from medseg_tpu import interop
    from medseg_tpu.core.registry import get_model
    from medseg_tpu.train import checkpoint as ckpt

    name = args.model
    seg = get_model(name)["task"] == "segmentation"
    sub = "segmentation_models" if seg else "classification_models"
    variables = ckpt.load_best(str(Path(args.weights_root) / sub), name, seg)
    lname = name.lower()
    if lname == "resnet18":
        sd = interop.export_resnet_classifier(variables, 18)
    elif lname == "resnet50":
        sd = interop.export_resnet_classifier(variables, 50)
    elif lname == "vgg16":
        sd = interop.export_vgg_classifier(variables, 16)
    elif lname == "vgg19":
        sd = interop.export_vgg_classifier(variables, 19)
    elif lname == "resnetunet":
        sd = interop.export_resnet_unet(variables)
    elif lname == "attentionunet":
        sd = interop.export_attention_unet(variables)
    elif lname == "r2unet":
        sd = interop.export_r2u_net(variables, attention=False)
    elif lname == "r2attunet":
        sd = interop.export_r2u_net(variables, attention=True)
    else:
        raise SystemExit(f"no torch exporter for {name} (CLIP/CLIPSeg "
                         f"checkpoints are HF state dicts; convert via "
                         f"interop.hf_clip)")
    suffix = "best_loss" if seg else "best_acc"
    out = args.out or f"{name}_{suffix}.pt"
    interop.save_torch_checkpoint(sd, out)
    print(f"exported {len(sd)} tensors -> {out} "
          f"(loadable by the reference's tester/pipeline)")


def _cmd_serve(args):
    from medseg_tpu.core.config import EvalConfig
    from medseg_tpu.infer.server import InferenceServer

    server = InferenceServer(EvalConfig(weights_root=args.weights_root))
    if not args.no_warmup:
        server.warmup()
    server.serve(host=args.host, port=args.port)


def _cmd_bench(args):
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path("bench.py", run_name="__main__")


def main(argv=None):
    # Persistent XLA compilation cache: restarted serve/eval/train processes
    # skip recompiling programs they have built before (core/jax_cache.py has
    # the measured cold-vs-warm numbers; MEDSEG_JAX_CACHE=0 opts out).
    from medseg_tpu.core.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    # multi-host (DCN) jobs must join the coordinator BEFORE anything
    # touches the backend (probe, device query, computation); no-op unless
    # MEDSEG_COORDINATOR is set — see parallel/dist.py
    from medseg_tpu.parallel.dist import initialize_from_env

    initialize_from_env()

    p = argparse.ArgumentParser(prog="medseg")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **defaults):
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("--root", default="dataset")
        sp.add_argument("--cache-dir", default="dataset/packed")
        sp.add_argument("--weights-root", default="weights")
        sp.add_argument("--results-dir", default="results")
        return sp

    add("install-data", _cmd_install_data)
    add("split", _cmd_split)
    add("pack", _cmd_pack)
    sp = add("train", _cmd_train)
    sp.add_argument("models", nargs="*", default=DEFAULT_TRAIN_MODELS)
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--lr", type=float, default=1e-6)
    sp.add_argument("--batch-size", type=int, default=None)
    sp.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--auto-restart", type=int, default=2,
                    help="max automatic resume-restarts after transient "
                         "relay/transport runtime failures (0 disables)")
    sp.add_argument("--data-parallel", action="store_true",
                    help="shard batches over all devices (Mesh('data'))")
    sp.add_argument("--scan-chunk", type=int, default=0,
                    help="run K train steps per dispatched program "
                         "(lax.scan over the HBM dataset cache; exact same "
                         "math/RNG stream — removes the relay's per-dispatch "
                         "floor; composes with --data-parallel)")
    sp.add_argument("--profile", default=None,
                    help="jax.profiler trace directory (TensorBoard-loadable)")
    sp = add("eval", _cmd_eval)
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--compare", default=None,
                    help="directory of reference results CSVs for parity replay")
    sp.add_argument("--data-parallel", action="store_true",
                    help="shard eval batches over all devices (Mesh('data'); "
                         "ragged tails pad+trim, metrics unchanged)")
    sp = add("parity", _cmd_parity)
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--reference", default="/root/reference/results",
                    help="directory with the reference's published results CSVs")
    sp.add_argument("--tolerance", type=float, default=0.5,
                    help="max |delta| in percentage points")
    for ft_name, ft_fn in (("finetune-clip", _cmd_finetune_clip),
                           ("finetune-clipseg", _cmd_finetune_clipseg)):
        sp = add(ft_name, ft_fn)
        sp.add_argument("--data-parallel", action="store_true",
                        help="shard batches over all devices (Mesh('data'))")
        sp.add_argument("--scan-chunk", type=int, default=0,
                        help="run K finetune steps per dispatched program "
                             "(lax.scan over the HBM dataset cache; the step "
                             "is rng-free so the scanned epoch is exact)")
        sp.add_argument("--epochs", type=int, default=20)
        sp.add_argument("--batch-size", type=int, default=None)
        sp.add_argument("--random-init", action="store_true",
                        help="skip the HF pretrained load and finetune a "
                             "randomly initialized real-scale tower (offline "
                             "smoke/certification; metrics are meaningless)")
    sp = add("demo", _cmd_demo)
    sp.add_argument("--share", action="store_true")
    sp.add_argument("--builtin", action="store_true",
                    help="force the gradio-free builtin web UI")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=7860)
    sp.add_argument("--no-warmup", action="store_true")
    sp = add("export-torch", _cmd_export_torch)
    sp.add_argument("model")
    sp.add_argument("--out", default=None)
    sp = add("predict", _cmd_predict)
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", default="predictions")
    sp.add_argument("--cls-model", default="ResNet18")
    sp.add_argument("--seg-model", default="ResNetUnet")
    sp.add_argument("--batch-size", type=int, default=64)
    sp = add("serve", _cmd_serve)
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8000)
    sp.add_argument("--no-warmup", action="store_true",
                    help="skip compiling the default model pair at startup")
    add("bench", _cmd_bench)

    args = p.parse_args(argv)
    # Device-touching commands get a bounded backend-init retry: the relay's
    # device-claim wedge clears in ~10 min and would otherwise kill the run
    # at import-adjacent depth with an opaque RuntimeError (the exact failure
    # that ate BENCH_r03).  Pure-host commands skip it.
    # "bench" is excluded: bench.py pins its own platform (BENCH_SMALL=1
    # forces CPU after this point, which an already-initialized backend
    # would silently ignore) and runs its own guarded init retry.
    if args.cmd not in ("install-data", "split", "pack", "bench"):
        from medseg_tpu.core.errors import (force_cpu_if_requested,
                                            init_backend_with_retry)

        # honor JAX_PLATFORMS=cpu: the axon sitecustomize overrides it to
        # "axon,cpu" at startup, which would dial the relay even for runs
        # the user explicitly pinned to CPU (observed hanging in r4)
        force_cpu_if_requested()
        attempts = int(os.environ.get("MEDSEG_INIT_RETRIES", "4"))
        init_backend_with_retry(attempts, log=print)
    args.fn(args)


if __name__ == "__main__":
    main()
