"""Batched offline inference: the cascade at TPU batch scale.

The reference's Pipeline processes one PIL image per call
(utils/pipeline.py:359); this runner drives the same classify ->
COVID-gate -> segment cascade over a directory of images with batched,
jit-compiled forwards: images decode+resize through the packed-cache
machinery (native loader when built), every batch runs one classification
forward, and segmentation runs batched too (all images — keeping shapes
static is cheaper on TPU than gathering the dynamic COVID subset); overlays
are only rendered/written for COVID predictions, preserving the gate's
observable behavior.

Outputs: predictions.csv (filename, prediction, confidence) and
<name>_overlay.png per COVID case.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medseg_tpu.core.config import (CLASSES, CLIP_IMG_SIZE, CLIPSEG_IMG_SIZE,
                                    IMG_SIZE, EvalConfig)
from medseg_tpu.core.registry import get_model
from medseg_tpu.eval.harness import load_model_bundle
from medseg_tpu.infer.overlay import red_overlay
from medseg_tpu.ops.augment import preprocess_eval_batch
from medseg_tpu.ops.clip_prep import clip_preprocess


def batch_predict(
    image_paths: List[str],
    cls_name: str = "ResNet18",
    seg_name: str = "ResNetUnet",
    cfg: EvalConfig = EvalConfig(),
    batch_size: int = 64,
    overlay_opacity: float = 0.5,
    output_dir: Optional[str] = None,
    log: Callable[[str], None] = print,
):
    """Returns a list of dicts {file, prediction, confidence, overlay_path}."""
    from medseg_tpu.data.packed import _decode_rgb, _resize_u8

    cls_entry = get_model(cls_name)
    cls_model = cls_entry["factory"]()
    cls_bundle = load_model_bundle(cls_name, cfg.weights_root, seg=False)
    if cls_bundle is None:
        raise FileNotFoundError(f"no weights for {cls_name} under "
                                f"{cfg.weights_root}")
    cls_vars, cls_extra = cls_bundle
    seg_model = get_model(seg_name)["factory"]()
    seg_bundle = load_model_bundle(seg_name, cfg.weights_root, seg=True)
    if seg_bundle is None:
        log(f"[WARNING] no weights for {seg_name}; segmentation skipped")
        seg_vars, seg_extra = None, {}
    else:
        seg_vars, seg_extra = seg_bundle

    is_clip = cls_name.lower() == "clip"
    is_clipseg = seg_name.lower() == "clipseg"

    # model variables ride as jit arguments, not closures (closure capture
    # bakes params into the HLO as constants; VGG-sized programs then blow
    # the remote-compile transport's size limit — see eval/harness.py).
    @jax.jit
    def cls_fwd(variables, images_u8):
        if is_clip:
            x = clip_preprocess(images_u8, CLIP_IMG_SIZE)
        else:
            x, _ = preprocess_eval_batch(images_u8)
        logits = cls_model.apply(variables, x, **cls_extra)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(probs, axis=-1), jnp.max(probs, axis=-1)

    @jax.jit
    def seg_fwd(variables, images_u8):
        if is_clipseg:
            x = clip_preprocess(images_u8, CLIPSEG_IMG_SIZE)
            logits = seg_model.apply(variables, x, **seg_extra)[..., None]
        else:
            x, _ = preprocess_eval_batch(images_u8)
            logits = seg_model.apply(variables, x, **seg_extra)
            if logits.ndim == 3:
                logits = logits[..., None]
        return jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]

    def cls_step(images_u8):
        return cls_fwd(cls_vars, images_u8)

    def seg_step(images_u8):
        return seg_fwd(seg_vars, images_u8)

    out_dir = Path(output_dir) if output_dir else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)
    results = []

    for start in range(0, len(image_paths), batch_size):
        chunk = image_paths[start:start + batch_size]
        originals = [np.asarray(_decode_rgb(Path(p))) for p in chunk]
        batch = np.stack([_resize_u8(img, IMG_SIZE) for img in originals])
        batch_dev = jnp.asarray(batch)

        preds, confs = cls_step(batch_dev)
        preds = np.asarray(preds)
        confs = np.asarray(confs) * 100.0

        probs = None
        if seg_vars is not None and np.any(preds == CLASSES.index("COVID")):
            probs = np.asarray(seg_step(batch_dev))

        for i, path in enumerate(chunk):
            pred = CLASSES[int(preds[i])]
            rec = {"file": Path(path).name, "prediction": pred,
                   "confidence": float(confs[i]), "overlay_path": None}
            if pred == "COVID" and probs is not None and out_dir:
                mask = (probs[i] > cfg.threshold).astype(np.uint8) * 255
                overlay = red_overlay(originals[i], mask, overlay_opacity)
                op = out_dir / f"{Path(path).stem}_overlay.png"
                _write_png(overlay, op)
                rec["overlay_path"] = str(op)
            results.append(rec)
        log(f"[predict] {min(start + batch_size, len(image_paths))}/"
            f"{len(image_paths)}")

    if out_dir:
        csv_path = out_dir / "predictions.csv"
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["file", "prediction",
                                              "confidence", "overlay_path"])
            w.writeheader()
            w.writerows(results)
        log(f"[predict] wrote {csv_path}")
    return results


def _write_png(arr: np.ndarray, path: Path):
    try:
        import cv2

        cv2.imwrite(str(path), arr[:, :, ::-1])
    except ImportError:
        from PIL import Image

        Image.fromarray(arr).save(path)
