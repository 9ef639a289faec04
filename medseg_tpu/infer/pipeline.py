"""The cascaded classify-then-segment inference pipeline (serving API).

Behavioral twin of reference utils/pipeline.py:178-418 `Pipeline`:

- `_load_models(cls_name, seg_name)`: lazy, cached by model name; missing
  weights degrade gracefully (classification falls back to fresh-init params
  with a warning, mirroring the reference's pretrained-only fallback at
  pipeline.py:251-254; a failed segmentation load yields a placeholder that
  skips segmentation, pipeline.py:102-108)
- `process_image(rgb_array, seg_name, overlay_opacity)`: classify ->
  softmax confidence -> if the prediction is not "COVID", return advisory
  text and STOP (the cascade gate, pipeline.py:395-396); else segment,
  threshold at 0.5, nearest-resize the mask to the original size and render
  the red overlay (pipeline.py:398-411)

TPU serving substrate: each loaded model family gets one jitted
preprocess+forward program at a fixed input grid; repeat calls hit the
compile cache.  Input preprocessing per family matches the reference
(VGG: 224 torchvision-style resize+normalize, pipeline.py:161-172; CLIP/
CLIPSeg: their processors; others: 256 resize+normalize).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from medseg_tpu.core.config import (
    CLASSES,
    CLIP_IMG_SIZE,
    CLIPSEG_IMG_SIZE,
    IMG_SIZE,
    EvalConfig,
)
from medseg_tpu.core.registry import get_model
from medseg_tpu.eval.harness import load_model_bundle
from medseg_tpu.infer.overlay import red_overlay
from medseg_tpu.ops.augment import preprocess_eval_batch
from medseg_tpu.ops.clip_prep import clip_preprocess
from medseg_tpu.ops.image import resize_bilinear


class Pipeline:
    def __init__(self, cfg: EvalConfig = EvalConfig(),
                 text_features: Optional[np.ndarray] = None,
                 clipseg_cond: Optional[np.ndarray] = None):
        """text_features: [3, 512] normalized CLIP prompt features;
        clipseg_cond: [1, 512] CLIPSeg conditional embedding (precomputed —
        the reference encodes its fixed prompts once too, CLIP.py:36-45)."""
        self.cfg = cfg
        self.text_features = text_features
        self.clipseg_cond = clipseg_cond
        self._cls: Optional[Tuple[str, Dict, object]] = None  # (name, vars, fn)
        self._seg: Optional[Tuple[str, Dict, object]] = None

    # ------------------------------------------------------------------
    @staticmethod
    def input_grid(name: str) -> Tuple[int, str]:
        """(size, resample) each family's jitted program expects — the
        original image is resized ONCE, straight to this grid, matching the
        reference's per-family preprocessing (VGG: 224 torchvision resize,
        pipeline.py:161-172; CLIP/CLIPSeg: their processors' bicubic;
        others: the 256 Albumentations transform, pipeline.py:186-193)."""
        lname = name.lower()
        if lname == "clip":
            return CLIP_IMG_SIZE, "bicubic"
        if lname == "clipseg":
            return CLIPSEG_IMG_SIZE, "bicubic"
        if lname.startswith("vgg"):
            return 224, "bilinear"
        return IMG_SIZE, "bilinear"

    def _build_cls_fn(self, name: str, variables):
        model = get_model(name)["factory"]()
        lname = name.lower()

        if lname == "clip":
            if self.text_features is None:
                raise ValueError(
                    "CLIP needs text_features: none embedded in the "
                    "checkpoint and none passed to Pipeline(text_features=...)")
            tf = jnp.asarray(self.text_features)

            # `variables` is a jit ARGUMENT (closure capture would bake the
            # params into the HLO as constants; a VGG-sized program then
            # exceeds the remote-compile transport's size limit).
            @jax.jit
            def step(variables, images_u8):
                x = clip_preprocess(images_u8, CLIP_IMG_SIZE)
                return model.apply(variables, x, tf)
        else:
            @jax.jit
            def step(variables, images_u8):
                x, _ = preprocess_eval_batch(images_u8)
                return model.apply(variables, x)

        fn = lambda images_u8: step(variables, images_u8)  # noqa: E731
        fn.jitted = step  # exposed so warmup tests can assert no new compiles
        return fn

    def _build_seg_fn(self, name: str, variables):
        model = get_model(name)["factory"]()
        if name.lower() == "clipseg":
            if self.clipseg_cond is None:
                raise ValueError(
                    "CLIPSeg needs a conditional embedding: none embedded in "
                    "the checkpoint and none passed to Pipeline(clipseg_cond=...)")
            cond = jnp.asarray(self.clipseg_cond)

            # variables as jit argument — see _build_cls_fn.
            @jax.jit
            def step(variables, images_u8):
                x = clip_preprocess(images_u8, CLIPSEG_IMG_SIZE)
                logits = model.apply(variables, x, cond=cond)
                return jax.nn.sigmoid(logits.astype(jnp.float32))[..., None]
        else:
            @jax.jit
            def step(variables, images_u8):
                x, _ = preprocess_eval_batch(images_u8)
                logits = model.apply(variables, x)
                if logits.ndim == 3:
                    logits = logits[..., None]
                return jax.nn.sigmoid(logits.astype(jnp.float32))

        fn = lambda images_u8: step(variables, images_u8)  # noqa: E731
        fn.jitted = step
        return fn

    # ------------------------------------------------------------------
    def _load_models(self, classification_name: str, segmentation_name: str):
        if self._cls is None or self._cls[0].lower() != classification_name.lower():
            name = classification_name
            bundle = load_model_bundle(name, self.cfg.weights_root, seg=False)
            if bundle is None:
                print("Weights file not found. Using fresh-initialized weights only.")
                model = get_model(name)["factory"]()
                dummy = self._dummy_input(name)
                variables = model.init(jax.random.key(0), *dummy)
            else:
                variables, extra = bundle
                if self.text_features is None and "text_features" in extra:
                    self.text_features = extra["text_features"]
            self._cls = (name, variables, self._build_cls_fn(name, variables))
            print(f"Successfully loaded Classification Model: {name}")

        if self._seg is None or self._seg[0].lower() != segmentation_name.lower():
            name = segmentation_name
            try:
                bundle = load_model_bundle(name, self.cfg.weights_root, seg=True)
                if bundle is None:
                    raise FileNotFoundError(name)
                variables, extra = bundle
                if self.clipseg_cond is None and "cond" in extra:
                    self.clipseg_cond = extra["cond"]
                self._seg = (name, variables, self._build_seg_fn(name, variables))
                print(f"Successfully loaded Segmentation Model: {name}")
            except Exception as e:
                print(f"CRITICAL ERROR: Failed to load segmentation weights for "
                      f"{name}. Error: {e}")
                self._seg = (name, None, None)  # placeholder: skip segmentation

    def _dummy_input(self, name: str):
        lname = name.lower()
        if lname == "clip":
            tf = self.text_features if self.text_features is not None else np.zeros((3, 512), np.float32)
            return (jnp.zeros((1, CLIP_IMG_SIZE, CLIP_IMG_SIZE, 3), jnp.float32),
                    jnp.asarray(tf))
        size = 224 if lname.startswith("vgg") else IMG_SIZE
        return (jnp.zeros((1, size, size, 3), jnp.float32),)

    # ------------------------------------------------------------------
    @staticmethod
    def _to_grid(batch_u8, size: int, method: str):
        """uint8 [1,H,W,3] -> uint8 [1,size,size,3], single resample."""
        if batch_u8.shape[1] == size and batch_u8.shape[2] == size:
            return batch_u8
        if method == "bicubic":
            x = jax.image.resize(batch_u8.astype(jnp.float32),
                                 (batch_u8.shape[0], size, size, 3), "bicubic")
        else:
            x = resize_bilinear(batch_u8, size, size)
        return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)

    def _predict_classification(self, images_u8) -> Tuple[str, float]:
        if self._cls is None:
            return "FATAL ERROR: Classification Model Not Loaded", 0.0
        logits = np.asarray(self._cls[2](images_u8))[0]
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        idx = int(np.argmax(probs))
        return CLASSES[idx], float(probs[idx]) * 100.0

    def _predict_segmentation(self, images_u8) -> Optional[np.ndarray]:
        if self._seg is None or self._seg[2] is None:
            return None
        probs = np.asarray(self._seg[2](images_u8))[0, :, :, 0]
        return (probs > self.cfg.threshold).astype(np.uint8) * 255

    def process_image(self, image, segmentation_model_name: str,
                      overlay_opacity: float = 0.5):
        """image: RGB uint8 array or PIL Image.
        Returns (prediction, confidence, overlay_or_None, analysis_text)."""
        return self.process_batch([image], segmentation_model_name,
                                  overlay_opacity)[0]

    # largest micro-batch one forward serves; groups pad up to the next
    # power of two so at most log2(MAX_BATCH)+1 programs compile per model
    MAX_BATCH = 8

    @staticmethod
    def _pad_pow2(x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[0]
        target = 1
        while target < n:
            target *= 2
        if target == n:
            return x
        reps = jnp.broadcast_to(x[-1:], (target - n,) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    def process_batch(self, images, segmentation_model_name: str,
                      overlay_opacity: float = 0.5):
        """Micro-batched cascade over up to MAX_BATCH images: ONE
        classification forward for the group and (if any prediction is
        COVID) ONE segmentation forward for the whole group — static
        shapes beat dynamic COVID-subset gathers on TPU, and the overlay
        gate stays an observable-behavior property (rendered only for
        COVID).  Entries may be RGB arrays, PIL images, or None.
        Returns a list of (prediction, confidence, overlay, analysis)."""
        results: list = [None] * len(images)
        arrays, idxs = [], []
        for i, image in enumerate(images):
            if image is None:
                results[i] = ("No Image Uploaded", 0.0, None,
                              "Please upload an image to begin analysis.")
                continue
            if not isinstance(image, np.ndarray):
                image = np.asarray(image.convert("RGB"))
            arrays.append(image)
            idxs.append(i)
        if not arrays:
            return results

        cls_name = self._cls[0] if self._cls else "ResNet50"
        self._load_models(cls_name, segmentation_model_name)
        if self._cls is None:
            msg = "FATAL ERROR: Classification Model Not Loaded"
            for i in idxs:
                results[i] = (msg, 0.0, None, msg)
            return results

        # Each original is resized once, directly to each family's grid (no
        # intermediate 256 canvas — parity with reference pipeline.py's
        # per-family preprocessing).  The resize is a tiny per-input-shape
        # program; the model programs compile once per (grid, batch) pair.
        size, method = self.input_grid(self._cls[0])
        cls_in = jnp.concatenate(
            [self._to_grid(jnp.asarray(a[None]), size, method)
             for a in arrays], axis=0)
        n = cls_in.shape[0]
        logits = np.asarray(self._cls[2](self._pad_pow2(cls_in)))[:n]
        probs = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs /= probs.sum(axis=-1, keepdims=True)
        pred_idx = probs.argmax(axis=-1)
        preds = [CLASSES[int(k)] for k in pred_idx]
        confs = [float(probs[j, k]) * 100.0 for j, k in enumerate(pred_idx)]

        masks = [None] * n
        seg_ok = self._seg is not None and self._seg[2] is not None
        if seg_ok and any(p == "COVID" for p in preds):
            s_size, s_method = self.input_grid(self._seg[0])
            seg_in = jnp.concatenate(
                [self._to_grid(jnp.asarray(a[None]), s_size, s_method)
                 for a in arrays], axis=0)
            sp = np.asarray(self._seg[2](self._pad_pow2(seg_in)))[:n, :, :, 0]
            masks = [(p > self.cfg.threshold).astype(np.uint8) * 255
                     for p in sp]

        for j, i in enumerate(idxs):
            prediction, confidence = preds[j], confs[j]
            analysis = (f"Diagnosis: {prediction}\n"
                        f"Confidence: {confidence:.2f}%\n")
            output_img = None
            if prediction != "COVID":  # cascade gate (pipeline.py:395-396)
                analysis += ("\nRecommendation: Consult a medical professional "
                             "for final diagnosis. The model suggests no severe "
                             "COVID-19 pathology.")
            elif masks[j] is not None:
                output_img = red_overlay(arrays[j], masks[j], overlay_opacity)
                analysis += ("\nInfection areas have been highlighted in red "
                             "(segmentation model).")
            else:
                analysis += ("\nWARNING: Segmentation model failed to load. "
                             "Cannot highlight infection areas.")
            results[i] = (prediction, confidence, output_img, analysis)
        return results
