"""Pretrained HF CLIP/CLIPSeg acquisition + text-feature precomputation.

Gated on transformers' ability to reach (or have cached) the checkpoints —
this build environment has zero egress, so these paths raise actionable
errors offline.  When available:

- `load_clip_classifier_pretrained`: openai/clip-vit-base-patch32 ->
  CLIPClassifier variables + L2-normalized features for the three medical
  prompts (reference models/classification_models/CLIP.py:10-45)
- `load_clipseg_pretrained`: CIDAS/clipseg-rd64-refined -> CLIPSegModel
  variables + the "lungs" conditional embedding
  (models/segmentation_models/CLIPSeg.py:10,27-29)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from medseg_tpu.core.config import DEFAULT_SEG_TEXT_PROMPT, DEFAULT_TEXT_PROMPTS
from medseg_tpu.interop.hf_clip import convert_clip_classifier, convert_clipseg

CLIP_NAME = "openai/clip-vit-base-patch32"
CLIPSEG_NAME = "CIDAS/clipseg-rd64-refined"


def _offline_error(name: str, exc: Exception) -> RuntimeError:
    return RuntimeError(
        f"could not load {name} from HuggingFace (offline environment?). "
        f"Pre-populate the HF cache or pass converted variables directly. "
        f"Original error: {exc}")


def load_clip_classifier_pretrained() -> Tuple[dict, np.ndarray]:
    try:
        import torch
        from transformers import CLIPModel, CLIPProcessor
    except ImportError as e:  # pragma: no cover
        raise _offline_error(CLIP_NAME, e)
    try:
        hf = CLIPModel.from_pretrained(CLIP_NAME)
        processor = CLIPProcessor.from_pretrained(CLIP_NAME)
    except Exception as e:
        raise _offline_error(CLIP_NAME, e)
    with torch.no_grad():
        inputs = processor(text=list(DEFAULT_TEXT_PROMPTS),
                           return_tensors="pt", padding=True)
        feats = hf.get_text_features(**inputs)
        feats = feats / feats.norm(dim=-1, keepdim=True)
    variables = convert_clip_classifier(hf.state_dict())
    return variables, feats.numpy()


def load_clipseg_pretrained() -> Tuple[dict, np.ndarray]:
    try:
        import torch
        from transformers import CLIPSegForImageSegmentation, CLIPSegProcessor
    except ImportError as e:  # pragma: no cover
        raise _offline_error(CLIPSEG_NAME, e)
    try:
        hf = CLIPSegForImageSegmentation.from_pretrained(CLIPSEG_NAME)
        processor = CLIPSegProcessor.from_pretrained(CLIPSEG_NAME)
    except Exception as e:
        raise _offline_error(CLIPSEG_NAME, e)
    with torch.no_grad():
        tok = processor.tokenizer([DEFAULT_SEG_TEXT_PROMPT],
                                  return_tensors="pt", padding=True)
        cond = hf.get_conditional_embeddings(
            batch_size=1, input_ids=tok["input_ids"],
            attention_mask=tok["attention_mask"])
    variables = convert_clipseg(hf.state_dict())
    return variables, cond.numpy()
