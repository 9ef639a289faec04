"""Text features / conditional embeddings from converted checkpoints' OWN
text towers — zero network, zero HF assets.

The reference evaluates CLIP/CLIPSeg from weight files alone
(utils/tester.py:559-565,642-648): the saved state_dicts contain the full
text towers, and the prompts are fixed strings.  These helpers reproduce
that self-sufficiency for the flax framework: given a converted checkpoint
(or a raw reference torch state_dict) and the prompt token ids
(interop.prompts), they run the checkpoint's text tower once and return the
small arrays the image-side models consume.

- CLIP: L2-normalized [3, 512] prompt features (CLIP.py:36-45 semantics)
- CLIPSeg: unnormalized [1, 512] conditional embedding (HF
  get_conditional_embeddings semantics, used by FiLM)
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def clip_text_features(full_clip_variables: Mapping,
                       token_ids: np.ndarray, model=None) -> np.ndarray:
    """[N, 512] L2-normalized prompt features via CLIPModule.encode_text.
    model is injectable for tests with tiny towers."""
    from medseg_tpu.models.clip import CLIPModule

    model = model or CLIPModule()
    feats = model.apply(full_clip_variables, jnp.asarray(token_ids),
                        method=CLIPModule.encode_text)
    feats = np.asarray(feats, np.float32)
    return feats / np.linalg.norm(feats, axis=-1, keepdims=True)


def clipseg_cond(clipseg_variables: Mapping,
                 token_ids: np.ndarray, model=None) -> np.ndarray:
    """[1, 512] conditional embedding via CLIPSegModel.encode_text.
    model is injectable for tests with tiny towers."""
    from medseg_tpu.models.clipseg import CLIPSegModel

    model = model or CLIPSegModel()
    cond = model.apply(clipseg_variables, jnp.asarray(token_ids),
                       method=CLIPSegModel.encode_text)
    return np.asarray(cond, np.float32)


def classifier_variables_from_full(full_clip_variables: Mapping) -> Dict:
    """CLIPModule variables -> image-side CLIPClassifier variables."""
    p = full_clip_variables["params"]
    return {"params": {"vision": p["vision"],
                       "visual_projection": p["visual_projection"],
                       "logit_scale": p["logit_scale"]}}


def clip_bundle_from_torch_sd(sd: Mapping,
                              token_ids: Optional[np.ndarray] = None
                              ) -> Tuple[Dict, np.ndarray]:
    """Reference CLIP_best_acc.pt (full HF CLIPModel state_dict,
    utils/clip_finetuner.py:179) -> (CLIPClassifier variables,
    normalized text features), entirely offline."""
    from medseg_tpu.interop.hf_clip import convert_clip

    if token_ids is None:
        from medseg_tpu.interop.prompts import get_prompt_token_ids

        token_ids = get_prompt_token_ids()["clip"]
    full = convert_clip(sd)
    feats = clip_text_features(full, token_ids)
    return classifier_variables_from_full(full), feats


def clipseg_bundle_from_torch_sd(sd: Mapping,
                                 token_ids: Optional[np.ndarray] = None
                                 ) -> Tuple[Dict, np.ndarray]:
    """Reference CLIPSeg_best_loss.pt (full HF CLIPSegForImageSegmentation
    state_dict, utils/clip_seg_finetuner.py:240-246) -> (CLIPSegModel
    variables, conditional embedding), entirely offline."""
    from medseg_tpu.interop.hf_clip import convert_clipseg

    if token_ids is None:
        from medseg_tpu.interop.prompts import get_prompt_token_ids

        token_ids = get_prompt_token_ids()["clipseg"]
    variables = convert_clipseg(sd)
    return variables, clipseg_cond(variables, token_ids)
