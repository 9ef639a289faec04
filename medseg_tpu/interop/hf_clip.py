"""Converters: HF CLIP / CLIPSeg state_dicts -> medseg_tpu flax trees.

Source graphs: transformers CLIPModel (openai/clip-vit-base-patch32, the
reference's classifier backbone, models/classification_models/CLIP.py:32) and
CLIPSegForImageSegmentation (CIDAS/clipseg-rd64-refined,
models/segmentation_models/CLIPSeg.py:27).  The reference saves raw HF
state_dicts (`clip_model.state_dict()` at utils/clip_finetuner.py:179,
`clipseg_model.state_dict()` at utils/clip_seg_finetuner.py:240-246), so
these converters ARE the checkpoint-loading path for CLIP/CLIPSeg weights.
"""

from __future__ import annotations

from typing import Dict, Mapping

from medseg_tpu.interop.common import (
    StateDict,
    take_conv,
    take_conv_transpose,
    take_linear,
    take_ln,
)


def _encoder_layer(sd: StateDict, prefix: str) -> Dict:
    return {
        "attn": {
            "q_proj": take_linear(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": take_linear(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": take_linear(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": take_linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "ln1": take_ln(sd, f"{prefix}.layer_norm1"),
        "ln2": take_ln(sd, f"{prefix}.layer_norm2"),
        "mlp": {
            "fc1": take_linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": take_linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def _vision_tower(sd: StateDict, prefix: str, num_layers: int) -> Dict:
    p: Dict = {
        "patch_embed": take_conv(sd, f"{prefix}.embeddings.patch_embedding",
                                 bias=False),
        "class_embedding": sd.take(f"{prefix}.embeddings.class_embedding"),
        "position_embedding": sd.take(
            f"{prefix}.embeddings.position_embedding.weight"),
        # HF's attribute really is spelled "pre_layrnorm".
        "pre_layernorm": take_ln(sd, f"{prefix}.pre_layrnorm"),
        "post_layernorm": take_ln(sd, f"{prefix}.post_layernorm"),
    }
    for i in range(num_layers):
        p[f"layer{i}"] = _encoder_layer(sd, f"{prefix}.encoder.layers.{i}")
    return p


def _text_tower(sd: StateDict, prefix: str, num_layers: int) -> Dict:
    p: Dict = {
        "token_embedding": sd.take(f"{prefix}.embeddings.token_embedding.weight"),
        "position_embedding": sd.take(
            f"{prefix}.embeddings.position_embedding.weight"),
        "final_layernorm": take_ln(sd, f"{prefix}.final_layer_norm"),
    }
    for i in range(num_layers):
        p[f"layer{i}"] = _encoder_layer(sd, f"{prefix}.encoder.layers.{i}")
    return p


def convert_clip(state_dict: Mapping, num_layers: int = 12) -> Dict:
    """HF CLIPModel state_dict -> CLIPModule variables."""
    sd = StateDict(state_dict)
    p = {
        "vision": _vision_tower(sd, "vision_model", num_layers),
        "text": _text_tower(sd, "text_model", num_layers),
        "visual_projection": take_linear(sd, "visual_projection", bias=False),
        "text_projection": take_linear(sd, "text_projection", bias=False),
        "logit_scale": sd.take("logit_scale"),
    }
    sd.assert_fully_consumed()
    return {"params": p}


def convert_clip_classifier(state_dict: Mapping, num_layers: int = 12) -> Dict:
    """HF CLIPModel state_dict -> image-side CLIPClassifier variables.

    The text tower is dropped (its features are precomputed once,
    reference CLIP.py:36-45); its keys are marked consumed.
    """
    sd = StateDict(state_dict)
    p = {
        "vision": _vision_tower(sd, "vision_model", num_layers),
        "visual_projection": take_linear(sd, "visual_projection", bias=False),
        "logit_scale": sd.take("logit_scale"),
    }
    _text_tower(sd, "text_model", num_layers)  # consume
    take_linear(sd, "text_projection", bias=False)  # consume
    sd.assert_fully_consumed()
    return {"params": p}


def convert_clipseg(state_dict: Mapping, num_layers: int = 12,
                    extract_depth: int = 3) -> Dict:
    """HF CLIPSegForImageSegmentation state_dict -> CLIPSegModel variables."""
    sd = StateDict(state_dict)
    dec: Dict = {
        "film_mul": take_linear(sd, "decoder.film_mul"),
        "film_add": take_linear(sd, "decoder.film_add"),
        # rd64-refined: complex transposed-conv head (Conv@0, ConvT@2, ConvT@4)
        "head_conv": take_conv(sd, "decoder.transposed_convolution.0"),
        "head_up1": take_conv_transpose(sd, "decoder.transposed_convolution.2"),
        "head_up2": take_conv_transpose(sd, "decoder.transposed_convolution.4"),
    }
    for i in range(extract_depth):
        dec[f"reduce{i}"] = take_linear(sd, f"decoder.reduces.{i}")
        dec[f"layer{i}"] = _encoder_layer(sd, f"decoder.layers.{i}")
    p = {
        "vision": _vision_tower(sd, "clip.vision_model", num_layers),
        "text": _text_tower(sd, "clip.text_model", num_layers),
        "visual_projection": take_linear(sd, "clip.visual_projection", bias=False),
        "text_projection": take_linear(sd, "clip.text_projection", bias=False),
        "logit_scale": sd.take("clip.logit_scale"),
        "decoder": dec,
    }
    sd.assert_fully_consumed()
    return {"params": p}
