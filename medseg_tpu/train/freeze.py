"""Trainable-parameter masks: the JAX realization of requires_grad surgery.

The reference freezes via `param.requires_grad = False`
(utils/helpers.py:263-276, clip_finetuner.py:91-99,
clip_seg_finetuner.py:125-132, ResnetUnet.py:45-46,60-66).  Here freezing is
an optimizer mask (optax.masked): masked leaves receive zero updates AND are
excluded from weight decay and the global-norm clip — matching torch, where
frozen params have grad=None and are skipped by both the optimizer and
clip_grad_norm_.

Masks are boolean pytrees matching `params`, selected by predicate over the
parameter path.
"""

from __future__ import annotations

from typing import Callable

import jax

PathPredicate = Callable[[tuple], bool]


def mask_from_predicate(params, pred: PathPredicate):
    """Boolean pytree: True = trainable."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_keys(path):
        return tuple(
            getattr(p, "key", getattr(p, "name", getattr(p, "idx", None)))
            for p in path)

    paths = {path_keys(p): pred(path_keys(p)) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, _: paths[path_keys(p)], params)


def all_trainable(params):
    return jax.tree.map(lambda _: True, params)


# --- Per-model stage/finetune predicates (reference recipes) ---------------

def head_only(model_name: str) -> PathPredicate:
    """Stage-1 classification predicate: the attr the reference unfreezes
    (utils/helpers.py:270-276) — 'fc' head for ResNets, the whole classifier
    stack for VGGs (helpers.py:135-144 returns "classifier")."""
    name = model_name.lower()
    if name.startswith("resnet"):
        return lambda path: path[0] == "head"
    if name.startswith("vgg"):
        return lambda path: path[0] in ("fc1", "fc2", "head_fc")
    raise ValueError(f"no stage-1 head rule for {model_name}")


def finetune_filter(model_name: str) -> PathPredicate:
    """Which params train in the model's (single-stage) finetune recipe."""
    name = model_name.lower()
    if name == "clip":
        # vision tower only (clip_finetuner.py:91-99: "vision_model" in name)
        return lambda path: path[0] == "vision"
    if name == "clipseg":
        # decoder only (clip_seg_finetuner.py:125-132: "decoder" in name)
        return lambda path: path[0] == "decoder"
    if name == "resnetunet":
        # encoder frozen by default (ResnetUnet.py:30,45-46)
        return lambda path: path[0] != "encoder"
    return lambda path: True
