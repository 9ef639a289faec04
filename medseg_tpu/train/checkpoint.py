"""Orbax checkpointing: best-model saves + full train-state resume.

The reference only saves best-model state_dicts and cannot resume
(utils/helpers.py:394-400; SURVEY.md §5 checkpoint/resume).  Here:
- `save_best` writes {params, batch_stats} under the reference's naming
  scheme ({name}_best_acc / {name}_best_loss), the eval harness' load format
- `save_resume`/`load_resume` additionally round-trip optimizer state, epoch,
  and best score, enabling exact training resume (a capability the reference
  lacks by design)
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(save_dir: str, name: str, seg: bool) -> Path:
    suffix = "best_loss" if seg else "best_acc"
    return (Path(save_dir) / f"{name}_{suffix}").absolute()


def _abstract_like(leaf):
    """np.empty twin of an array / ShapeDtypeStruct / orbax ArrayMetadata.

    numpy targets restore host-side with no sharding lookup, which keeps
    orbax's restore path warning-free (no 'UNSAFE without target' /
    'populating sharding from file' paths) and device-agnostic — callers
    jnp.asarray/device_put the tree onto their mesh themselves.
    """
    return np.empty(leaf.shape, leaf.dtype)


def _restore(ckptr: ocp.StandardCheckpointer, path: Path, target=None):
    """Restore with an explicit abstract target tree (never target-less).

    target=None derives the target from the checkpoint's own metadata
    (shapes/dtypes on disk) — safe for self-describing loads like eval's.
    A provided target (any pytree of arrays/ShapeDtypeStructs) is enforced:
    a topology mismatch raises orbax's structure-diff ValueError instead of
    silently materializing a foreign tree.
    """
    if target is None:
        meta = ckptr.metadata(path).item_metadata.tree
        target = jax.tree.map(_abstract_like, meta)
    else:
        target = jax.tree.map(_abstract_like, target)
    return ckptr.restore(path, target)


def save_best(save_dir: str, name: str, seg: bool, params, batch_stats,
              meta: Optional[Dict] = None, aux: Optional[Dict] = None):
    """aux: small non-parameter arrays the model needs at inference time
    (e.g. CLIP's precomputed text_features / CLIPSeg's conditional embedding)
    — embedding them makes the checkpoint self-describing, so eval/serve can
    drive CLIP/CLIPSeg offline with no tokenizer assets (tester.py:559-565
    evaluates every model from weights alone)."""
    path = _ckpt_dir(save_dir, name, seg)
    ckptr = ocp.StandardCheckpointer()
    tree = {"params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats)}
    if aux:
        tree["aux"] = {k: np.asarray(v) for k, v in aux.items()}
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        (path / "meta.json").write_text(json.dumps(meta))


def load_best(save_dir: str, name: str, seg: bool, target=None) -> Dict[str, Any]:
    path = _ckpt_dir(save_dir, name, seg)
    if not path.exists():
        raise FileNotFoundError(path)
    ckptr = ocp.StandardCheckpointer()
    return _restore(ckptr, path, target)


def best_exists(save_dir: str, name: str, seg: bool) -> bool:
    return _ckpt_dir(save_dir, name, seg).exists()


def save_resume(save_dir: str, name: str, state, epoch: int, best_score: float,
                extra: Optional[Dict] = None):
    path = (Path(save_dir) / f"{name}_resume").absolute()
    ckptr = ocp.StandardCheckpointer()
    tree = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.asarray(state.step),
    }
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": epoch, "best_score": best_score, **(extra or {})}
    (path / "meta.json").write_text(json.dumps(meta))


def load_resume(save_dir: str, name: str, target=None):
    path = (Path(save_dir) / f"{name}_resume").absolute()
    if not path.exists():
        return None
    ckptr = ocp.StandardCheckpointer()
    tree = _restore(ckptr, path, target)
    meta = json.loads((path / "meta.json").read_text())
    return tree, meta
