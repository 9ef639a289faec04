"""Prompt token ids: the constants that make CLIP/CLIPSeg drivable offline.

The reference's prompts are four fixed strings
(models/classification_models/CLIP.py:10-14, segmentation_models/CLIPSeg.py:10),
so their BPE token ids are constants.  This build environment has zero
egress and no BPE vocabulary on disk, so the ids cannot be *generated* here;
instead this module defines the single source of truth for resolving them:

  1. `$MEDSEG_PROMPT_IDS` — path to a JSON bundle (see schema below),
  2. the bundled `prompt_token_ids.json` next to this file (checked in the
     moment any environment with the tokenizer runs `--write`),
  3. live tokenization via interop.clip_tokenizer (needs vocab tables),
  4. live tokenization via transformers' CLIPTokenizer (needs HF assets).

Checkpoints written by this framework additionally embed the *encoded*
text features / conditional embeddings (train/clip_finetune.py,
train/clipseg_finetune.py, interop converters), so the eval/serve paths
only fall back to this module for raw reference torch checkpoints.

Bundle schema:
  {"prompts": [...4 strings...],
   "clip": [[ids...], [ids...], [ids...]],     # EOT-padded to equal length
   "clipseg": [[ids...]]}

Generate with:  python -m medseg_tpu.interop.prompts --write
Verify with  :  tests/test_clip_tokenizer.py (skippable, needs HF assets)
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from medseg_tpu.core.config import DEFAULT_SEG_TEXT_PROMPT, DEFAULT_TEXT_PROMPTS

BUNDLED_IDS_PATH = Path(__file__).with_name("prompt_token_ids.json")
ALL_PROMPTS = tuple(DEFAULT_TEXT_PROMPTS) + (DEFAULT_SEG_TEXT_PROMPT,)


class PromptIdsUnavailable(RuntimeError):
    pass


def _from_json(path: Path) -> Dict[str, np.ndarray]:
    data = json.loads(path.read_text())
    if tuple(data.get("prompts", ())) != ALL_PROMPTS:
        raise PromptIdsUnavailable(
            f"{path} was generated for different prompts; regenerate with "
            f"`python -m medseg_tpu.interop.prompts --write`")
    return {"clip": np.asarray(data["clip"], np.int32),
            "clipseg": np.asarray(data["clipseg"], np.int32)}


def _from_tokenizer() -> Dict[str, np.ndarray]:
    from medseg_tpu.interop.clip_tokenizer import ClipTokenizer

    tok = ClipTokenizer()
    return {"clip": tok(list(DEFAULT_TEXT_PROMPTS)),
            "clipseg": tok([DEFAULT_SEG_TEXT_PROMPT])}


def _from_transformers() -> Dict[str, np.ndarray]:
    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained("openai/clip-vit-base-patch32")
    enc = tok(list(DEFAULT_TEXT_PROMPTS), padding=True)
    seg = tok([DEFAULT_SEG_TEXT_PROMPT], padding=True)
    return {"clip": np.asarray(enc["input_ids"], np.int32),
            "clipseg": np.asarray(seg["input_ids"], np.int32)}


def get_prompt_token_ids() -> Dict[str, np.ndarray]:
    """{'clip': [3, L] ids, 'clipseg': [1, L'] ids} for the default prompts."""
    env = os.environ.get("MEDSEG_PROMPT_IDS")
    if env:
        return _from_json(Path(env))
    if BUNDLED_IDS_PATH.exists():
        return _from_json(BUNDLED_IDS_PATH)
    errors = []
    for fn in (_from_tokenizer, _from_transformers):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — collect and report all paths
            errors.append(f"{fn.__name__}: {type(e).__name__}: {e}")
    raise PromptIdsUnavailable(
        "prompt token ids unavailable offline: no bundled "
        f"{BUNDLED_IDS_PATH.name}, no $MEDSEG_PROMPT_IDS, and no BPE "
        "vocabulary/transformers assets to tokenize with. On any machine "
        "with the openai/clip-vit-base-patch32 tokenizer, run "
        "`python -m medseg_tpu.interop.prompts --write` and ship the JSON. "
        "Details: " + "; ".join(errors))


def write_bundle(out_path: Optional[str] = None) -> Path:
    """Tokenize the default prompts and write the JSON bundle."""
    ids = None
    errors = []
    for fn in (_from_tokenizer, _from_transformers):
        try:
            ids = fn()
            break
        except Exception as e:  # noqa: BLE001
            errors.append(f"{fn.__name__}: {e}")
    if ids is None:
        raise PromptIdsUnavailable("no tokenizer available: " + "; ".join(errors))
    path = Path(out_path or BUNDLED_IDS_PATH)
    path.write_text(json.dumps({
        "prompts": list(ALL_PROMPTS),
        "clip": ids["clip"].tolist(),
        "clipseg": ids["clipseg"].tolist(),
    }, indent=1))
    return path


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.write:
        print(f"wrote {write_bundle(args.out)}")
    else:
        ids = get_prompt_token_ids()
        for k, v in ids.items():
            print(k, v.tolist())
