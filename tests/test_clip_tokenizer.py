"""CLIP BPE tokenizer + prompt-id resolution tests.

The algorithm is fully testable offline with a synthetic byte-level
vocabulary (all 256 byte units + their </w> forms make any text encodable
char-level; merges then exercise the pair-ranking loop).  Exact-id parity
vs transformers' CLIPTokenizer runs only where HF assets exist (zero-egress
builds skip it)."""

import json

import numpy as np
import pytest

from medseg_tpu.interop import prompts as P
from medseg_tpu.interop.clip_tokenizer import (
    EOT,
    SOT,
    ClipTokenizer,
    _bytes_to_unicode,
)


def _tiny_vocab(tmp_path, merges=()):
    units = list(_bytes_to_unicode().values())
    vocab = units + [u + "</w>" for u in units]
    vocab += ["".join(m) for m in merges]
    vocab += [SOT, EOT]
    (tmp_path / "vocab.json").write_text(
        json.dumps({t: i for i, t in enumerate(vocab)}))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges))
    return tmp_path


def test_bytes_to_unicode_is_a_bijection():
    m = _bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_charlevel_encoding_with_no_merges(tmp_path):
    tok = ClipTokenizer(str(_tiny_vocab(tmp_path)))
    ids = tok.encode("ab c")
    # "ab" -> 'a', 'b</w>'; "c" -> 'c</w>'
    assert ids == [tok.encoder["a"], tok.encoder["b</w>"], tok.encoder["c</w>"]]


def test_merge_ranking_applies(tmp_path):
    tok = ClipTokenizer(str(_tiny_vocab(tmp_path, merges=(("h", "e</w>"),
                                                          ("l", "l")))))
    assert tok.encode("he") == [tok.encoder["he</w>"]]
    # 'hello': ll merges mid-word, h+e</w> does NOT apply (e is not final)
    assert tok.encode("hello") == [tok.encoder[c] for c in
                                   ("h", "e", "ll", "o</w>")]


def test_call_wraps_pads_and_lowercases(tmp_path):
    tok = ClipTokenizer(str(_tiny_vocab(tmp_path)))
    out = tok(["A  b", "xyz"])
    assert out.dtype == np.int32
    assert out.shape[0] == 2 and out.shape[1] == 5  # sot x y z eot
    assert out[0, 0] == tok.sot_id
    # "a b" -> a</w> b</w> + eot, then eot-padded to width 5
    assert list(out[0, 1:]) == [tok.encoder["a</w>"], tok.encoder["b</w>"],
                                tok.eot_id, tok.eot_id]


def test_prompt_ids_from_env_bundle(tmp_path, monkeypatch):
    bundle = {"prompts": list(P.ALL_PROMPTS),
              "clip": [[1, 2, 3], [1, 4, 3], [1, 5, 3]],
              "clipseg": [[1, 9, 3]]}
    path = tmp_path / "ids.json"
    path.write_text(json.dumps(bundle))
    monkeypatch.setenv("MEDSEG_PROMPT_IDS", str(path))
    ids = P.get_prompt_token_ids()
    assert ids["clip"].shape == (3, 3)
    assert ids["clipseg"].tolist() == [[1, 9, 3]]


def test_prompt_ids_reject_stale_bundle(tmp_path, monkeypatch):
    path = tmp_path / "ids.json"
    path.write_text(json.dumps({"prompts": ["other"], "clip": [], "clipseg": []}))
    monkeypatch.setenv("MEDSEG_PROMPT_IDS", str(path))
    with pytest.raises(P.PromptIdsUnavailable):
        P.get_prompt_token_ids()


def test_write_bundle_roundtrip_with_vocab(tmp_path, monkeypatch):
    monkeypatch.setenv("MEDSEG_CLIP_VOCAB", str(_tiny_vocab(tmp_path)))
    out = tmp_path / "bundle.json"
    P.write_bundle(str(out))
    monkeypatch.setenv("MEDSEG_PROMPT_IDS", str(out))
    ids = P.get_prompt_token_ids()
    tok = ClipTokenizer(str(tmp_path))
    np.testing.assert_array_equal(ids["clip"], tok(list(P.DEFAULT_TEXT_PROMPTS)))
    np.testing.assert_array_equal(ids["clipseg"], tok([P.DEFAULT_SEG_TEXT_PROMPT]))


def test_parity_vs_transformers_tokenizer():
    """Exact-id parity with HF CLIPTokenizer (skipped without HF assets)."""
    transformers = pytest.importorskip("transformers")
    try:
        hf = transformers.CLIPTokenizer.from_pretrained(
            "openai/clip-vit-base-patch32")
    except Exception:
        pytest.skip("openai/clip-vit-base-patch32 tokenizer not available "
                    "offline")
    ids_hf = hf(list(P.ALL_PROMPTS), padding=True)["input_ids"]
    tok = ClipTokenizer()  # finds the same HF cache
    got = tok(list(P.ALL_PROMPTS))
    np.testing.assert_array_equal(got, np.asarray(ids_hf, np.int32))
    # and the resolver (no env, no bundle -> live tokenization) agrees
    resolved = P._from_tokenizer()
    np.testing.assert_array_equal(resolved["clip"],
                                  tok(list(P.DEFAULT_TEXT_PROMPTS)))
