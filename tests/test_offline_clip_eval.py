"""Offline CLIP/CLIPSeg drive: text features from the checkpoint's own text
tower, aux-embedded checkpoints, and the harness/CLI wiring (VERDICT r1 #1).

Reference behavior matched: utils/tester.py:513-735 evaluates all 10 models
from weight files alone; CLIP.py:36-45 / clip_seg_finetuner's conditional
embeddings are derived from fixed prompts whose ids are constants."""

import json

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medseg_tpu import interop  # noqa: E402
from medseg_tpu.eval import harness  # noqa: E402
from medseg_tpu.train import checkpoint as ckpt  # noqa: E402
from tests.test_interop import _tiny_clip_config, _tower_cfgs  # noqa: E402


def test_clip_text_features_match_hf_own_tower(rng_np):
    """Features computed from the converted checkpoint's text tower must
    equal HF get_text_features (normalized) — the offline-eval linchpin."""
    from transformers import CLIPModel as HFCLIPModel

    torch.manual_seed(3)
    hf = HFCLIPModel(_tiny_clip_config()).eval()
    vis, txt = _tower_cfgs()
    from medseg_tpu.models.clip import CLIPModule

    tiny = CLIPModule(vision_cfg=vis, text_cfg=txt, projection_dim=24)
    full = interop.convert_clip(hf.state_dict(), num_layers=2)
    ids = np.array([[98, 5, 7, 99], [98, 9, 99, 97], [98, 11, 2, 99]], np.int32)
    got = interop.clip_text_features(full, ids, model=tiny)
    with torch.no_grad():
        want = hf.get_text_features(torch.from_numpy(ids.astype(np.int64)))
        want = (want / want.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, rtol=1e-5)


def test_clipseg_cond_matches_hf_own_tower():
    from transformers import (CLIPSegConfig, CLIPSegForImageSegmentation,
                              CLIPSegTextConfig, CLIPSegVisionConfig)

    cfg = CLIPSegConfig.from_text_vision_configs(
        CLIPSegTextConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          max_position_embeddings=16, vocab_size=100,
                          projection_dim=24, eos_token_id=99,
                          bos_token_id=98, pad_token_id=97),
        CLIPSegVisionConfig(hidden_size=40, intermediate_size=80,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=32, patch_size=8, projection_dim=24),
        projection_dim=24, reduce_dim=16, extract_layers=[0, 1],
        decoder_num_attention_heads=2, decoder_intermediate_size=32,
        use_complex_transposed_convolution=True)
    torch.manual_seed(4)
    hf = CLIPSegForImageSegmentation(cfg).eval()
    vis, txt = _tower_cfgs()
    from medseg_tpu.models.clipseg import CLIPSegModel

    tiny = CLIPSegModel(vision_cfg=vis, text_cfg=txt, projection_dim=24,
                        extract_layers=(0, 1), reduce_dim=16,
                        decoder_heads=2, decoder_intermediate=32)
    variables = interop.convert_clipseg(hf.state_dict(), num_layers=2,
                                        extract_depth=2)
    ids = np.array([[98, 5, 99]], np.int32)
    got = interop.clipseg_cond(variables, ids, model=tiny)
    with torch.no_grad():
        want = hf.get_conditional_embeddings(
            batch_size=1, input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.ones((1, 3), dtype=torch.int64)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_checkpoint_aux_roundtrip_through_bundle(tmp_path):
    """save_best(aux=...) -> load_model_bundle returns the aux as extra
    inputs and strips it from the variables."""
    params = {"w": np.ones((2, 2), np.float32)}
    tf = np.arange(6, dtype=np.float32).reshape(3, 2)
    ckpt.save_best(str(tmp_path / "classification_models"), "CLIP", False,
                   params, {}, aux={"text_features": tf})
    bundle = harness.load_model_bundle("CLIP", str(tmp_path), seg=False)
    assert bundle is not None
    variables, extra = bundle
    assert "aux" not in variables
    np.testing.assert_array_equal(extra["text_features"], tf)


def test_evaluate_model_clip_offline_from_aux_checkpoint(tmp_path, monkeypatch):
    """evaluate_model drives CLIP with no caller-supplied extras: the text
    features come from the checkpoint itself (the advisor's r1 medium #2)."""
    from medseg_tpu.data import BatchLoader, synthetic_cls
    from medseg_tpu.models.clip import CLIPClassifier
    from medseg_tpu.nn.vit import TowerConfig

    vis = TowerConfig(16, 1, 2, 32, image_size=32, patch_size=16)
    tiny_factory = lambda **kw: CLIPClassifier(vision_cfg=vis, projection_dim=8)  # noqa: E731
    monkeypatch.setattr(
        harness, "get_model",
        lambda name: {"task": "classification", "factory": tiny_factory,
                      "needs_text_features": True})

    model = tiny_factory()
    tf = np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3), jnp.float32),
                           jnp.asarray(tf))
    ckpt.save_best(str(tmp_path / "classification_models"), "CLIP", False,
                   variables["params"], {}, aux={"text_features": tf})

    loader = BatchLoader(synthetic_cls(n=6, img_size=64), 3, shuffle=False)
    logs = []
    res = harness.evaluate_model("CLIP", loader, None,
                                 harness.EvalConfig(weights_root=str(tmp_path)),
                                 log=logs.append)
    assert res is not None and res["confusion_matrix"].sum() == 6


def _write_prompt_ids(tmp_path, monkeypatch, vocab=100):
    from medseg_tpu.interop.prompts import ALL_PROMPTS

    ids = {"prompts": list(ALL_PROMPTS),
           "clip": [[98, 5, 99], [98, 7, 99], [98, 11, 99]],
           "clipseg": [[98, 5, 99]]}
    path = tmp_path / "prompt_ids.json"
    path.write_text(json.dumps(ids))
    monkeypatch.setenv("MEDSEG_PROMPT_IDS", str(path))
    return path


def test_cli_eval_drives_clip_and_clipseg_from_torch_weights(tmp_path, monkeypatch,
                                                             capsys):
    """CLI-level: `medseg eval` on a weights dir holding ONLY the reference's
    raw torch state_dicts for CLIP + CLIPSeg (full-size, randomly
    initialized) completes offline — converts, computes prompt embeddings
    from the checkpoints' own text towers, and writes both results CSVs."""
    import pandas as pd
    from transformers import (CLIPConfig, CLIPModel, CLIPSegConfig,
                              CLIPSegForImageSegmentation,
                              CLIPSegTextConfig, CLIPSegVisionConfig)

    from medseg_tpu.apps.cli import main
    from medseg_tpu.data.packed import save_packed
    from medseg_tpu.data.synthetic import synthetic_cls, synthetic_seg

    _write_prompt_ids(tmp_path, monkeypatch)
    wroot = tmp_path / "weights"
    (wroot / "classification_models").mkdir(parents=True)
    (wroot / "segmentation_models").mkdir(parents=True)

    torch.manual_seed(0)
    # default CLIPConfig == openai/clip-vit-base-patch32 geometry
    clip_sd = CLIPModel(CLIPConfig()).eval().state_dict()
    torch.save(clip_sd, wroot / "classification_models" / "CLIP_best_acc.pt")
    seg_cfg = CLIPSegConfig.from_text_vision_configs(
        CLIPSegTextConfig(), CLIPSegVisionConfig(patch_size=16),
        reduce_dim=64, extract_layers=[3, 6, 9],
        use_complex_transposed_convolution=True)
    clipseg_sd = CLIPSegForImageSegmentation(seg_cfg).eval().state_dict()
    torch.save(clipseg_sd, wroot / "segmentation_models" / "CLIPSeg_best_loss.pt")

    cache = tmp_path / "packed"
    save_packed(synthetic_cls(n=4, img_size=256), str(cache), "test_cls")
    save_packed(synthetic_seg(n=2, img_size=256), str(cache), "test_seg")

    main(["eval", "--cache-dir", str(cache), "--weights-root", str(wroot),
          "--results-dir", str(tmp_path / "results"), "--batch-size", "4"])

    out = capsys.readouterr().out
    assert "[ERROR] Failed to test CLIP" not in out
    assert "[ERROR] Failed to test CLIPSeg" not in out
    cls_df = pd.read_csv(tmp_path / "results" / "classification_test_results.csv")
    seg_df = pd.read_csv(tmp_path / "results" / "segmentation_test_results.csv")
    assert list(cls_df["Model"]) == ["CLIP"]
    assert list(seg_df["Model"]) == ["CLIPSeg"]
