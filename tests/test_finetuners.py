"""CLIP / CLIPSeg finetune-recipe smoke tests with tiny towers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medseg_tpu.core.config import CLIPFinetuneConfig, CLIPSegFinetuneConfig
from medseg_tpu.data import BatchLoader, synthetic_cls, synthetic_seg
from medseg_tpu.models.clip import CLIPClassifier
from medseg_tpu.models.clipseg import CLIPSegModel
from medseg_tpu.nn.vit import TowerConfig
from medseg_tpu.parallel import data_parallel_mesh
from medseg_tpu.train.clip_finetune import finetune_clip
from medseg_tpu.train.clipseg_finetune import finetune_clipseg

TINY_VISION = TowerConfig(32, 2, 2, 64, image_size=32, patch_size=8)
TINY_TEXT = TowerConfig(32, 2, 2, 64, vocab_size=100, max_positions=16,
                        eos_token_id=99)


def test_finetune_clip_smoke(tmp_path):
    model = CLIPClassifier(vision_cfg=TINY_VISION, projection_dim=16)
    tf = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    tf /= np.linalg.norm(tf, axis=-1, keepdims=True)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.asarray(tf))
    ds = synthetic_cls(n=16, img_size=32)
    tr = BatchLoader(ds, 8, shuffle=True, indices=np.arange(12))
    va = BatchLoader(ds, 4, shuffle=False, indices=np.arange(12, 16))
    cfg = CLIPFinetuneConfig(epochs=2, lr=1e-3, save_root=str(tmp_path))
    logs = []
    before = variables["params"]["vision"]["layer0"]["attn"]["q_proj"]["kernel"]
    before = np.asarray(before).copy()
    best = finetune_clip(tr, va, variables, tf, cfg, model=model,
                         image_size=32, log=logs.append)
    assert 0.0 <= best <= 100.0
    assert any("[CLIP] Ep1" in l for l in logs)
    assert any("Saved best model" in l for l in logs)
    from medseg_tpu.train import checkpoint as ckpt
    assert ckpt.best_exists(str(tmp_path / "classification_models"), "CLIP",
                            seg=False)


def test_finetune_clipseg_smoke_and_decoder_only(tmp_path):
    model = CLIPSegModel(vision_cfg=TINY_VISION, text_cfg=TINY_TEXT,
                         projection_dim=16, extract_layers=(0, 1),
                         reduce_dim=16, decoder_heads=2, decoder_intermediate=32)
    cond = np.random.default_rng(1).standard_normal((1, 16)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           cond=jnp.asarray(cond))
    ds = synthetic_seg(n=8, img_size=32)
    tr = BatchLoader(ds, 4, shuffle=True, indices=np.arange(6))
    va = BatchLoader(ds, 2, shuffle=False, indices=np.arange(6, 8))
    cfg = CLIPSegFinetuneConfig(epochs=2, lr=1e-3, save_root=str(tmp_path))
    logs = []
    vis_before = np.asarray(
        variables["params"]["vision"]["layer0"]["attn"]["q_proj"]["kernel"]).copy()
    dec_before = np.asarray(
        variables["params"]["decoder"]["reduce0"]["kernel"]).copy()
    best = finetune_clipseg(tr, va, variables, cond, cfg, model=model,
                            image_size=32, log=logs.append)
    assert 0.0 <= best <= 1.0
    assert any("[CLIPSeg] Ep1" in l for l in logs)


def test_finetune_clip_on_mesh(tmp_path):
    """Data-parallel CLIP finetune over the 8-device virtual mesh: batches
    shard, params replicate, ragged val tail drops, checkpoint still saves."""
    mesh = data_parallel_mesh()
    assert mesh.size >= 8
    model = CLIPClassifier(vision_cfg=TINY_VISION, projection_dim=16)
    tf = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    tf /= np.linalg.norm(tf, axis=-1, keepdims=True)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.asarray(tf))
    ds = synthetic_cls(n=36, img_size=32)
    tr = BatchLoader(ds, 16, shuffle=True, indices=np.arange(24))
    va = BatchLoader(ds, 8, shuffle=False, indices=np.arange(24, 36))  # 12 -> ragged 4 drops
    cfg = CLIPFinetuneConfig(epochs=2, lr=1e-3, save_root=str(tmp_path))
    logs = []
    best = finetune_clip(tr, va, variables, tf, cfg, mesh=mesh, model=model,
                         image_size=32, log=logs.append)
    assert 0.0 <= best <= 100.0
    assert any("[CLIP] Ep2" in l for l in logs)
    from medseg_tpu.train import checkpoint as ckpt
    assert ckpt.best_exists(str(tmp_path / "classification_models"), "CLIP",
                            seg=False)


def test_finetune_clipseg_on_mesh(tmp_path):
    mesh = data_parallel_mesh()
    model = CLIPSegModel(vision_cfg=TINY_VISION, text_cfg=TINY_TEXT,
                         projection_dim=16, extract_layers=(0, 1),
                         reduce_dim=16, decoder_heads=2, decoder_intermediate=32)
    cond = np.random.default_rng(1).standard_normal((1, 16)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           cond=jnp.asarray(cond))
    ds = synthetic_seg(n=28, img_size=32)
    tr = BatchLoader(ds, 8, shuffle=True, indices=np.arange(16))
    va = BatchLoader(ds, 8, shuffle=False, indices=np.arange(16, 28))  # ragged 4 drops
    cfg = CLIPSegFinetuneConfig(epochs=2, lr=1e-3, save_root=str(tmp_path))
    logs = []
    best = finetune_clipseg(tr, va, variables, cond, cfg, mesh=mesh,
                            model=model, image_size=32, log=logs.append)
    assert 0.0 <= best <= 1.0
    assert any("[CLIPSeg] Ep2" in l for l in logs)
