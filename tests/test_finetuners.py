"""CLIP / CLIPSeg finetune-recipe smoke tests with tiny towers."""

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

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
    shard, params replicate, ragged val tail pads+masks, checkpoint still saves."""
    mesh = data_parallel_mesh()
    assert mesh.size >= 8
    model = CLIPClassifier(vision_cfg=TINY_VISION, projection_dim=16)
    tf = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    tf /= np.linalg.norm(tf, axis=-1, keepdims=True)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.asarray(tf))
    ds = synthetic_cls(n=36, img_size=32)
    tr = BatchLoader(ds, 16, shuffle=True, indices=np.arange(24))
    va = BatchLoader(ds, 8, shuffle=False, indices=np.arange(24, 36))  # ragged 4: pads+masks
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
    va = BatchLoader(ds, 8, shuffle=False, indices=np.arange(16, 28))  # ragged 4: pads+masks
    cfg = CLIPSegFinetuneConfig(epochs=2, lr=1e-3, save_root=str(tmp_path))
    logs = []
    best = finetune_clipseg(tr, va, variables, cond, cfg, mesh=mesh,
                            model=model, image_size=32, log=logs.append)
    assert 0.0 <= best <= 1.0
    assert any("[CLIPSeg] Ep2" in l for l in logs)


def _parse(logs, tag, field):
    """Pull `field <num>` from the first '[tag] Ep1' line."""
    import re
    line = next(l for l in logs if f"[{tag}] Ep1" in l)
    return float(re.search(rf"{field} ([\d.]+)", line).group(1))


def test_clip_mesh_val_matches_single_device_exactly(tmp_path):
    """r3 advisor fix: with lr=0 (params never move) a mesh run's validation
    metrics must equal the single-device run's even with a RAGGED val set —
    the old drop_last path silently excluded the 4-sample tail from both
    ValLoss and ValAcc (and hence from best-checkpoint selection)."""
    mesh = data_parallel_mesh()
    model = CLIPClassifier(vision_cfg=TINY_VISION, projection_dim=16)
    tf = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    tf /= np.linalg.norm(tf, axis=-1, keepdims=True)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.asarray(tf))
    ds = synthetic_cls(n=28, img_size=32)
    cfg = CLIPFinetuneConfig(epochs=1, lr=0.0, save_root=str(tmp_path))

    def run(mesh_arg):
        logs = []
        finetune_clip(BatchLoader(ds, 8, shuffle=True,
                                  indices=np.arange(16)),
                      BatchLoader(ds, 8, shuffle=False,
                                  indices=np.arange(16, 28)),  # ragged 4
                      variables, tf, cfg, mesh=mesh_arg, model=model,
                      image_size=32, save=False, log=logs.append)
        return logs

    logs_plain, logs_mesh = run(None), run(mesh)
    assert _parse(logs_mesh, "CLIP", "ValAcc") == pytest.approx(
        _parse(logs_plain, "CLIP", "ValAcc"), abs=1e-6)
    assert _parse(logs_mesh, "CLIP", "ValLoss") == pytest.approx(
        _parse(logs_plain, "CLIP", "ValLoss"), abs=2e-3)


def test_clipseg_mesh_val_matches_single_device_exactly(tmp_path):
    mesh = data_parallel_mesh()
    model = CLIPSegModel(vision_cfg=TINY_VISION, text_cfg=TINY_TEXT,
                         projection_dim=16, extract_layers=(0, 1),
                         reduce_dim=16, decoder_heads=2,
                         decoder_intermediate=32)
    cond = np.random.default_rng(1).standard_normal((1, 16)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           cond=jnp.asarray(cond))
    ds = synthetic_seg(n=28, img_size=32)
    cfg = CLIPSegFinetuneConfig(epochs=1, lr=0.0, save_root=str(tmp_path))

    def run(mesh_arg):
        logs = []
        finetune_clipseg(BatchLoader(ds, 8, shuffle=True,
                                     indices=np.arange(16)),
                         BatchLoader(ds, 8, shuffle=False,
                                     indices=np.arange(16, 28)),  # ragged 4
                         variables, cond, cfg, mesh=mesh_arg, model=model,
                         image_size=32, save=False, log=logs.append)
        return logs

    logs_plain, logs_mesh = run(None), run(mesh)
    assert _parse(logs_mesh, "CLIPSeg", "ValDice") == pytest.approx(
        _parse(logs_plain, "CLIPSeg", "ValDice"), abs=2e-3)
    assert _parse(logs_mesh, "CLIPSeg", "ValLoss") == pytest.approx(
        _parse(logs_plain, "CLIPSeg", "ValLoss"), abs=2e-3)


def _epoch_lines(logs, tag):
    return [l for l in logs if f"[{tag}] Ep" in l]


def _assert_same_epoch_lines(log_a, log_b, tag, fields, abs_tol=1e-4):
    """The per-epoch loss lines are the wiring pin (see
    tests/test_scan_epoch.py): any batch-order mismatch shifts the 3rd
    decimal immediately; the finetune steps are rng-free, so scan-vs-loop
    differences are pure float accumulation order (~1e-6)."""
    import re

    la, lb = _epoch_lines(log_a, tag), _epoch_lines(log_b, tag)
    assert len(la) == len(lb) and la
    for a, b in zip(la, lb):
        for f in fields:
            va = float(re.search(rf"{f} (-?[\d.]+)", a).group(1))
            vb = float(re.search(rf"{f} (-?[\d.]+)", b).group(1))
            assert va == pytest.approx(vb, abs=abs_tol), f"{a!r} vs {b!r}"


def test_finetune_clip_scan_chunk_equivalent(tmp_path):
    """finetune_clip(scan_chunk=3) == per-step finetune_clip: 4 full batches
    + ragged tail -> one [3,B] scan chunk, one remainder batch on the
    per-step program, the tail as an ordinary step (steps.scan_epoch_driver
    routing)."""
    model = CLIPClassifier(vision_cfg=TINY_VISION, projection_dim=16)
    tf = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    tf /= np.linalg.norm(tf, axis=-1, keepdims=True)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.asarray(tf))
    ds = synthetic_cls(n=22, img_size=32)
    cfg = CLIPFinetuneConfig(epochs=2, lr=1e-3, save_root=str(tmp_path))

    def run(k):
        tr = BatchLoader(ds, 4, shuffle=True, seed=5, device_cache=True,
                         indices=np.arange(18))
        va = BatchLoader(ds, 4, shuffle=False, indices=np.arange(18, 22))
        logs = []
        finetune_clip(tr, va, variables, tf, cfg, model=model, image_size=32,
                      scan_chunk=k, save=False, log=logs.append)
        return logs

    _assert_same_epoch_lines(run(0), run(3), "CLIP",
                             ("TrainLoss", "ValLoss", "ValAcc"))


def test_finetune_clipseg_scan_chunk_equivalent(tmp_path):
    model = CLIPSegModel(vision_cfg=TINY_VISION, text_cfg=TINY_TEXT,
                         projection_dim=16, extract_layers=(0, 1),
                         reduce_dim=16, decoder_heads=2,
                         decoder_intermediate=32)
    cond = np.random.default_rng(1).standard_normal((1, 16)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           cond=jnp.asarray(cond))
    ds = synthetic_seg(n=14, img_size=32)
    cfg = CLIPSegFinetuneConfig(epochs=2, lr=1e-3, save_root=str(tmp_path))

    def run(k):
        tr = BatchLoader(ds, 4, shuffle=True, seed=5, device_cache=True,
                         indices=np.arange(10))
        va = BatchLoader(ds, 4, shuffle=False, indices=np.arange(10, 14))
        logs = []
        finetune_clipseg(tr, va, variables, cond, cfg, model=model,
                         image_size=32, scan_chunk=k, save=False,
                         log=logs.append)
        return logs

    _assert_same_epoch_lines(run(0), run(2), "CLIPSeg",
                             ("TrainLoss", "ValLoss", "ValDice"))


def test_finetune_clip_scan_chunk_under_mesh(tmp_path):
    """scan_chunk x data-parallel for the finetuner: replicated dataset
    cache, per-step batch reshard inside the scanned program, XLA grad psum
    — per-epoch lines must match the per-step mesh run's."""
    mesh = data_parallel_mesh()
    model = CLIPClassifier(vision_cfg=TINY_VISION, projection_dim=16)
    tf = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    tf /= np.linalg.norm(tf, axis=-1, keepdims=True)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.asarray(tf))
    ds = synthetic_cls(n=32, img_size=32)
    cfg = CLIPFinetuneConfig(epochs=2, lr=1e-3, save_root=str(tmp_path))

    def run(k):
        tr = BatchLoader(ds, 8, shuffle=True, seed=5, device_cache=True,
                         indices=np.arange(24))
        va = BatchLoader(ds, 8, shuffle=False, indices=np.arange(24, 32))
        logs = []
        finetune_clip(tr, va, variables, tf, cfg, mesh=mesh, model=model,
                      image_size=32, scan_chunk=k, save=False,
                      log=logs.append)
        return logs

    _assert_same_epoch_lines(run(0), run(2), "CLIP",
                             ("TrainLoss", "ValLoss", "ValAcc"))


def test_finetune_mesh_rejects_indivisible_batch(tmp_path):
    mesh = data_parallel_mesh()
    model = CLIPClassifier(vision_cfg=TINY_VISION, projection_dim=16)
    tf = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.asarray(tf))
    ds = synthetic_cls(n=24, img_size=32)
    with pytest.raises(ValueError, match="multiple of 8"):
        finetune_clip(BatchLoader(ds, 12, shuffle=True),
                      BatchLoader(ds, 12, shuffle=False),
                      variables, tf,
                      CLIPFinetuneConfig(epochs=1, save_root=str(tmp_path)),
                      mesh=mesh, model=model, image_size=32, save=False,
                      log=lambda *_: None)


def test_mesh_finetune_leaves_caller_loaders_untouched(tmp_path):
    """The mesh paths shallow-copy the loaders (review r4): the caller's
    objects must come back with no sharding/drop_last/padding attached."""
    mesh = data_parallel_mesh()
    model = CLIPClassifier(vision_cfg=TINY_VISION, projection_dim=16)
    tf = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    tf /= np.linalg.norm(tf, axis=-1, keepdims=True)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.asarray(tf))
    ds = synthetic_cls(n=28, img_size=32)
    tr = BatchLoader(ds, 8, shuffle=True, indices=np.arange(16))
    va = BatchLoader(ds, 8, shuffle=False, indices=np.arange(16, 28))
    cfg = CLIPFinetuneConfig(epochs=1, lr=0.0, save_root=str(tmp_path))
    finetune_clip(tr, va, variables, tf, cfg, mesh=mesh, model=model,
                  image_size=32, save=False, log=lambda *_: None)
    assert tr.sharding is None and tr.drop_last is False
    assert va.sharding is None and va.pad_to_multiple is None


def test_masked_padded_tail_equals_ragged_step():
    """The clipseg tail-step contract: padding a ragged batch to the full
    batch (repeat last row) and masking the loss gives EXACTLY the ragged
    batch's loss and parameter gradients — so ragged tails can ride the one
    proven-compilable program shape (the r5-cert toolchain SIGILL on the
    B=5 tail's backward; see train/clipseg_finetune.py)."""
    from medseg_tpu.ops.clip_prep import clip_preprocess
    from medseg_tpu.train.losses import (combined_loss, masked_combined_loss,
                                         valid_mask)

    model = CLIPSegModel(vision_cfg=TINY_VISION, text_cfg=TINY_TEXT,
                         projection_dim=16, extract_layers=(0, 1),
                         reduce_dim=16, decoder_heads=2,
                         decoder_intermediate=32)
    cond = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 16)).astype(np.float32))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           cond=cond)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    msk = (rng.random((3, 32, 32)) > 0.5).astype(np.uint8) * 255

    def fwd(p, images_u8, masks_u8):
        x = clip_preprocess(jnp.asarray(images_u8), 32)
        m = jnp.asarray(masks_u8).astype(jnp.float32) / 255.0
        c = jnp.broadcast_to(cond, (x.shape[0], cond.shape[-1]))
        logits = model.apply({"params": p}, x, cond=c)
        return logits, jax.image.resize(m[..., None],
                                        (m.shape[0],) + logits.shape[1:] + (1,),
                                        method="bilinear")[..., 0]

    def loss_ragged(p):
        logits, m = fwd(p, img, msk)
        return combined_loss(logits, m)

    img_pad = np.concatenate([img, img[-1:]])
    msk_pad = np.concatenate([msk, msk[-1:]])

    def loss_masked(p):
        logits, m = fwd(p, img_pad, msk_pad)
        return masked_combined_loss(logits, m, valid_mask(4, 3))

    l1, g1 = jax.jit(jax.value_and_grad(loss_ragged))(variables["params"])
    l2, g2 = jax.jit(jax.value_and_grad(loss_masked))(variables["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
