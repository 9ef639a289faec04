"""Data-layer tests: split determinism, manifests, packing, loader."""

import numpy as np
import pandas as pd
import pytest

from medseg_tpu.core.config import DataConfig
from medseg_tpu.data import (
    BatchLoader,
    generate_splits,
    load_manifest,
    load_packed,
    pack_split,
    save_packed,
    split_train_val,
    stratified_split,
    synthetic_cls,
)


@pytest.fixture
def fake_dataset(tmp_path, rng_np):
    cv2 = pytest.importorskip("cv2")
    cfg = DataConfig(root=str(tmp_path / "dataset"),
                     splits_dir=str(tmp_path / "dataset" / "splits"))
    for cls in cfg.classes:
        (tmp_path / "dataset" / cls / "images").mkdir(parents=True)
        (tmp_path / "dataset" / cls / "masks").mkdir(parents=True)
        for i in range(10):
            img = rng_np.integers(0, 256, (40, 40, 3), np.uint8)
            cv2.imwrite(str(tmp_path / "dataset" / cls / "images" / f"{cls}-{i}.png"), img)
            mask = (rng_np.random((40, 40)) > 0.5).astype(np.uint8) * 255
            cv2.imwrite(str(tmp_path / "dataset" / cls / "masks" / f"{cls}-{i}.png"), mask)
    return cfg


def test_split_generation_deterministic_and_stratified(fake_dataset):
    cfg = fake_dataset
    splits = generate_splits(cfg)
    (tr, try_), (va, vay), (te, tey) = splits
    assert len(tr) == 24 and len(va) == 3 and len(te) == 3
    # stratified: 8/1/1 per class
    for labels in (try_, vay, tey):
        u, c = np.unique(labels, return_counts=True)
        assert len(u) == 3 and len(set(c)) == 1
    # deterministic: regenerate -> identical
    splits2 = generate_splits(cfg)
    np.testing.assert_array_equal(splits[0][0], splits2[0][0])
    np.testing.assert_array_equal(splits[2][0], splits2[2][0])
    # CSVs written with reference schema
    df = pd.read_csv(cfg.split_csv("train"))
    assert list(df.columns) == ["id", "class"]


def test_split_matches_sklearn_direct(rng_np):
    """Contract: identical to two chained sklearn calls, seed 42."""
    from sklearn.model_selection import train_test_split

    ids = np.array([f"i{k}" for k in range(30)])
    labels = np.array(["A", "B", "C"] * 10)
    (tr, _), (va, _), (te, _) = stratified_split(ids, labels)
    t1, tmp, _, tmpy = train_test_split(ids, labels, test_size=0.2,
                                        stratify=labels, random_state=42)
    v1, te1, _, _ = train_test_split(tmp, tmpy, test_size=0.5,
                                     stratify=tmpy, random_state=42)
    np.testing.assert_array_equal(tr, t1)
    np.testing.assert_array_equal(va, v1)
    np.testing.assert_array_equal(te, te1)


def test_manifest_and_pack_roundtrip(fake_dataset, tmp_path):
    cfg = fake_dataset
    generate_splits(cfg)
    samples = load_manifest(cfg, "train", require_mask=True)
    assert len(samples) == 24
    ds = pack_split(cfg, "test", "seg", img_size=32)
    assert ds.images.shape == (3, 32, 32, 3)
    assert ds.masks.shape == (3, 32, 32)
    save_packed(ds, str(tmp_path / "cache"), "test_seg")
    ds2 = load_packed(str(tmp_path / "cache"), "test_seg")
    np.testing.assert_array_equal(np.asarray(ds2.images), ds.images)
    np.testing.assert_array_equal(np.asarray(ds2.masks), ds.masks)


def test_pack_cls_letterboxes(fake_dataset):
    cfg = fake_dataset
    generate_splits(cfg)
    ds = pack_split(cfg, "test", "cls", img_size=32)
    assert ds.images.shape == (3, 32, 32, 3)
    assert ds.masks is None


def test_batch_loader_shuffle_and_coverage():
    ds = synthetic_cls(n=10, img_size=8)
    loader = BatchLoader(ds, 3, shuffle=True, seed=1)
    assert len(loader) == 4
    seen = []
    for images, labels in loader:
        seen.append(np.asarray(labels))
    assert sum(len(s) for s in seen) == 10
    # epoch 2 different order than epoch 1
    first = [np.asarray(l) for _, l in loader]
    assert any((a.shape != b.shape) or (a != b).any()
               for a, b in zip(seen, first))


def test_split_train_val_partition():
    tr, va = split_train_val(100, 0.2, seed=0)
    assert len(tr) == 80 and len(va) == 20
    assert set(tr) | set(va) == set(range(100))
    assert not (set(tr) & set(va))


def test_batch_loader_device_cache_matches_host_path():
    """device_cache=True serves bit-identical (image, target) batches to the
    host path, for both cls labels and seg masks, across a shuffled epoch."""
    from medseg_tpu.data.synthetic import synthetic_seg

    for ds in (synthetic_cls(n=10, img_size=8), synthetic_seg(n=10, img_size=8)):
        host = BatchLoader(ds, 3, shuffle=True, seed=7)
        dev = BatchLoader(ds, 3, shuffle=True, seed=7, device_cache=True)
        assert dev.device_cache
        for (hi, ht), (di, dt) in zip(host, dev):
            np.testing.assert_array_equal(np.asarray(hi), np.asarray(di))
            np.testing.assert_array_equal(np.asarray(ht), np.asarray(dt))


def test_batch_loader_device_cache_budget_fallback():
    ds = synthetic_cls(n=10, img_size=8)
    loader = BatchLoader(ds, 3, shuffle=False, device_cache=True,
                         device_cache_budget=16)  # arrays exceed 16 bytes
    assert not loader.device_cache
    assert sum(len(np.asarray(l)) for _, l in loader) == 10


def test_batch_loader_device_cache_yields_to_late_sharding():
    """train_model assigns loader.sharding AFTER construction for mesh runs;
    the device cache must stand down at iteration time so batches get the
    sharded placement."""
    import jax

    ds = synthetic_cls(n=8, img_size=8)
    loader = BatchLoader(ds, 4, shuffle=False, device_cache=True)
    assert loader.device_cache
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[-1])
    loader.sharding = sharding
    for images, _ in loader:
        assert images.sharding == sharding  # host path honored the sharding
