"""CLI integration tests: split -> pack -> (tiny) train -> eval flow."""

import numpy as np
import pytest

from medseg_tpu.apps.cli import main


@pytest.fixture
def fake_dataset_root(tmp_path, rng_np):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path / "dataset"
    for cls in ("COVID", "Healthy", "Non-COVID"):
        (root / cls / "images").mkdir(parents=True)
        (root / cls / "masks").mkdir(parents=True)
        for i in range(10):
            img = rng_np.integers(0, 256, (40, 40, 3), np.uint8)
            cv2.imwrite(str(root / cls / "images" / f"{cls}-{i}.png"), img)
            mask = (rng_np.random((40, 40)) > 0.5).astype(np.uint8) * 255
            cv2.imwrite(str(root / cls / "masks" / f"{cls}-{i}.png"), mask)
    return str(root)


def test_cli_split_and_pack(fake_dataset_root, tmp_path, capsys):
    cache = str(tmp_path / "cache")
    main(["split", "--root", fake_dataset_root])
    assert (tmp_path / "dataset" / "splits" / "train.csv").exists()
    main(["pack", "--root", fake_dataset_root, "--cache-dir", cache])
    out = capsys.readouterr().out
    assert "packed train/cls: 24 samples" in out
    assert (tmp_path / "cache" / "test_seg_masks.npy").exists()


def test_cli_eval_without_weights(fake_dataset_root, tmp_path, capsys):
    cache = str(tmp_path / "cache")
    main(["split", "--root", fake_dataset_root])
    main(["pack", "--root", fake_dataset_root, "--cache-dir", cache])
    main(["eval", "--cache-dir", cache,
          "--weights-root", str(tmp_path / "nothing"),
          "--results-dir", str(tmp_path / "results")])
    out = capsys.readouterr().out
    assert "Weights not found" in out
    assert "No test results to display" in out


def test_cli_serve_registered():
    import argparse

    with pytest.raises(SystemExit):
        main(["serve", "--help"])


def test_cli_export_torch_roundtrip(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    import jax
    from medseg_tpu.core.registry import get_model
    from medseg_tpu.train import checkpoint as ckpt

    model = get_model("ResNet18")["factory"]()
    variables = model.init(jax.random.key(0),
                           np.zeros((1, 32, 32, 3), np.float32))
    ckpt.save_best(str(tmp_path / "w" / "classification_models"), "ResNet18",
                   False, variables["params"], variables["batch_stats"])
    out = tmp_path / "ResNet18_best_acc.pt"
    main(["export-torch", "ResNet18", "--weights-root", str(tmp_path / "w"),
          "--out", str(out)])
    sd = torch.load(out, weights_only=True)
    assert "conv1.weight" in sd and "fc.1.weight" in sd
    assert sd["conv1.weight"].shape == (64, 3, 7, 7)


def test_cli_train_summary_lists_every_model(fake_dataset_root, tmp_path,
                                             capsys, monkeypatch):
    """The summary must list ALL trained models by task: the reference's
    `"Unet" in k` name filter silently drops AttentionUNet (capital N) from
    its own summary (reference trainer.py:218)."""
    from medseg_tpu.train import trainer as T

    def fake_train(name, train, val, cfg, mesh=None, resume=False,
                   max_restarts=0, **kw):
        score = 0.1234 if "U" in name else 91.5
        return T.TrainResult(name=name, best_score=score, epochs_run=1,
                             state=None)

    monkeypatch.setattr(T, "train_model_resilient", fake_train)
    cache = str(tmp_path / "cache")
    main(["split", "--root", fake_dataset_root])
    main(["pack", "--root", fake_dataset_root, "--cache-dir", cache])
    main(["train", "ResNet18", "AttentionUNet", "--epochs", "1",
          "--cache-dir", cache, "--weights-root", str(tmp_path / "w")])
    out = capsys.readouterr().out
    assert "ResNet18       : 91.50% Acc (Classification)" in out
    assert "AttentionUNet  : 0.1234 Loss (Segmentation)" in out
