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
