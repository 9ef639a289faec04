"""Demo handler wiring (stubbed gradio) + dataset-installer tree logic.

Covers the two reference surfaces that can't execute in this environment
(gradio and kagglehub are absent): the demo's confidence classing /
COVID-only overlay gate (reference demo/app.py:138-162) and the installer's
rename/delete/move semantics (utils/install_dataset.py:32-54)."""

import types

import numpy as np
import pytest

from medseg_tpu.apps.demo import CSS, make_handlers


class _FakeGr:
    @staticmethod
    def update(**kw):
        return dict(kw)


class _FakePipeline:
    """Scripted Pipeline: returns a queued (pred, conf, overlay, text)."""

    def __init__(self, results):
        self.results = list(results)
        self.loaded = []

    def _load_models(self, cls_name, seg_name):
        self.loaded.append((cls_name, seg_name))

    def process_image(self, image, seg_name, overlay_opacity=0.5):
        return self.results.pop(0)


def test_css_is_the_full_reference_port():
    for selector in (".heading", ".primary-button:hover", ".results-container",
                     ".confidence-high", ".confidence-medium", ".confidence-low",
                     ".diagnosis-text", ".image-controls", ".accordion",
                     '[data-testid="image"]:hover'):
        assert selector in CSS, selector
    assert "#00B894" in CSS and "#FF4757" in CSS


@pytest.mark.parametrize("conf,want_class", [
    (95.0, "confidence-high"), (80.0, "confidence-medium"),
    (70.0, "confidence-low"), (10.0, "confidence-low")])
def test_handle_confidence_classes(conf, want_class):
    overlay = np.zeros((4, 4, 3), np.uint8)
    pipe = _FakePipeline([("COVID", conf, overlay, "txt")])
    handle, _ = make_handlers(pipe, _FakeGr)
    pred, conf_upd, img_upd, details = handle("img", "ResNet18", "ResNetUnet", 0.5)
    assert pred == "COVID"
    assert conf_upd["elem_classes"] == [want_class]
    assert img_upd["visible"] is True  # COVID + overlay -> shown
    assert details["visible"] is True
    assert pipe.loaded == [("ResNet18", "ResNetUnet")]


def test_handle_hides_overlay_for_non_covid():
    pipe = _FakePipeline([("Healthy", 99.0, None, "advice")])
    handle, clear_all = make_handlers(pipe, _FakeGr)
    pred, conf_upd, img_upd, details = handle("img", "VGG16", "R2Unet", 0.3)
    assert pred == "Healthy"
    assert img_upd["visible"] is False
    assert conf_upd["elem_classes"] == ["confidence-high"]
    out = clear_all()
    assert out[0] is None and out[2]["visible"] is False


def test_builtin_demo_page_surface():
    """The gradio-free page mirrors the Blocks surface: both model
    dropdowns, the opacity slider, the handler thresholds (shared
    CONF_HIGH/CONF_MED constants, so JS and gradio handlers can't drift),
    the COVID-only overlay rule, and the design.css classes."""
    from medseg_tpu.apps.demo import (CLS_CHOICES, CONF_HIGH, CONF_MED,
                                      SEG_CHOICES, builtin_demo_page)

    page = builtin_demo_page()
    for name in CLS_CHOICES + SEG_CHOICES:
        assert f"<option{' selected' if name in ('ResNet18', 'ResNetUnet') else ''}>{name}</option>" in page
    assert 'id="opacity"' in page and 'step="0.05"' in page
    assert f"out.confidence > {CONF_HIGH} ?" in page
    assert f"out.confidence > {CONF_MED} ?" in page
    assert 'out.prediction === "COVID" && out.overlay' in page
    for cls in ("confidence-high", "confidence-medium", "confidence-low",
                "primary-button", "results-container", "heading",
                "upload-image", "diagnosis-text", "accordion"):
        assert cls in page, cls


def test_builtin_demo_served_live():
    """The builtin demo actually executes: mount it on an InferenceServer
    and fetch the page + stylesheet over HTTP (the /predict round trip is
    covered by tests/test_server.py — same endpoint)."""
    import urllib.request

    from medseg_tpu.apps.demo import attach_builtin_ui
    from medseg_tpu.core.config import EvalConfig
    from medseg_tpu.infer.server import InferenceServer

    server = InferenceServer(EvalConfig())
    attach_builtin_ui(server)
    httpd, port = server.start_background()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/",
                                    timeout=30) as resp:
            assert resp.headers["Content-Type"].startswith("text/html")
            page = resp.read().decode()
        assert "Lungs Radiography Analysis" in page
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/design.css",
                                    timeout=30) as resp:
            assert ".confidence-high" in resp.read().decode()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health",
                                    timeout=30) as resp:
            assert b"ok" in resp.read()
    finally:
        httpd.shutdown()


def test_installer_tree_organization(tmp_path):
    """rename Viral Pneumonia->Non-COVID / Normal->Healthy, drop Lung_Opacity
    + metadata files, move everything into dest (install_dataset.py:32-54)."""
    from medseg_tpu.data.install import (FILES_TO_REMOVE,
                                         organize_downloaded_tree)

    src = tmp_path / "download" / "COVID-19_Radiography_Dataset"
    for cls in ("COVID", "Normal", "Viral Pneumonia", "Lung_Opacity"):
        for sub in ("images", "masks"):
            d = src / cls / sub
            d.mkdir(parents=True)
            (d / f"{cls}-1.png").write_bytes(b"png")
    for f in FILES_TO_REMOVE:
        (src / f).write_text("meta")
    dest = tmp_path / "dataset"
    dest.mkdir()

    organize_downloaded_tree(src, dest)

    assert sorted(p.name for p in dest.iterdir()) == [
        "COVID", "Healthy", "Non-COVID"]
    assert (dest / "Non-COVID" / "images" / "Viral Pneumonia-1.png").exists()
    assert (dest / "Healthy" / "masks" / "Normal-1.png").exists()
    assert not src.exists()


def test_cli_parity_command_roundtrip(tmp_path, monkeypatch, capsys):
    """`medseg parity` dry run on synthetic stand-ins: evaluate a fresh-init
    model, then compare against a 'reference' CSV equal to our own output ->
    PASS; against a perturbed one -> FAIL (exit 1)."""
    import pandas as pd

    cv2 = pytest.importorskip("cv2")
    import jax

    from medseg_tpu.apps.cli import main
    from medseg_tpu.core.registry import get_model
    from medseg_tpu.train import checkpoint as ckpt

    root = tmp_path / "dataset"
    rng = np.random.default_rng(0)
    for cls in ("COVID", "Healthy", "Non-COVID"):
        (root / cls / "images").mkdir(parents=True)
        (root / cls / "masks").mkdir(parents=True)
        for i in range(10):
            img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            cv2.imwrite(str(root / cls / "images" / f"{cls}-{i}.png"), img)
            mask = np.zeros((64, 64), np.uint8)
            mask[16:48, 16:48] = 255
            cv2.imwrite(str(root / cls / "masks" / f"{cls}-{i}.png"), mask)

    wroot = tmp_path / "weights"
    model = get_model("ResNet18")["factory"]()
    variables = model.init(jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32))
    ckpt.save_best(str(wroot / "classification_models"), "ResNet18", False,
                   variables["params"], variables.get("batch_stats", {}))

    results = tmp_path / "results"
    ref = tmp_path / "ref_results"
    ref.mkdir()
    args = ["parity", "--root", str(root), "--cache-dir", str(tmp_path / "packed"),
            "--weights-root", str(wroot), "--results-dir", str(results),
            "--reference", str(ref), "--batch-size", "4"]

    # no reference CSVs at all -> exit 2
    with pytest.raises(SystemExit) as ei:
        main(args)
    assert ei.value.code == 2

    # reference == our own output -> PASS
    ours = pd.read_csv(results / "classification_test_results.csv")
    ours.to_csv(ref / "classification_test_results.csv", index=False)
    main(args)
    assert "PARITY PASS" in capsys.readouterr().out

    # perturbed reference -> FAIL (exit 1)
    ours["accuracy"] += 10.0
    ours.to_csv(ref / "classification_test_results.csv", index=False)
    with pytest.raises(SystemExit) as ei:
        main(args)
    assert ei.value.code == 1
