"""HTTP inference server end-to-end test (loopback, fresh-init weights)."""

import base64
import io
import json
import urllib.request

import numpy as np
import pytest

import jax

from medseg_tpu.core.config import EvalConfig
from medseg_tpu.core.registry import get_model
from medseg_tpu.infer.server import InferenceServer
from medseg_tpu.train import checkpoint as ckpt


def test_server_predict_roundtrip(tmp_path, rng_np):
    PIL = pytest.importorskip("PIL.Image")
    for name, seg in (("ResNet18", False), ("AttentionUNet", True)):
        model = get_model(name)["factory"]()
        variables = model.init(jax.random.key(0),
                               np.zeros((1, 64, 64, 3), np.float32))
        sub = "segmentation_models" if seg else "classification_models"
        ckpt.save_best(str(tmp_path / sub), name, seg, variables["params"],
                       variables.get("batch_stats", {}))

    server = InferenceServer(EvalConfig(weights_root=str(tmp_path)))
    httpd, port = server.start_background()
    try:
        img = rng_np.integers(0, 256, (80, 80, 3), np.uint8)
        buf = io.BytesIO()
        PIL.fromarray(img).save(buf, format="PNG")
        payload = {
            "image": base64.b64encode(buf.getvalue()).decode(),
            "classification_model": "ResNet18",
            "segmentation_model": "AttentionUNet",
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["prediction"] in ("COVID", "Healthy", "Non-COVID")
        assert 0 <= out["confidence"] <= 100
        if out["prediction"] == "COVID" and out["overlay"]:
            overlay = np.asarray(PIL.open(io.BytesIO(
                base64.b64decode(out["overlay"]))))
            assert overlay.shape == img.shape

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["models"]["classification"] == "ResNet18"
    finally:
        httpd.shutdown()


def test_server_bad_request():
    server = InferenceServer(EvalConfig(weights_root="/nonexistent"))
    httpd, port = server.start_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not json",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()


def test_server_micro_batching_concurrent(tmp_path, rng_np):
    """Concurrent requests within the window ride ONE pipeline forward
    (stats.max_batch > 1) and all receive valid, independent responses."""
    PIL = pytest.importorskip("PIL.Image")
    import threading

    model = get_model("ResNet18")["factory"]()
    variables = model.init(jax.random.key(0),
                           np.zeros((1, 64, 64, 3), np.float32))
    ckpt.save_best(str(tmp_path / "classification_models"), "ResNet18", False,
                   variables["params"], variables.get("batch_stats", {}))

    server = InferenceServer(EvalConfig(weights_root=str(tmp_path)))
    # widen the window so the (slow, single-core CI) threads land together
    server.BATCH_WINDOW_S = 0.5
    httpd, port = server.start_background()
    try:
        def make_payload(i):
            img = rng_np.integers(0, 256, (64, 64, 3), np.uint8)
            buf = io.BytesIO()
            PIL.fromarray(img).save(buf, format="PNG")
            return json.dumps({
                "image": base64.b64encode(buf.getvalue()).decode(),
            }).encode()

        outs = [None] * 4
        def post(i, data):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=data,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as resp:
                outs[i] = json.loads(resp.read())

        threads = [threading.Thread(target=post, args=(i, make_payload(i)))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for out in outs:
            assert out is not None
            assert out["prediction"] in ("COVID", "Healthy", "Non-COVID")
        assert server.stats["requests"] == 4
        assert server.stats["max_batch"] >= 2, server.stats
    finally:
        httpd.shutdown()
