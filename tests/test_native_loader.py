"""Native C++ loader tests: decode/resize parity vs the Python (cv2) path."""

import numpy as np
import pytest

from medseg_tpu.native import loader


@pytest.fixture(scope="module")
def built():
    if not loader.available():
        if not loader.build(verbose=True):
            pytest.skip("native loader could not be built (no g++/libpng)")
    return True


@pytest.fixture
def png_dir(tmp_path, rng_np):
    cv2 = pytest.importorskip("cv2")
    paths = []
    arrs = []
    for i, (h, w) in enumerate([(299, 299), (128, 200), (64, 64)]):
        arr = rng_np.integers(0, 256, (h, w, 3), np.uint8)
        p = tmp_path / f"img{i}.png"
        cv2.imwrite(str(p), arr[:, :, ::-1])  # cv2 writes BGR
        paths.append(str(p))
        arrs.append(arr)
    return paths, arrs


def test_decode_resize_rgb_matches_cv2(built, png_dir):
    cv2 = pytest.importorskip("cv2")
    paths, arrs = png_dir
    out = loader.decode_resize_batch(paths, 256, letterbox=False, gray=False)
    assert out.shape == (3, 256, 256, 3)
    for i, arr in enumerate(arrs):
        want = cv2.resize(arr.astype(np.float32), (256, 256),
                          interpolation=cv2.INTER_LINEAR)
        diff = np.abs(out[i].astype(np.float32) - want)
        assert diff.max() <= 1.01, f"img{i}: max diff {diff.max()}"


def test_decode_letterbox(built, png_dir):
    paths, arrs = png_dir
    out = loader.decode_resize_batch(paths, 256, letterbox=True, gray=False)
    # 128x200 image: scale 1.28 -> 164x256 content, centered vertically
    h, w = arrs[1].shape[:2]
    scale = 256 / max(h, w)
    nh = round(h * scale)
    top = (256 - nh) // 2
    assert out[1][:top].max() == 0
    assert out[1][top + nh:].max() == 0
    assert out[1][top:top + nh].mean() > 10


def test_decode_gray_nearest(built, png_dir, rng_np, tmp_path):
    cv2 = pytest.importorskip("cv2")
    mask = (rng_np.random((299, 299)) > 0.5).astype(np.uint8) * 255
    p = tmp_path / "mask.png"
    cv2.imwrite(str(p), mask)
    out = loader.decode_resize_batch([str(p)], 256, letterbox=False,
                                     gray=True, nearest=True)
    assert out.shape == (1, 256, 256)
    want = cv2.resize(mask, (256, 256), interpolation=cv2.INTER_NEAREST)
    assert (out[0] != want).mean() < 0.01
    assert set(np.unique(out[0])).issubset({0, 255})


def test_missing_file_reports_index(built, tmp_path):
    with pytest.raises(RuntimeError, match="0"):
        loader.decode_resize_batch([str(tmp_path / "nope.png")], 64,
                                   letterbox=False, gray=False)
