"""Native JPEG decoder vs PIL reference."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from hawkeye_tpu.data import native_decoder
from hawkeye_tpu.data.transforms_host import center_crop, resize_shorter


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    rng = np.random.RandomState(0)
    # smooth image so JPEG loss stays small
    base = rng.rand(20, 24, 3)
    arr = np.kron(base, np.ones((20, 20, 1)))  # 400x480, blocky-smooth
    arr = (arr * 255).astype(np.uint8)
    p = tmp_path_factory.mktemp("imgs") / "test.jpg"
    Image.fromarray(arr).save(str(p), quality=95)
    return str(p)


def test_native_builds_and_loads():
    assert native_decoder.native_available(), (
        "native decoder failed to build — g++/libjpeg expected in image")


def test_native_matches_pil(jpeg_file):
    target = 128
    got = native_decoder.decode_resize_center(jpeg_file, target)
    assert got is not None
    assert got.shape == (target, target, 3) and got.dtype == np.uint8

    pil = Image.open(jpeg_file).convert("RGB")
    want = np.asarray(center_crop(resize_shorter(pil, target), target))
    # different resamplers (fused bilinear vs PIL two-step); compare loosely
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.mean() < 12, f"mean abs diff {diff.mean()}"


def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"definitely not a jpeg")
    assert native_decoder.decode_resize_center(str(p), 64) is None


def test_fgdataset_uses_native(jpeg_file, tmp_path):
    from hawkeye_tpu.data import FGDataset

    root = os.path.dirname(jpeg_file)
    meta = tmp_path / "meta.txt"
    meta.write_text(f"0 {os.path.basename(jpeg_file)}\n")
    ds = FGDataset(root, str(meta), decode_size=96)
    item = ds[0]
    assert item["img"].shape == (96, 96, 3)
    assert item["img"].dtype == np.uint8


def test_fgdataset_falls_back_for_png(tmp_path):
    from hawkeye_tpu.data import FGDataset

    arr = np.zeros((50, 60, 3), np.uint8)
    png = tmp_path / "img.png"
    Image.fromarray(arr).save(str(png))
    meta = tmp_path / "meta.txt"
    meta.write_text("0 img.png\n")
    ds = FGDataset(str(tmp_path), str(meta), decode_size=32)
    assert ds[0]["img"].shape == (32, 32, 3)
