"""Host (PIL) transform presets: every augmentation op executes and the
presets keep their output contract."""

import random

import numpy as np
from PIL import Image

from hawkeye_tpu.data.transforms_host import (
    EvalPreset,
    TrainPreset,
    _TA_WIDE_SPACE,
    _ta_ops,
    auto_augment,
    center_crop,
    random_erase,
    random_resized_crop,
    rand_augment,
    resize_shorter,
    trivial_augment_wide,
)


def _img(h=48, w=40):
    return Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8))


def test_every_ta_op_executes():
    ops = _ta_ops()
    img = _img()
    for name, (lo, hi, signed) in _TA_WIDE_SPACE.items():
        for m in (lo, (lo + hi) / 2, hi):
            out = ops[name](img, m)
            assert out.size == img.size, name


def test_policies_run():
    random.seed(0)
    img = _img()
    for _ in range(20):
        assert trivial_augment_wide(img).size == img.size
        assert rand_augment(img).size == img.size
        assert auto_augment(img).size == img.size


def test_geometry_helpers():
    img = _img(100, 60)
    r = resize_shorter(img, 30)
    assert min(r.size) == 30
    c = center_crop(r, 30)
    assert c.size == (30, 30)
    rrc = random_resized_crop(img, 32)
    assert rrc.size == (32, 32)


def test_random_erase_statistics():
    random.seed(0)
    arr = np.ones((32, 32, 3), np.float32)
    erased = random_erase(arr, p=1.0, value=0.0)
    assert (erased == 0).any()
    untouched = random_erase(arr, p=0.0)
    assert (untouched == 1).all()


def test_presets_output_contract():
    img = _img(80, 70)
    for policy in ("ta_wide", "ra", "aa", None):
        t = TrainPreset(32, auto_augment_policy=policy)
        out = t(img)
        assert out.shape == (32, 32, 3) and out.dtype == np.float32
    e = EvalPreset(32, 36)
    out = e(img)
    assert out.shape == (32, 32, 3)
