"""Weight conversion tests: fabricate a torchvision-shaped state dict with
torch (cpu) and check it maps onto our Flax trees and that the partial loader
honors shape checks (reference model/utils.py:28-33 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawkeye_tpu.models.weights import (
    convert_torchvision_resnet,
    convert_torchvision_vgg,
    merge_into,
)
from hawkeye_tpu.registry import BACKBONE


def _fake_resnet18_sd():
    """Minimal torchvision-named resnet18 state dict (numpy)."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.randn(c).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32)
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32)
        sd[name + ".running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 1.0

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 128, 256, 512]
    in_c = 64
    for li, c in enumerate(chans, start=1):
        for bj in range(2):
            pfx = f"layer{li}.{bj}"
            conv(pfx + ".conv1", c, in_c if bj == 0 else c, 3)
            bn(pfx + ".bn1", c)
            conv(pfx + ".conv2", c, c, 3)
            bn(pfx + ".bn2", c)
            if bj == 0 and li > 1:
                conv(pfx + ".downsample.0", c, in_c, 1)
                bn(pfx + ".downsample.1", c)
        in_c = c
    sd["fc.weight"] = rng.randn(1000, 512).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd


def test_convert_resnet18_full_coverage():
    sd = _fake_resnet18_sd()
    params, stats = convert_torchvision_resnet(sd)

    model = BACKBONE.get("resnet18")(num_classes=1000)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    merged, report = merge_into(variables, params, stats)
    assert report["skipped_shape"] == []
    assert report["skipped_missing"] == []
    # every parameter in the flax tree got loaded
    from flax.traverse_util import flatten_dict

    n_target = len(flatten_dict(variables["params"])) + len(
        flatten_dict(variables["batch_stats"])
    )
    assert report["loaded"] == n_target

    # spot-check value + layout: conv1 OIHW -> HWIO
    got = np.asarray(merged["params"]["conv1"]["kernel"])
    assert np.allclose(got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    got_fc = np.asarray(merged["params"]["fc"]["kernel"])
    assert np.allclose(got_fc, sd["fc.weight"].T)
    # model still runs with loaded weights
    out = model.apply(merged, x, train=False)
    assert out["logits"].shape == (1, 1000)


def test_partial_load_shape_mismatch_skipped():
    sd = _fake_resnet18_sd()
    sd["fc.weight"] = np.zeros((5, 512), np.float32)  # wrong num_classes
    sd["fc.bias"] = np.zeros((5,), np.float32)
    params, stats = convert_torchvision_resnet(sd)
    model = BACKBONE.get("resnet18")(num_classes=1000)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    merged, report = merge_into(variables, params, stats)
    assert len(report["skipped_shape"]) == 2  # fc kernel+bias rejected
    # original fc intact
    assert merged["params"]["fc"]["kernel"].shape == (512, 1000)


def test_convert_vgg16():
    rng = np.random.RandomState(1)
    sd = {}
    # torchvision vgg16 features conv indices
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    in_c = 3
    for idx, c in zip(conv_idx, chans):
        sd[f"features.{idx}.weight"] = rng.randn(c, in_c, 3, 3).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.randn(c).astype(np.float32)
        in_c = c
    sd["classifier.0.weight"] = rng.randn(4096, 512 * 49).astype(np.float32)
    sd["classifier.0.bias"] = rng.randn(4096).astype(np.float32)
    sd["classifier.3.weight"] = rng.randn(4096, 4096).astype(np.float32)
    sd["classifier.3.bias"] = rng.randn(4096).astype(np.float32)
    sd["classifier.6.weight"] = rng.randn(1000, 4096).astype(np.float32)
    sd["classifier.6.bias"] = rng.randn(1000).astype(np.float32)

    params, stats = convert_torchvision_vgg(sd)
    model = BACKBONE.get("vgg16")(num_classes=1000)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    merged, report = merge_into(variables, params, stats)
    assert report["skipped_shape"] == []
    assert report["skipped_missing"] == []
    out = model.apply(merged, x, train=False)
    assert out["logits"].shape == (1, 1000)
