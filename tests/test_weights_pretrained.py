"""Pretrained-backbone loading path (local files only; zero-egress env)."""

import numpy as np
import jax
import jax.numpy as jnp

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.models.weights import (
    convert_bbn_inat_resnet,
    load_pretrained_backbone,
)
from hawkeye_tpu.registry import BACKBONE


def test_bbn_remap():
    sd = {
        "module.backbone.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "module.backbone.cb_block.conv1.weight": np.zeros((512, 2048, 1, 1),
                                                          np.float32),
        "module.backbone.cb_block.bn1.weight": np.ones((512,), np.float32),
        "module.backbone.cb_block.bn1.bias": np.zeros((512,), np.float32),
        "module.backbone.cb_block.bn1.running_mean": np.zeros((512,), np.float32),
        "module.backbone.cb_block.bn1.running_var": np.ones((512,), np.float32),
        "module.backbone.rb_block.conv1.weight": np.zeros((1,), np.float32),
        "module.classifier.weight": np.zeros((1,), np.float32),
        "module.backbone.bn1.weight": np.ones((64,), np.float32),
        "module.backbone.bn1.bias": np.zeros((64,), np.float32),
        "module.backbone.bn1.running_mean": np.zeros((64,), np.float32),
        "module.backbone.bn1.running_var": np.ones((64,), np.float32),
    }
    params, stats = convert_bbn_inat_resnet(sd)
    assert "conv1/kernel" in params
    assert "layer4_2/conv1/kernel" in params
    # rb_block and classifier dropped
    assert not any("rb_block" in k or "classifier" in k for k in params)


def test_load_pretrained_missing_file_is_noop(tmp_path):
    model = BACKBONE.get("resnet18")(num_classes=0)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = load_pretrained_backbone(variables, str(tmp_path / "nope.pth"),
                                   "resnet", subpath=())
    assert out is variables  # unchanged object


def test_load_pretrained_torch_file(tmp_path):
    import torch

    from tests.test_weights import _fake_resnet18_sd

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in _fake_resnet18_sd().items()}
    path = tmp_path / "r18.pth"
    torch.save(sd, str(path))

    model = BACKBONE.get("resnet18")(num_classes=0)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    merged = load_pretrained_backbone(variables, str(path), "resnet",
                                      subpath=())
    got = np.asarray(merged["params"]["conv1"]["kernel"])
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
