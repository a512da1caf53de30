"""Tester works across method output styles: BN-free BCNN (no batch_stats),
region-proposal NTS-Net (dict outputs, anchors at eval)."""

import os

import pytest

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.engine import Tester, Trainer


def _train_and_save(tmp_path, name, model_cfg, criterion, image_size=64):
    cfg = ConfigNode({
        "experiment": {"name": name, "log_dir": str(tmp_path), "seed": 0,
                       "debug": True},
        "dataset": {"name": "synthetic", "length": 8, "batch_size": 4,
                    "num_workers": 0,
                    "transformer": {"image_size": image_size,
                                    "resize_size": image_size + 8}},
        "model": model_cfg,
        "train": {"epoch": 1,
                  "optimizer": {"name": "SGD", "lr": 0.01},
                  "scheduler": {"name": "CosineAnnealingLR", "T_max": 1},
                  "criterion": criterion},
    })
    cfg.freeze()
    t = Trainer(cfg)
    t.train()
    return os.path.join(t.log_root, "best_model.msgpack")


@pytest.mark.parametrize("model_cfg,criterion", [
    ({"name": "BCNN", "stage": 2, "num_classes": 4, "backbone": "vgg11"},
     {"name": "CrossEntropyLoss"}),
    ({"name": "NTSNet", "num_classes": 4, "image_size": 64,
      "proposal_num": 3, "cat_num": 2, "backbone": "resnet18"},
     {"name": "NTSLoss"}),
], ids=["BCNN", "NTSNet"])
def test_tester_handles_method(tmp_path, model_cfg, criterion):
    best = _train_and_save(tmp_path, f"t_{model_cfg['name']}", model_cfg,
                           criterion)
    test_cfg = ConfigNode({
        "experiment": {"name": "eval"},
        "dataset": {"name": "synthetic", "length": 8, "batch_size": 4,
                    "num_workers": 0, "num_classes": 4,
                    "transformer": {"image_size": 64, "resize_size": 72}},
        "model": {**model_cfg, "load": best},
    })
    test_cfg.freeze()
    acc = Tester(test_cfg).test()
    assert 0.0 <= acc <= 100.0


def test_tester_device_pipeline(tmp_path):
    """Tester with `dataset.pipeline: device`: host decode + in-graph
    center-crop/normalize matches the Trainer's device eval path."""
    import jax
    import numpy as np

    import hawkeye_tpu.models  # noqa: F401
    from hawkeye_tpu.config import ConfigNode
    from hawkeye_tpu.engine import Tester, checkpoint as ckpt
    from hawkeye_tpu.registry import MODEL

    model = MODEL.get("ResNet18")(ConfigNode({"num_classes": 4}))
    import jax.numpy as jnp

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                           train=False)
    path = str(tmp_path / "m.msgpack")
    ckpt.save_model(path, variables)

    cfg = ConfigNode({
        "dataset": {"name": "synthetic", "length": 16, "batch_size": 8,
                    "num_workers": 0, "pipeline": "device",
                    "transformer": {"image_size": 32, "resize_size": 36}},
        "model": {"name": "ResNet18", "num_classes": 4, "load": path},
    })
    cfg.freeze()
    tester = Tester(cfg)
    acc = tester.test()
    assert 0.0 <= acc <= 100.0
