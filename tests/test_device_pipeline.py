"""Trainer with dataset.pipeline: device — augmentation inside the jitted
step, host only decoding fixed uint8 tensors."""

import numpy as np

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.engine import Trainer


def test_device_pipeline_end_to_end(tmp_path):
    cfg = ConfigNode({
        "experiment": {"name": "devpipe", "log_dir": str(tmp_path), "seed": 0,
                       "debug": True},
        "dataset": {
            "name": "synthetic", "length": 16, "batch_size": 8,
            "num_workers": 0, "pipeline": "device",
            "transformer": {"image_size": 32, "resize_size": 40},
        },
        "model": {"name": "ResNet18", "num_classes": 4},
        "train": {
            "epoch": 2,
            "optimizer": {"name": "SGD", "lr": 0.02, "momentum": 0.9},
            "scheduler": {"name": "CosineAnnealingLR", "T_max": 2},
            "criterion": {"name": "CrossEntropyLoss"},
        },
    })
    cfg.freeze()
    trainer = Trainer(cfg)
    # loader yields uint8 at decode size
    batch = next(iter(trainer.dataloaders["train"]))
    assert batch["img"].dtype == np.uint8
    assert batch["img"].shape[1:] == (40, 40, 3)
    trainer.train()
    assert len(trainer.performance_meters["val"]["acc"].values) == 2
