"""Deterministic seeding: two identical runs produce identical parameters
(reference utils/utils.py:102-108 + cudnn flags; here XLA + explicit keys)."""

import numpy as np

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.engine import Trainer


def _run(tmp_path, name):
    cfg = ConfigNode({
        "experiment": {"name": name, "log_dir": str(tmp_path), "seed": 7,
                       "debug": True},
        "dataset": {"name": "synthetic", "length": 16, "batch_size": 8,
                    "num_workers": 0,
                    "transformer": {"image_size": 32, "resize_size": 36}},
        "model": {"name": "ResNet18", "num_classes": 4},
        "train": {"epoch": 2,
                  "optimizer": {"name": "SGD", "lr": 0.05, "momentum": 0.9},
                  "scheduler": {"name": "CosineAnnealingLR", "T_max": 2},
                  "criterion": {"name": "CrossEntropyLoss"}},
    })
    cfg.freeze()
    t = Trainer(cfg)
    t.train()
    return (np.asarray(t.state.params["backbone"]["conv1"]["kernel"]),
            t.performance_meters["train"]["loss"].values)


def test_same_seed_same_trajectory(tmp_path):
    w1, losses1 = _run(tmp_path, "det_a")
    w2, losses2 = _run(tmp_path, "det_b")
    np.testing.assert_array_equal(w1, w2)
    assert losses1 == losses2
