#!/usr/bin/env python
"""AP-CNN training (reference Examples/APCNN.py): summed 8-head CE, manual
per-epoch cosine with backbone at lr/10 (param groups)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer
from hawkeye_tpu.engine.optim import make_prefix_labeler


class APCNNTrainer(Trainer):
    def get_param_groups(self):
        # reference: children[:7] (the resnet trunk) at lr/10, heads at lr
        rules = {"conv1": "trunk", "bn1": "trunk"}
        for i in range(1, 5):
            for j in range(40):
                rules[f"layer{i}_{j}"] = "trunk"
        return make_prefix_labeler(rules, default="head"), {
            "trunk": 0.1, "head": 1.0}


if __name__ == "__main__":
    APCNNTrainer().train()
