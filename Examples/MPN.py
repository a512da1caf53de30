#!/usr/bin/env python
"""Fast MPN-COV training.

Param groups: backbone at 0.2x the base LR, DR conv + classifier at 1x
(reference ``Examples/MPN.py:13-18``); warmup+cosine schedule
(``Examples/MPN.py:20-31``) via the scheduler config's warmup fields.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer
from hawkeye_tpu.engine.optim import make_prefix_labeler


class MPNTrainer(Trainer):
    def get_param_groups(self):
        return make_prefix_labeler({"backbone": "backbone"}), {
            "backbone": 0.2,
            "head": 1.0,
        }


if __name__ == "__main__":
    MPNTrainer().train()
