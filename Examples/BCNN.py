#!/usr/bin/env python
"""BCNN two-stage training.

Stage 1 (``configs/BCNN_S1.yaml``): backbone frozen (model stage=1 stops
gradients), SGD lr=1.0, ReduceLROnPlateau on val accuracy (reference
``Examples/BCNN.py:42-48`` — plateau stepping is built into the base
Trainer's scheduler.step_metric). Stage 2 (``configs/BCNN_S2.yaml``): loads
the stage-1 best model via ``model.load`` and fine-tunes everything.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer


class BCNNTrainer(Trainer):
    pass  # base trainer covers the recipe (plateau scheduler, model.load)


if __name__ == "__main__":
    BCNNTrainer().train()
