#!/usr/bin/env python
"""CrossX training (reference Examples/CrossX.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer


class CrossXTrainer(Trainer):
    pass


if __name__ == "__main__":
    CrossXTrainer().train()
