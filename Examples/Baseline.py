#!/usr/bin/env python
"""Baseline ResNet-50 training (reference Examples/Baseline.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer


class BaselineTrainer(Trainer):
    pass


if __name__ == "__main__":
    BaselineTrainer().train()
