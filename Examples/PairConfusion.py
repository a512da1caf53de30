#!/usr/bin/env python
"""Pairwise Confusion (reference Examples/PairConfusion.py:10-38): Baseline
ResNet-50 with the euclidean-confusion criterion — no model changes."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer


class PairConfusionTrainer(Trainer):
    pass


if __name__ == "__main__":
    PairConfusionTrainer().train()
