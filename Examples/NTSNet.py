#!/usr/bin/env python
"""NTS-Net training (reference Examples/NTSNet.py). The base Trainer covers
the recipe; the model/loss carry all NTS-specific machinery."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer


class NTSNetTrainer(Trainer):
    pass


if __name__ == "__main__":
    NTSNetTrainer().train()
