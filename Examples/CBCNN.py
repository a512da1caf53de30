#!/usr/bin/env python
"""CBCNN two-stage training (compact bilinear; see configs/CBCNN_S*.yaml)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer


class CBCNNTrainer(Trainer):
    pass


if __name__ == "__main__":
    CBCNNTrainer().train()
