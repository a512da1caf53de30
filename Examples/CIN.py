#!/usr/bin/env python
"""CIN (reference Examples/CIN.py): balanced 4×5 sampler; the contrastive
projection head trains inside the model (see losses/cin.py docstring)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from Examples.OSMENet import BalancedSamplerTrainer


class CINTrainer(BalancedSamplerTrainer):
    pass


if __name__ == "__main__":
    CINTrainer().train()
