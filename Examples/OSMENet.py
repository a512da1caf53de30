#!/usr/bin/env python
"""OSME + MAMC (reference Examples/OSMENet.py:18-33): BalancedBatchSampler
(n_classes × n_samples) so n-pairs has in-batch positives."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.data import BalancedBatchSampler
from hawkeye_tpu.engine import Trainer


class BalancedSamplerTrainer(Trainer):
    """Shared base for methods that need P×K balanced train batches."""

    def get_sampler(self, split, ds_config):
        if split == "train":
            return BalancedBatchSampler(
                self.datasets["train"].labels,
                n_classes=int(ds_config.n_classes),
                n_samples=int(ds_config.n_samples),
                seed=self.seed,
            )
        return super().get_sampler(split, ds_config)


class OSMETrainer(BalancedSamplerTrainer):
    pass


if __name__ == "__main__":
    OSMETrainer().train()
