#!/usr/bin/env python
"""Interp-Parts training (reference Examples/InterpPartsNet.py): 20× LR for
scratch (non-backbone) params and PER-BATCH cosine annealing over
num_iters × epochs."""

import math
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer
from hawkeye_tpu.engine.optim import make_prefix_labeler


class InterpPartsTrainer(Trainer):
    def __init__(self, config=None):
        self._global_step = 0
        super().__init__(config)
        self._total_steps = max(
            len(self.dataloaders["train"]) * self.total_epoch, 1)
        # resume-safe: a resumed run continues the per-batch cosine where it
        # left off instead of replaying the schedule from the top
        # (load_checkpoint in super().__init__ sets start_epoch)
        self._global_step = self.start_epoch * len(self.dataloaders["train"])

    def get_param_groups(self):
        return make_prefix_labeler({"backbone": "finetune"},
                                   default="scratch"), {
            "finetune": 1.0, "scratch": 20.0}

    def get_scheduler(self, scheduler_config):
        # per-batch cosine handled in batch_lr; epoch scheduler is identity
        from hawkeye_tpu.engine.optim import LRScheduler

        return LRScheduler(float(self.config.train.optimizer.lr))

    def batch_lr(self, epoch_lr):
        base = float(self.config.train.optimizer.lr)
        t = min(self._global_step / self._total_steps, 1.0)
        self._global_step += 1
        return 0.5 * base * (1.0 + math.cos(math.pi * t))


if __name__ == "__main__":
    InterpPartsTrainer().train()
