#!/usr/bin/env python
"""Peer-Learning on webly-supervised data (reference Examples/PeerLearning.py):
linear drop-rate ramp over the first T_k epochs, dual peer losses (summed —
the peers' parameters are disjoint so one backward equals the reference's
two), acc1/acc2 meters."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer
from hawkeye_tpu.utils import PerformanceMeter


class PLTrainer(Trainer):
    def __init__(self, config=None):
        super().__init__(config)
        drop_rate = float(self.config.model.get("drop_rate", 0.25))
        t_k = int(self.config.model.get("T_k", 10))
        self.rate_schedule = np.full(self.total_epoch, drop_rate, np.float32)
        self.rate_schedule[:t_k] = np.linspace(0.0, drop_rate, min(t_k, self.total_epoch))

    def get_performance_meters(self):
        meters = super().get_performance_meters()
        for m in ("acc1", "acc2"):
            meters["train"][m] = PerformanceMeter()
            meters["val"][m] = PerformanceMeter()
        return meters

    def prepare_batch(self, batch, train):
        device_batch = super().prepare_batch(batch, train)
        if train:
            device_batch["drop_rate"] = float(self.rate_schedule[self.epoch])
        return device_batch

    def compute_metrics(self, outputs, batch):
        import jax.numpy as jnp

        metrics = super().compute_metrics(outputs, batch)
        if "logits1" in outputs:
            w = batch.get("weight")
            w = jnp.ones(batch["label"].shape, jnp.float32) if w is None else w
            for i in (1, 2):
                pred = jnp.argmax(outputs[f"logits{i}"], -1)
                metrics[f"correct{i}"] = (
                    (pred == batch["label"]).astype(jnp.float32) * w).sum()
        return metrics

    # ------------------------------------------------------------------
    # per-epoch acc1/acc2 reporting (reference train_peer.py epoch meters);
    # device scalars are accumulated lazily and pulled once per epoch so the
    # async dispatch pipeline is not serialized
    # ------------------------------------------------------------------
    def train_epoch(self, lr):
        self._pl_batches = []
        out = super().train_epoch(lr)
        if self._pl_batches:
            c1 = sum(float(b[0]) for b in self._pl_batches)
            c2 = sum(float(b[1]) for b in self._pl_batches)
            n = max(sum(float(b[2]) for b in self._pl_batches), 1.0)
            acc1, acc2 = 100.0 * c1 / n, 100.0 * c2 / n
            self.performance_meters["train"]["acc1"].update(acc1)
            self.performance_meters["train"]["acc2"].update(acc2)
            self.logger.info(
                f"Epoch {self.epoch}: peer acc1 {acc1:.2f} acc2 {acc2:.2f} "
                f"(drop rate {self.rate_schedule[self.epoch]:.3f})")
        return out

    def on_end_batch(self, metrics):
        if "correct1" in metrics:
            self._pl_batches.append(
                (metrics["correct1"], metrics["correct2"], metrics["count"]))


if __name__ == "__main__":
    PLTrainer().train()
