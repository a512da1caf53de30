"""APCNN loss: sum of label-smoothed CE over the 8 heads
(reference ``Examples/APCNN.py:49``)."""

from __future__ import annotations

from . import cross_entropy
from ..registry import LOSS


class APCNNLoss:
    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.label_smoothing = float(get("label_smoothing", 0.1))

    def __call__(self, outputs, batch):
        heads = outputs["all_logits"]
        total = 0.0
        for i in range(heads.shape[0]):
            total = total + cross_entropy(heads[i], batch["label"],
                                          self.label_smoothing,
                                          weights=batch.get("weight"))
        return total


LOSS.register(APCNNLoss, name="APCNNLoss")
