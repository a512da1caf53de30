"""MGE loss: mean of label-smoothed CE over all 10 logit heads.

Reference: ``Examples/MGE_CNN.py:37-56`` (sum of per-head CE averaged).
"""

from __future__ import annotations

from . import cross_entropy
from ..registry import LOSS


class MGELoss:
    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.label_smoothing = float(get("label_smoothing", 0.1))

    def __call__(self, outputs, batch):
        heads = outputs["all_logits"]  # [N, B, C]
        n = heads.shape[0]
        total = 0.0
        for i in range(n):
            total = total + cross_entropy(heads[i], batch["label"],
                                          self.label_smoothing,
                                          weights=batch.get("weight"))
        return total / n


LOSS.register(MGELoss, name="MGELoss")
