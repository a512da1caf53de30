"""DCL loss: α·CE(class) + β·CE(swap/adversarial) + γ·L1(mask, swap law).

Reference: ``model/loss/DCL_loss.py:4-23``.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import cross_entropy
from ..registry import LOSS


class DCLLoss:
    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.alpha = float(get("alpha", 1.0))
        self.beta = float(get("beta", 1.0))
        self.gamma = float(get("gamma", 1.0))

    def __call__(self, outputs, batch):
        w = batch.get("weight")
        loss_ce = cross_entropy(outputs["logits"], batch["label"], 0.1, weights=w)
        loss_swap = cross_entropy(outputs["swap_logits"], batch["label_swap"],
                                  0.1, weights=w)
        l1 = jnp.abs(outputs["mask"] - batch["swap_law"]).mean(axis=-1)
        if w is not None:
            loss_law = (l1 * w).sum() / jnp.maximum(w.sum(), 1.0)
        else:
            loss_law = l1.mean()
        return self.alpha * loss_ce + self.beta * loss_swap + self.gamma * loss_law


LOSS.register(DCLLoss, name="DCLLoss")
