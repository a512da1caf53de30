"""API-Net loss: CE over all four logit sets + margin ranking.

Reference: ``model/loss/APINet_loss.py:5-44`` — CE(label smoothing 0.1) on
[self_logits; other_logits] and MarginRankingLoss(margin=0.05) pushing each
sample's self-gated score above its other-gated score.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import cross_entropy
from ..registry import LOSS


class APINetLoss:
    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.margin = float(get("margin", 0.05))

    def __call__(self, outputs, batch):
        if "self_logits" not in outputs:  # val mode: plain CE
            return cross_entropy(outputs["logits"], batch["label"], 0.1,
                                 weights=batch.get("weight"))
        self_logits = outputs["self_logits"]   # [2N, C]
        other_logits = outputs["other_logits"]  # [2N, C]
        labels = outputs["pair_labels"]         # [2N]
        pair_w = outputs.get("pair_weight")     # [2N] or None

        logits = jnp.concatenate([self_logits, other_logits], axis=0)
        targets = jnp.concatenate([labels, labels], axis=0)
        ce_w = None if pair_w is None else jnp.concatenate([pair_w, pair_w])
        softmax_loss = cross_entropy(logits, targets, 0.1, weights=ce_w)

        n2 = self_logits.shape[0]
        idx = jnp.arange(n2)
        self_scores = jax.nn.softmax(self_logits, axis=-1)[idx, labels]
        other_scores = jax.nn.softmax(other_logits, axis=-1)[idx, labels]
        # MarginRankingLoss(margin)(x1, x2, y=1) = mean(max(0, -(x1-x2)+m))
        hinge = jnp.maximum(0.0, -(self_scores - other_scores) + self.margin)
        if pair_w is None:
            rank_loss = hinge.mean()
        else:
            rank_loss = (hinge * pair_w).sum() / jnp.maximum(pair_w.sum(), 1.0)
        return softmax_loss + rank_loss


LOSS.register(APINetLoss, name="APINetLoss")
