"""Pairwise Confusion loss: CE + λ · euclidean confusion between batch halves.

Reference: ``model/loss/pair_confusion.py:8-31`` — the batch is split in two;
for pairs with DIFFERENT labels the L2 distance between their logits is
penalized (pulling predictions toward each other to reduce overconfidence).
Note the reference computes CE on the same tensor it confuses (the logits).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import cross_entropy
from ..registry import LOSS


class PairwiseConfusionLoss:
    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.lambda_a = float(get("lambda_a", 10.0))

    def __call__(self, outputs, batch):
        logits = outputs["logits"]
        labels = batch["label"]
        b = logits.shape[0]
        half = b // 2
        left, right = logits[:half], logits[half:2 * half]
        lab_l, lab_r = labels[:half], labels[half:2 * half]
        dist = jnp.linalg.norm(jnp.abs(left - right), axis=1)
        diff = (lab_l != lab_r).astype(jnp.float32)
        w = batch.get("weight")
        if w is not None:  # ignore padded rows
            diff = diff * w[:half] * w[half:2 * half]
        conf = (dist * diff).sum() / b
        loss_ce = cross_entropy(logits, labels, 0.1, weights=w)
        return loss_ce + self.lambda_a * conf


def entropic_confusion(probs):
    """Σ p·log p / B over softmax outputs (reference EntropicConfusion,
    ``model/loss/pair_confusion.py:34-36``) — available API surface."""
    b = probs.shape[0]
    return (probs * jnp.log(jnp.maximum(probs, 1e-12))).sum() / b


LOSS.register(PairwiseConfusionLoss, name="PairwiseConfusionLoss")
