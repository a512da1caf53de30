"""MultiSmoothLoss for S3N's four heads.

Reference: ``model/loss/S3N_loss.py:6-35`` — heads at index 1 (origin) and
the last (sampler1) use a custom smoothing where the true class gets
``smooth_ratio`` and every other class ``(1−r)/(C−1)``; the remaining heads
(aggregation, sampler) use plain CE. Head order: [aggregation, origin,
sampler, sampler1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..registry import LOSS


class MultiSmoothLoss:
    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.smooth_ratio = float(get("smooth_ratio", 0.85))

    def _smooth_ce(self, logits, labels, weights):
        c = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, c)
        ymask = self.smooth_ratio * onehot + (1 - self.smooth_ratio) * (
            1 - onehot) / (c - 1)
        losses = -(jax.nn.log_softmax(logits, -1) * ymask).sum(-1)
        if weights is None:
            return losses.mean()
        return (losses * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    def _plain_ce(self, logits, labels, weights):
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        if weights is None:
            return losses.mean()
        return (losses * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    def __call__(self, outputs, batch):
        labels = batch["label"]
        w = batch.get("weight")
        heads = [outputs["logits"], outputs["agg_origin"],
                 outputs["agg_sampler"], outputs["agg_sampler1"]]
        loss = 0.0
        for i, logits in enumerate(heads):
            if i in (1, len(heads) - 1):
                loss = loss + self._smooth_ce(logits, labels, w)
            else:
                loss = loss + self._plain_ce(logits, labels, w)
        return loss


LOSS.register(MultiSmoothLoss, name="MultiSmoothLoss")
