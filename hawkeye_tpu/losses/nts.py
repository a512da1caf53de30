"""NTS loss: raw CE + concat CE + part CE + pairwise proposal ranking hinge.

Reference: ``model/loss/NTS_loss.py:6-47`` — the ranking term iterates
proposals in a Python loop (and hard-codes ``.cuda()``); the part "list
loss" is a per-sample NLL gathered in a list comprehension. Both are plain
masked tensor ops here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import cross_entropy
from ..registry import LOSS


def ranking_hinge(scores, part_losses):
    """Σ_i Σ_j max(0, 1 − s_i + s_j)·[ℓ_j > ℓ_i] / B  (proposals whose part
    loss is higher must score lower)."""
    worse = part_losses[:, None, :] > part_losses[:, :, None]  # [B, i, j]
    margin = 1.0 - scores[:, :, None] + scores[:, None, :]
    hinge = jnp.maximum(margin, 0.0) * worse.astype(margin.dtype)
    return hinge.sum() / scores.shape[0]


class NTSLoss:
    def __init__(self, config=None):
        pass

    def __call__(self, outputs, batch):
        labels = batch["label"]
        w = batch.get("weight")
        raw_loss = cross_entropy(outputs["raw_logits"], labels, 0.1, weights=w)
        concat_loss = cross_entropy(outputs["logits"], labels, 0.1, weights=w)

        part_logits = outputs["part_logits"]  # [B, M, C]
        b, m, c = part_logits.shape
        labels_rep = jnp.repeat(labels, m)
        w_rep = None if w is None else jnp.repeat(w, m)
        partcls_loss = cross_entropy(part_logits.reshape(b * m, c), labels_rep,
                                     0.1, weights=w_rep)

        # unsmoothed per-part NLL drives the ranking (reference list_loss)
        logp = jax.nn.log_softmax(part_logits, axis=-1)
        part_nll = -jnp.take_along_axis(
            logp, labels[:, None, None].repeat(m, 1), axis=-1)[..., 0]  # [B, M]
        rank_loss = ranking_hinge(outputs["top_prob"], part_nll)

        return raw_loss + rank_loss + concat_loss + partcls_loss


LOSS.register(NTSLoss, name="NTSLoss")
