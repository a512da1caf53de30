"""Peer-learning loss: agreement/disagreement split + small-loss exchange.

Reference: ``model/loss/peer_learning_loss.py:5-67`` — samples where the two
peers DISAGREE always train both; where they AGREE, each peer keeps only the
(1 − drop_rate) fraction with the LOWEST loss as ranked by its PEER
(cross-selection), dropping likely-noisy web labels. The drop rate ramps
linearly over the first T_k epochs (``Examples/PeerLearning.py:20-24``).

TPU design: the reference gathers dynamic-size index sets; here selection is
a static-shape mask — per-sample CE, rank agreement losses via double
argsort, keep rank < num_remember — so the whole step stays one compiled
program for every epoch's drop_rate (a traced scalar).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..registry import LOSS


def _per_sample_ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


def peer_learning_losses(logits1, logits2, labels, drop_rate, weight=None):
    """Returns (loss1, loss2) scalars with masked small-loss exchange."""
    valid = jnp.ones_like(labels, jnp.float32) if weight is None else weight
    pred1 = jnp.argmax(logits1, -1)
    pred2 = jnp.argmax(logits2, -1)
    agree = (pred1 == pred2) & (valid > 0)
    disagree = (pred1 != pred2) & (valid > 0)

    ce1 = _per_sample_ce(logits1, labels)
    ce2 = _per_sample_ce(logits2, labels)

    n_agree = agree.sum()
    num_remember = jnp.floor((1.0 - drop_rate) * n_agree).astype(jnp.int32)

    def keep_mask(peer_ce):
        """Among agreement samples, keep the num_remember lowest peer losses."""
        masked = jnp.where(agree, peer_ce, jnp.inf)
        order = jnp.argsort(masked)
        ranks = jnp.argsort(order)  # rank of each sample by peer loss
        return agree & (ranks < num_remember)

    keep_for_1 = disagree | keep_mask(ce2)  # peer 2 ranks what peer 1 keeps
    keep_for_2 = disagree | keep_mask(ce1)

    def masked_mean(ce, mask):
        m = mask.astype(jnp.float32)
        return (ce * m).sum() / jnp.maximum(m.sum(), 1.0)

    return masked_mean(ce1, keep_for_1), masked_mean(ce2, keep_for_2)


class PeerLearningLoss:
    """Criterion wrapper: expects 'drop_rate' in the batch (set per epoch by
    the PL trainer's rate scheduler)."""

    def __init__(self, config=None):
        pass

    def __call__(self, outputs, batch):
        loss1, loss2 = peer_learning_losses(
            outputs["logits1"], outputs["logits2"], batch["label"],
            batch.get("drop_rate", 0.0), weight=batch.get("weight"))
        return loss1 + loss2


LOSS.register(PeerLearningLoss, name="PeerLearningLoss")
