"""ProtoTree loss: NLL on the tree's predicted distribution.

Reference: ``Examples/ProtoTreeNet.py:108`` applies CrossEntropyLoss to
``log(pred)`` (a double log-softmax quirk); the intended objective —
negative log-likelihood of the mixture prediction — is what we implement.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..registry import LOSS


class ProtoTreeLoss:
    def __init__(self, config=None):
        pass

    def __call__(self, outputs, batch):
        logp = outputs["logits"]  # log probabilities [B, C]
        labels = batch["label"]
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        w = batch.get("weight")
        if w is None:
            return nll.mean()
        return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


LOSS.register(ProtoTreeLoss, name="ProtoTreeLoss")


def leaf_update(leaf_params, old_params_over_batches, pa_leaf, leaf_dist,
                pred, labels, num_classes):
    """One derivative-free leaf update (reference Examples/ProtoTreeNet.py:
    115-131): running-average replacement of the old epoch's contribution.

    update[l, c] = Σ_b pa[b, l] · dist[l, c] · 1[y_b = c] / pred[b, c]
    params      := relu(params − old_params/num_batches) + update
    """
    import jax

    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    ratio = onehot / jnp.maximum(pred, 1e-12)  # [B, C]
    update = jnp.einsum("bl,bc->lc", pa_leaf, ratio) * leaf_dist
    new = jnp.maximum(leaf_params - old_params_over_batches, 0.0) + update
    return new
