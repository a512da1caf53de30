"""CrossX loss: summed CE + part-correlation regularizers + KL agreement.

Reference: ``model/loss/CrossX_loss.py:6-64`` — RegularLoss decorrelates the
P part features at each of three stages (ulti/plty/cmbn) by penalizing the
upper triangle of the P×P mean-correlation matrix (diagonal as 1−corr);
KL(log_softmax(plty) ‖ softmax(ulti)) + KL(log_softmax(cmbn) ‖ softmax(ulti))
aligns the auxiliary heads with the final head; CE runs on the SUM of the
three heads' logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import cross_entropy
from ..registry import LOSS


def regular_loss(parts, gamma):
    """parts: [B, P, D] part features. Reference RegularLoss semantics."""
    b, p, d = parts.shape
    x = parts.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    # corr[i, j] = mean over (B, B) pairs of <x_a_i, x_b_j>; the double mean
    # of dot products factorizes into a dot of per-part mean vectors.
    m = x.mean(axis=0)  # [P, D]
    corr = m @ m.T  # [P, P]
    corr = jnp.where(jnp.eye(p, dtype=bool), 1.0 - corr, corr)
    return gamma * jnp.sum(jnp.triu(corr))


def _kl_sum(log_q, p):
    """torch KLDivLoss(reduction='sum')(log_q, p) = Σ p·(log p − log_q)."""
    safe_log_p = jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-30)), 0.0)
    return jnp.sum(p * (safe_log_p - log_q))


class CrossXLoss:
    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.num_parts = int(get("num_parts", 2))
        self.gamma = get("gamma", [1.0, 1.0, 1.0])

    def __call__(self, outputs, batch):
        if self.num_parts == 1 or "ulti_parts" not in outputs:
            return cross_entropy(outputs["logits"], batch["label"], 0.1,
                                 weights=batch.get("weight"))
        xf = outputs["logits_ulti"]
        xp = outputs["logits_plty"]
        xc = outputs["logits_cmbn"]
        cls_loss = cross_entropy(xf + xp + xc, batch["label"], 0.1,
                                 weights=batch.get("weight"))
        reg = (
            regular_loss(outputs["ulti_parts"], float(self.gamma[0]))
            + regular_loss(outputs["plty_parts"], float(self.gamma[1]))
            + regular_loss(outputs["cmbn_parts"], float(self.gamma[2]))
        )
        n = xf.shape[0]
        p_ulti = jax.nn.softmax(xf, axis=-1)
        kl = (_kl_sum(jax.nn.log_softmax(xp, -1), p_ulti)
              + _kl_sum(jax.nn.log_softmax(xc, -1), p_ulti)) / n
        return cls_loss + reg + kl


LOSS.register(CrossXLoss, name="CrossXLoss")
