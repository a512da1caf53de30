"""MAMC loss: CE + N-pairs multi-attention multi-class constraint.

Reference: ``model/loss/MAMC_loss.py:6,24`` — for B samples × P attention
parts, L2-normalized part features form an n=B·P similarity matrix; anchors
accumulate log(1 + Σ_neg exp(sim_neg − sim_pos)) over three quadrant
partitions (same-attention/same-class positives vs progressively distant
negatives, eq. 11 of the MAMC paper).

TPU design: the reference loops over all n anchors in Python (O(n) host
loop); here the whole thing is a masked-logsumexp computation — with
S_i = Σ_k neg_mask[i,k]·exp(sim[i,k]) precomputed per anchor, every term is
log1p(exp(−sim[i,j])·S_i), fully vectorized over the [n, n] grid
(SURVEY §7 step 7 explicitly calls for this transform).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import cross_entropy
from ..registry import LOSS


def npairs_mamc(parts, labels, weights=None):
    """parts: [B, P, D]; labels: [B] int; weights: [B] 0/1 padding mask
    (pad rows are duplicated real samples — they must not contribute as
    anchors, positives, or negatives). Returns scalar n-pairs loss."""
    b, p, d = parts.shape
    n = b * p
    x = parts.reshape(n, d).astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    sim = x @ x.T  # [n, n], values in [-1, 1]

    lab = jnp.repeat(labels, p)  # [n]
    part = jnp.tile(jnp.arange(p), b)  # [n]
    same_class = lab[:, None] == lab[None, :]
    same_part = part[:, None] == part[None, :]

    if weights is None:
        valid = jnp.ones((n,), bool)
        n_anchor = jnp.asarray(float(n))
    else:
        valid = jnp.repeat(weights > 0, p)  # [n]
        n_anchor = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    vpair = valid[:, None] & valid[None, :]

    s_sasc = same_class & same_part & vpair
    s_sadc = (~same_class) & same_part & vpair
    s_dasc = same_class & (~same_part) & vpair
    s_dadc = (~same_class) & (~same_part) & vpair

    def quadrant_loss(pos_mask, neg_mask):
        # S_i = sum over negatives of exp(sim)
        neg_exp = jnp.where(neg_mask, jnp.exp(sim), 0.0).sum(axis=1)  # [n]
        terms = jnp.log1p(jnp.exp(-sim) * neg_exp[:, None])  # [n, n]
        return jnp.where(pos_mask, terms, 0.0).sum()

    loss = (
        quadrant_loss(s_sasc, s_sadc | s_dasc | s_dadc)
        + quadrant_loss(s_sadc, s_dadc)
        + quadrant_loss(s_dasc, s_dadc)
    )
    return loss / n_anchor


class MAMCLoss:
    """CE (label smoothing 0.1) + λ·n-pairs over attention parts."""

    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.lambda_a = float(get("lambda_a", 0.5))
        self.use_mamc = bool(get("use_mamc", True))

    def __call__(self, outputs, batch):
        loss_ce = cross_entropy(outputs["logits"], batch["label"], 0.1,
                                weights=batch.get("weight"))
        if not self.use_mamc or "parts" not in outputs:
            return loss_ce
        return loss_ce + self.lambda_a * npairs_mamc(
            outputs["parts"], batch["label"], weights=batch.get("weight"))


LOSS.register(MAMCLoss, name="MAMCLoss")
