"""CIN loss: CE + α · contrastive loss across batch halves.

Reference: ``model/loss/CIN_loss.py:7-47`` — CE on the SCI logits plus a
contrastive term on the projected CCI features: same-class pairs pull
(squared distance), different-class pairs push with margin β (hinge).

Two reference quirks handled deliberately:
- The reference's criterion OWNS a Linear ``h`` (``CIN_loss.py:23``,
  optimized via an extra param group, ``Examples/CIN.py:34-41``). In this
  functional build the projection lives inside the CIN model (outputs
  'pair_embed'), so the loss is parameter-free and ``h`` trains with the
  model — same computation, same gradients.
- The reference's pair labels compare against a single scalar
  (``target[:B//2] == target[B//2]``) and its hinge term is overwritten by
  ``pow(loss_cont_1, 2)`` — both are implementation bugs; we implement the
  paper's eq.(8) semantics (elementwise pair labels, squared hinge).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import cross_entropy
from ..registry import LOSS


class CINLoss:
    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.alpha = float(get("alpha", 2.0))
        self.beta = float(get("beta", 0.5))

    def __call__(self, outputs, batch):
        loss_ce = cross_entropy(outputs["logits"], batch["label"], 0.1,
                                weights=batch.get("weight"))
        if "pair_embed" not in outputs:
            return loss_ce
        z = outputs["pair_embed"]  # [B, R] projected CCI features
        labels = batch["label"]
        half = z.shape[0] // 2
        za, zb = z[:half], z[half:2 * half]
        la, lb = labels[:half], labels[half:2 * half]
        same = (la == lb).astype(jnp.float32)
        # the pull term needs no sqrt (d² directly); the hinge's sqrt gets an
        # epsilon so its gradient is finite at d = 0 — torch's
        # PairwiseDistance hides the same singularity behind eps=1e-6
        # (identical pairs otherwise turn the whole loss NaN via 0·(0/0),
        # and weight-0 PADDED rows are duplicates of the last real row)
        d2 = jnp.sum((za - zb) ** 2, axis=1)
        d = jnp.sqrt(d2 + 1e-12)
        pull = same * d2
        push = (1.0 - same) * jnp.maximum(self.beta - d, 0.0) ** 2
        # a pair only counts when both rows are real (device-padding rows
        # carry weight 0; the reference never pads, so this is a no-op there)
        w = batch.get("weight")
        pair_w = 1.0 if w is None else w[:half] * w[half:2 * half]
        loss_cont = (pair_w * (pull + push)).sum()
        return loss_ce + self.alpha * loss_cont


LOSS.register(CINLoss, name="CINLoss")
