"""Interp-Parts loss: CE + Wasserstein shaping loss against a Beta prior.

Reference: ``model/loss/InterpParts_loss.py`` — the assignment maps are
Gaussian-blurred (grouped conv), max-pooled to per-part occurrences, sorted
over the batch, and matched in log space against the Beta(α, β) inverse CDF
sampled at batch midpoints (scipy, cached per batch size — the module-global
``prev_bs``/``prior_dist`` cache at ``:8-10``).

TPU notes: batch size is static under jit, so the scipy ICDF grid is
computed at TRACE time and baked as a constant — no host round trip and no
global cache.
"""

from __future__ import annotations

import numpy as np
from scipy import stats

import jax.numpy as jnp

from . import cross_entropy
from ..registry import LOSS


def _gaussian_kernel(radius, std):
    size = 2 * radius + 1
    ii = np.arange(-radius, radius + 1)
    d2 = ii[:, None] ** 2 + ii[None, :] ** 2
    w = np.exp(-d2 / (2 * std * std)).astype(np.float32)
    return w / w.sum()


def shaping_loss(assign, radius, std, alpha, beta, eps=1e-5):
    """assign: [B, H, W, K]. Wasserstein shaping vs Beta(α, β) prior."""
    b, h, w, k = assign.shape
    x = assign.astype(jnp.float32)
    if radius > 0:
        import jax

        kern = jnp.asarray(_gaussian_kernel(radius, std))[..., None, None]
        kern = jnp.tile(kern, (1, 1, 1, k))  # depthwise
        # reference uses an unpadded conv; fall back to SAME only when the
        # map is smaller than the kernel (tiny test inputs)
        padding = "VALID" if min(h, w) > 2 * radius else "SAME"
        x = jax.lax.conv_general_dilated(
            x, kern, (1, 1), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=k)
    part_occ = x.max(axis=(1, 2))  # [B, K]
    emp = jnp.sort(part_occ, axis=0)  # ascending over batch
    # Beta ICDF at batch midpoints — static given the batch size
    grid = (np.arange(1, 2 * b, 2, dtype=np.float64)) / (2 * b)
    prior = stats.beta.ppf(grid, a=alpha, b=beta).astype(np.float32)[:, None]
    return jnp.abs(jnp.log(emp + eps) - jnp.log(jnp.asarray(prior) + eps)).mean()


class InterpPartsLoss:
    def __init__(self, config=None):
        cfg = config or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        self.radius = int(get("radius", 2))
        self.std = float(get("std", 0.4))
        self.alpha = float(get("alpha", 1.0))
        self.beta = float(get("beta", 0.001))
        self.coeff = float(get("coeff", 0.5))

    def __call__(self, outputs, batch):
        # reference uses UNSMOOTHED CE here (InterpParts_loss.py:22)
        loss_ce = cross_entropy(outputs["logits"], batch["label"], 0.0,
                                weights=batch.get("weight"))
        shape = shaping_loss(outputs["assign"], self.radius, self.std,
                             self.alpha, self.beta)
        return loss_ce + self.coeff * shape


LOSS.register(InterpPartsLoss, name="InterpPartsLoss")
