"""Peak stimulation: local-maximum finding with mean-filter gating.

Reference: ``model/methods/S3N.py:57-98`` — a custom autograd Function whose
forward finds peaks as (x == maxpool_w(x)) above the per-map mean, returns a
dynamic peak LIST plus the peak-averaged aggregation, and whose hand-written
backward routes the aggregation gradient uniformly onto peak positions.

TPU design: the peak set stays a static-shape MASK (no dynamic lists); the
aggregation is ``sum(x·mask)/sum(mask)`` with the mask under stop_gradient —
autodiff then produces exactly the reference's custom backward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def peak_mask(x, win_size: int = 3, use_mean_filter: bool = True):
    """x: [..., H, W] response maps → bool mask of local maxima.

    A position is a peak iff it equals the max of its win×win neighborhood
    (window clipped at borders via -inf padding) and, optionally, is >= the
    map mean (reference ``_mean_filter``).
    """
    assert win_size % 2 == 1
    pad = (win_size - 1) // 2
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    padded = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)],
                     constant_values=neg_inf)
    pooled = jax.lax.reduce_window(
        padded, neg_inf, jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (win_size, win_size),
        window_strides=(1,) * x.ndim,
        padding="VALID")
    mask = x >= pooled
    if use_mean_filter:
        mean = x.mean(axis=(-2, -1), keepdims=True)
        mask = mask & (x >= mean)
    return mask


def peak_stimulation(x, win_size: int = 3, use_mean_filter: bool = True):
    """Returns (mask [..., H, W] bool, aggregation [...] = peak-mean of x)."""
    mask = jax.lax.stop_gradient(peak_mask(x, win_size, use_mean_filter))
    m = mask.astype(x.dtype)
    agg = (x * m).sum(axis=(-2, -1)) / jnp.maximum(m.sum(axis=(-2, -1)), 1e-6)
    return mask, agg
