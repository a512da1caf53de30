"""Compact bilinear pooling (count-sketch + FFT).

Reference semantics: ``model/methods/CBCNN.py:38-164`` — two fixed count
sketches (random hash h ∈ [d], sign s ∈ {±1}, seeds fixed for
reproducibility) project C-dim features to d-dim; the bilinear outer product
is computed implicitly via FFT: ``ifft(fft(Ψ1(x)) * fft(Ψ2(x))).real``,
sum-pooled over spatial positions, then signed-sqrt + L2.

TPU design deltas:
- The sketch Ψ(x) = s ⊙ scatter_h(x) is materialized as a dense [C, d]
  matrix (the reference builds the same dense matrix,
  ``CBCNN.py:137-164``) so the projection is an MXU matmul.
- rfft/irfft over the last (d) axis batched over B·H·W — XLA lowers these
  to its TPU FFT; d defaults to 6000 per ``configs/CBCNN_S1.yaml``.
- The product-of-ffts runs per spatial position, then sum-pools, matching
  the reference order (sum of products, not product of sums).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def make_sketch_matrix(in_dim: int, out_dim: int, seed_h: int, seed_s: int,
                       dtype=np.float32):
    """Dense count-sketch matrix [in_dim, out_dim]: one ±1 per row at a
    hashed column (fixed seeds → fixed sketch, reference seeds 1/3/5/7)."""
    rng_h = np.random.RandomState(seed_h)
    rng_s = np.random.RandomState(seed_s)
    h = rng_h.randint(0, out_dim, size=in_dim)
    s = rng_s.randint(0, 2, size=in_dim) * 2 - 1
    m = np.zeros((in_dim, out_dim), dtype)
    m[np.arange(in_dim), h] = s.astype(dtype)
    return m


def compact_bilinear_pool(features, sketch1, sketch2, *, signed_sqrt=True,
                          l2_normalize=True, eps=1e-10):
    # eps default matches the reference's signed sqrt (CBCNN.py:133)
    """[B, H, W, C] → [B, d] compact bilinear descriptor.

    sketch1/sketch2: [C, d] dense count-sketch matrices (jnp arrays).
    """
    b, h, w, c = features.shape
    d = sketch1.shape[1]
    x = features.reshape(b * h * w, c).astype(jnp.float32)
    p1 = x @ sketch1  # [BHW, d]  (MXU)
    p2 = x @ sketch2
    f1 = jnp.fft.rfft(p1, axis=-1)
    f2 = jnp.fft.rfft(p2, axis=-1)
    prod = f1 * f2
    cbp = jnp.fft.irfft(prod, n=d, axis=-1)  # [BHW, d]
    v = cbp.reshape(b, h * w, d).sum(axis=1)  # sum-pool over positions
    if signed_sqrt:
        v = jnp.sign(v) * jnp.sqrt(jnp.abs(v) + eps)
    if l2_normalize:
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v
