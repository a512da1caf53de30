"""Bilinear (second-order) pooling ops.

Reference semantics: ``model/methods/BCNN.py:13-27`` — for conv features
X ∈ [C, HW]: ``(X @ X^T) / HW`` per image → flatten C² → signed sqrt
(``sign(x)*sqrt(|x|+1e-5)`` — the reference computes ``sqrt(x+1e-5)`` on a
PSD Gram so plain sqrt suffices; we use the signed form which is the
published BCNN normalization and equals it on PSD input) → global L2
normalize → linear classifier.

TPU design: the Gram is ONE batched einsum ``bhwc,bhwd->bcd`` — an MXU
matmul with K = H*W — computed in bf16 inputs with f32 accumulation; the
sqrt/L2 epilogue is elementwise VPU work XLA fuses into the surrounding
kernels. (A hand-written Pallas fusion was benchmarked and XLA's fusion was
already within noise for these shapes; see tests/bench notes.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_pool(features, *, signed_sqrt=True, l2_normalize=True,
                  eps=1e-5):
    """[B, H, W, C] → [B, C*C] bilinear-pooled descriptor.

    Accumulates in f32 regardless of input dtype.
    """
    b, h, w, c = features.shape
    x = features.reshape(b, h * w, c)
    gram = jax.lax.dot_general(
        x, x,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / float(h * w)  # [B, C, C], f32
    v = gram.reshape(b, c * c)
    if signed_sqrt:
        v = jnp.sign(v) * jnp.sqrt(jnp.abs(v) + eps)
    if l2_normalize:
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v


def cross_bilinear_pool(features_a, features_b, *, signed_sqrt=True,
                        l2_normalize=True, eps=1e-5):
    """Two-stream bilinear pooling (X_a^T X_b / HW) for asymmetric BCNN."""
    b, h, w, ca = features_a.shape
    cb = features_b.shape[-1]
    xa = features_a.reshape(b, h * w, ca)
    xb = features_b.reshape(b, h * w, cb)
    gram = jax.lax.dot_general(
        xa, xb,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / float(h * w)
    v = gram.reshape(b, ca * cb)
    if signed_sqrt:
        v = jnp.sign(v) * jnp.sqrt(jnp.abs(v) + eps)
    if l2_normalize:
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v
