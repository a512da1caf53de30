"""Covariance pooling with iterative matrix square root (Fast MPN-COV).

Reference semantics: ``model/methods/MPNCOV.py:105-230`` — three custom
autograd Functions with hand-written backwards:
- ``Covpool``: X Ī X^T with the centering matrix Ī = (I - 1/M 11^T)/M over
  M = H·W positions, giving a [C, C] covariance per image.
- ``Sqrtm``: coupled Newton–Schulz iteration (iterN steps, default 5) with
  pre-normalization by trace and post-compensation by sqrt(trace).
- ``Triuvec``: flatten the upper triangle.

TPU design: the whole chain is expressed with batched matmuls inside
``lax.fori_loop`` (MXU work; the 256×256 bmm chain is exactly what the
systolic array wants) and differentiated by JAX'S AUTODIFF — the reference's
400 lines of manual backward exist because torch couldn't differentiate
through the loop efficiently; JAX can, and reverse-mode through a
fori_loop of matmuls yields the same coupled recursion. f32 accumulation
throughout (the iteration is numerically delicate in bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def covariance_pool(features):
    """[B, H, W, C] → [B, C, C] covariance (X Ī X^T form, f32)."""
    b, h, w, c = features.shape
    m = h * w
    x = features.reshape(b, m, c).astype(jnp.float32)
    mean = x.mean(axis=1, keepdims=True)
    xc = x - mean
    # (1/M) Σ (x-μ)(x-μ)^T  == X Ī X^T with Ī = (I - 1/M 11ᵀ)/M
    cov = jax.lax.dot_general(
        xc, xc, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / float(m)
    return cov


def newton_schulz_sqrt(mats, num_iters: int = 5, coupled_batched: bool = True):
    """Batched matrix square root via coupled Newton–Schulz.

    mats: [B, C, C] SPD matrices (f32). Returns [B, C, C] ≈ mats^(1/2).
    Pre-normalizes by trace so the iteration converges; post-compensates by
    sqrt(trace) (reference ``Sqrtm`` forward, ``MPNCOV.py:137-170``).

    ``coupled_batched`` (default on) computes the two independent products
    of each iteration — Y·T and T·Z — as ONE [2B, C, C] bmm instead of two
    [B, C, C] bmms: at the recipe's bs8 each 256×256 bmm is ~µs of MXU work,
    so halving the kernel count of the dependent chain (and doubling its
    batch fill) matters more than the two tiny concats it adds. Numerically
    identical (batch is an outer dim; per-element accumulation order is
    unchanged — pinned in tests/test_highorder_ops.py).
    """
    mats = mats.astype(jnp.float32)
    b, c, _ = mats.shape
    ident = jnp.eye(c, dtype=jnp.float32)[None]
    tr = jnp.trace(mats, axis1=1, axis2=2)[:, None, None]  # [B,1,1]
    tr = jnp.maximum(tr, 1e-8)
    a = mats / tr

    def bmm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def body(_, carry):
        y, z = carry
        t = 0.5 * (3.0 * ident - bmm(z, y))
        if coupled_batched:
            out = bmm(jnp.concatenate([y, t], axis=0),
                      jnp.concatenate([t, z], axis=0))
            return out[:b], out[b:]
        return bmm(y, t), bmm(t, z)

    y0 = a
    z0 = jnp.broadcast_to(ident, a.shape)
    # first step uses Y0 = A, Z0 = I: T = (3I - A)/2
    y, z = jax.lax.fori_loop(0, num_iters, body, (y0, z0))
    return y * jnp.sqrt(tr)


def triu_vec(mats):
    """[B, C, C] → [B, C(C+1)/2] upper-triangle flatten (row-major)."""
    c = mats.shape[-1]
    iu = jnp.triu_indices(c)
    return mats[:, iu[0], iu[1]]


def mpn_cov_pool(features, num_iters: int = 5):
    """Fused covariance pooling: cov → iSQRT → triu flatten."""
    cov = covariance_pool(features)
    sqrtm = newton_schulz_sqrt(cov, num_iters)
    return triu_vec(sqrtm)
