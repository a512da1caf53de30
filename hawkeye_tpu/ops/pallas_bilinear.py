"""Pallas TPU kernel: fused bilinear (second-order) pooling.

Forward computes, per image, ``G = Xᵀ X / HW`` over conv features
X ∈ [HW, C] and applies the signed-sqrt epilogue ``sign(g)·sqrt(|g|+eps)``
INSIDE the matmul's output tiles — the raw Gram never round-trips to HBM
(the XLA version materializes it between the dot and the epilogue unless
fusion kicks in). MXU does the [C_tile, HW] × [HW, C_tile] contraction with
f32 accumulation from bf16 inputs.

Backward is expressed with two batched matmuls via ``jax.custom_vjp``
(d/dX of G = (dG + dGᵀ) X / HW composed with the sqrt chain), mirroring the
reference's manual backward for its autograd Function
(``model/methods/BCNN.py:13-27`` is forward-only; torch autograd derives the
same expression).

The public entry ``bilinear_pool_fused`` matches ``ops.bilinear.
bilinear_pool(..., l2_normalize=False)`` — the global L2 normalization needs
a full reduction over the C² vector so it stays a (cheap) second pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _fwd_impl(x, eps, tc):
    b, hw, c = x.shape
    grid = (b, c // tc, c // tc)

    def kernel(xi_ref, xj_ref, out_ref):
        g = jax.lax.dot_general(
            xi_ref[0], xj_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / float(hw)
        out_ref[0] = jnp.sign(g) * jnp.sqrt(jnp.abs(g) + eps)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hw, tc), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, tc), lambda bi, i, j: (bi, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tc, tc), lambda bi, i, j: (bi, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, c), jnp.float32),
        # run interpreted off-TPU so CPU tests exercise the same code path
        interpret=jax.default_backend() != "tpu",
    )(x, x)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gram_signed_sqrt(x, eps=1e-5):
    """[B, HW, C] → [B, C, C] = signed_sqrt(XᵀX / HW), Pallas-fused."""
    b, hw, c = x.shape
    tc = 256 if c % 256 == 0 else c
    return _fwd_impl(x, eps, tc)


def _gram_fwd(x, eps):
    y = gram_signed_sqrt(x, eps)
    return y, (x, y)


def _gram_bwd(eps, residuals, dy):
    x, y = residuals
    b, hw, c = x.shape
    # y = sign(g) sqrt(|g|+eps)  =>  dg = dy / (2 sqrt(|g|+eps)) = dy / (2|y'|)
    # where sqrt(|g|+eps) = |y| (sign folded); avoid div-by-0 via eps floor
    dg = dy / (2.0 * jnp.maximum(jnp.abs(y), jnp.sqrt(eps)))
    # g = XᵀX/HW  =>  dX = X (dg + dgᵀ) / HW
    sym = dg + jnp.swapaxes(dg, 1, 2)
    dx = jax.lax.dot_general(
        x.astype(jnp.float32), sym,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / float(hw)
    return (dx.astype(x.dtype),)


gram_signed_sqrt.defvjp(_gram_fwd, _gram_bwd)


def bilinear_pool_fused(features, *, eps=1e-5, l2_normalize=True):
    """Drop-in fused version of ``ops.bilinear.bilinear_pool``.

    features: [B, H, W, C] → [B, C*C] descriptor.
    """
    b, h, w, c = features.shape
    x = features.reshape(b, h * w, c)
    v = gram_signed_sqrt(x, eps).reshape(b, c * c)
    if l2_normalize:
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return v
