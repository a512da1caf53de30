"""Pallas TPU kernels for the argmax-index relu+maxpool.

Why a kernel: XLA materializes every strided-slice / broadcast / compare of
a windowed pooling formulation as a full-size intermediate (measured:
+24 ms/step over select-and-scatter on the BCNN 448²/bs112 recipe), and
autodiff of relu+pool keeps the full-resolution pre-pool activation alive
as a backward residual. Here the window max + argmax (forward) and the
index-routed scatter (backward) each run in VMEM in one pass with exactly
the algorithmic HBM traffic, and the residual is the pooled map + a small
index plane — which frees XLA from the measured 17.8 ms/step forced
rematerialization of the second 448² conv at the BCNN recipe shape.
Net effect on the BCNN 448²/bs112 train step: 331 → 362 img/s (+9.3%);
the same design through lax instead of Pallas REGRESSES to 315.

Layout strategy: XLA on TPU keeps big NHWC activations with batch or
channels minor — e.g. ``[112,448,448,64]{0,3,2,1}`` (memory order H, W, C,
B) for 64-channel maps and ``{3,0,2,1}`` (H, W, B, C) for ≥128 channels.
The wrappers transpose to exactly that memory order, so the transpose is a
layout-preserving bitcast, the Pallas row-major operand constraint matches
the producer's native layout (no relayout copies), and BOTH pooling axes
(H, W) land on major dimensions — the kernels use plain indexing and
major-dim reshapes only, which Mosaic compiles without any lane shuffles.

Index codes are stored in the activation dtype (0..3, exact in bf16):
mixing bf16 (16,128) and uint8 (32,128) register tilings needs mask
relayouts Mosaic rejects.

Used by ``ops.pool.relu_maxpool2x2`` on TPU; the lax fallback there keeps
CPU behavior identical (parity-tested both ways, including tie-breaking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_BYTES = 3 << 19  # input-block budget; the f32 compute temps fit VMEM


def _interpret():
    return jax.default_backend() != "tpu"


def _w_tile(w, fbytes):
    for wt in range(min(w, max(2, _TILE_BYTES // (2 * fbytes))), 1, -1):
        if w % wt == 0 and wt % 2 == 0:
            return wt
    return None


def supports(shape, dtype):
    b, h, w, c = shape
    if h % 2 or w % 2 or dtype not in (jnp.bfloat16, jnp.float32):
        return False
    # the post-transpose minor dim sits on the 128-lane axis; tiny values
    # (e.g. the batch-2 init trace) pad 64x and blow the VMEM stack
    if (b if c < 128 else c) < 64:
        return False
    return _w_tile(w, b * c * jnp.dtype(dtype).itemsize) is not None


def _fwd_kernel(x_ref, p_ref, i_ref):
    _, wt, d2, d3 = x_ref.shape
    # compute in f32: this target has no native bf16 vector compare
    x5 = x_ref[...].reshape(2, wt // 2, 2, d2, d3).astype(jnp.float32)
    c00, c01 = x5[0, :, 0], x5[0, :, 1]
    c10, c11 = x5[1, :, 0], x5[1, :, 1]
    m0 = jnp.maximum(c00, c01)
    m1 = jnp.maximum(c10, c11)
    m = jnp.maximum(m0, m1)

    def code(c):
        return jnp.full((), c, jnp.float32)

    # first-max-wins in row-major window order (select-and-scatter parity):
    # strict > prefers the earlier candidate at every merge
    i0 = jnp.where(c01 > c00, code(1), code(0))
    i1 = jnp.where(c11 > c10, code(3), code(2))
    p_ref[0] = jnp.maximum(m, jnp.zeros((), m.dtype)).astype(p_ref.dtype)
    i_ref[0] = jnp.where(m1 > m0, i1, i0).astype(i_ref.dtype)


def _bwd_kernel(g_ref, i_ref, p_ref, dx_ref):
    _, w2t, d2, d3 = g_ref.shape
    # compute in f32: this target has no native bf16 vector compare
    g = g_ref[0].astype(jnp.float32)
    p = p_ref[0].astype(jnp.float32)
    i = i_ref[0].astype(jnp.float32)
    g = jnp.where(p > 0, g, jnp.zeros((), g.dtype))
    zero = jnp.zeros((), g.dtype)

    def cand(c):
        return jnp.where(i == jnp.full((), c, jnp.float32), g, zero)

    # row parity q gets candidates (2q | 2q+1), interleaved along W
    top = jnp.stack([cand(0), cand(1)], axis=1).reshape(2 * w2t, d2, d3)
    bot = jnp.stack([cand(2), cand(3)], axis=1).reshape(2 * w2t, d2, d3)
    dx_ref[...] = jnp.stack([top, bot], axis=0).astype(dx_ref.dtype)


def _to_native(x):
    """[B,H,W,C] -> XLA's preferred memory order (a free bitcast there)."""
    if x.shape[-1] < 128:
        return x.transpose(1, 2, 3, 0), (3, 0, 1, 2)  # [H,W,C,B]
    return x.transpose(1, 2, 0, 3), (2, 0, 1, 3)      # [H,W,B,C]


def pool_fwd(x):
    """[B, H, W, C] -> (p [B, H/2, W/2, C], idx codes, same dtype)."""
    bsz, h, w, c = x.shape
    xt, inv = _to_native(x)
    _, _, d2, d3 = xt.shape
    wt = _w_tile(w, d2 * d3 * jnp.dtype(x.dtype).itemsize)
    out_spec = pl.BlockSpec((1, wt // 2, d2, d3), lambda j, k: (j, k, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((h // 2, w // 2, d2, d3), x.dtype)
    p, idx = pl.pallas_call(
        _fwd_kernel,
        grid=(h // 2, w // wt),
        in_specs=[pl.BlockSpec((2, wt, d2, d3), lambda j, k: (j, k, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=_interpret(),
    )(xt)
    return p.transpose(inv), idx.transpose(inv)


def pool_bwd(dp, idx, p):
    """Route dp to recorded argmax positions, gated by p > 0."""
    bsz, h2, w2, c = dp.shape
    dpt, inv = _to_native(dp)
    it, _ = _to_native(idx)
    pt, _ = _to_native(p)
    _, _, d2, d3 = dpt.shape
    wt = _w_tile(2 * w2, d2 * d3 * jnp.dtype(dp.dtype).itemsize)
    in_spec = pl.BlockSpec((1, wt // 2, d2, d3), lambda j, k: (j, k, 0, 0),
                           memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=(h2, 2 * w2 // wt),
        in_specs=[in_spec, in_spec, in_spec],
        out_specs=pl.BlockSpec((2, wt, d2, d3), lambda j, k: (j, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * h2, 2 * w2, d2, d3), dp.dtype),
        interpret=_interpret(),
    )(dpt, it, pt)
    return dx.transpose(inv)
