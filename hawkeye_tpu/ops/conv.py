"""Stride-1 SAME 3x3 conv with a forward-form data gradient.

XLA's dgrad kernel for 64-channel 448² convs runs at ~69 TF/s on the v5e
while the equivalent FORWARD conv of the same shape runs at ~123 TF/s
(RESULTS.md, BCNN roofline: the 64-wide channel dims half-fill the MXU and
the dgrad code path tiles worse than the forward one). For stride 1 / SAME /
odd kernels the data gradient IS a forward conv mathematically:

    dx = conv_same(dy, rot180(W) with in/out channels swapped)

so this op rewrites the VJP's dgrad as that forward conv and leaves wgrad
to XLA (measured 83 TF/s — the [HW-contraction → 9·C²] shape has no
forward-form rewrite). Used by the VGG trunk for its 64→64 block-1 conv
(reference ``model/backbone/vgg.py:36-44``); deeper convs already run at
180+ TF/s, where the rewrite is a wash.

Status (round 4 A/B, v5e, BCNN 448² bs128 with the argmax-index pool
kernels ON): 379.7 img/s (off) vs 380.0 img/s (on) — a WASH at HEAD: the
pool kernels freed the memory pressure that made dgrad the bottleneck.
Default OFF (``model.fast_dgrad``), kept parity-tested
(``tests/test_conv_op.py``) for shapes where dgrad returns to the critical
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=_DN)


@jax.custom_vjp
def conv3x3_same_fast_dgrad(x, w):
    """``lax.conv(x, w, SAME, stride 1)`` whose VJP computes dx as a forward
    conv with the spatially-flipped, channel-transposed kernel (exact: SAME
    zero padding of dy reproduces the missing-border terms)."""
    return _conv(x, w)


def _fwd(x, w):
    return _conv(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _conv(dy, wt)
    # wgrad stays on XLA's path (treat x as constant, differentiate w only)
    _, wgrad = jax.vjp(lambda ww: _conv(x, ww), w)
    (dw,) = wgrad(dy)
    return dx, dw


conv3x3_same_fast_dgrad.defvjp(_fwd, _bwd)
