"""Device-side TrivialAugmentWide: one random op per image, fully batched.

Host parity target: ``transforms_host.trivial_augment_wide`` (PIL, the
reference's default train augmentation policy, ``train.py:171-183``). All 14
ops run as masked dense math over the whole batch; per-image choices are
selection masks, so the program is static:

- geometric ops (shear/translate/rotate + identity) collapse into ONE
  per-image affine grid sample (PIL AFFINE semantics: output→input map,
  zero fill);
- photometric ops are elementwise passes selected per image;
- Equalize uses a 64-knot CDF approximation of PIL's exact 256-bin
  histogram remap (documented delta; the op is drawn 1/14 of the time).

Input/output: float images in [0, 1], NHWC.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.resample import grid_sample_bilinear

# op indices
_IDENTITY, _SHEAR_X, _SHEAR_Y, _TRANS_X, _TRANS_Y, _ROTATE = 0, 1, 2, 3, 4, 5
_BRIGHT, _COLOR, _CONTRAST, _SHARP = 6, 7, 8, 9
_POSTERIZE, _SOLARIZE, _AUTOCONTRAST, _EQUALIZE = 10, 11, 12, 13
NUM_OPS = 14

_GRAY_W = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _affine_grids(op, mag, h, w):
    """Per-image output→input affine sampling grid [B, h, w, 2] (y, x)."""
    b = op.shape[0]
    # PIL AFFINE coefficients (a, b, c, d, e, f): x_src = a x + b y + c
    is_sx = op == _SHEAR_X
    is_sy = op == _SHEAR_Y
    is_tx = op == _TRANS_X
    is_ty = op == _TRANS_Y
    is_rot = op == _ROTATE

    shear = mag * 0.99
    trans = mag * 32.0
    theta = mag * 135.0 * math.pi / 180.0

    # rotation about the center, PIL rotate(angle) = CCW
    cos_t = jnp.where(is_rot, jnp.cos(theta), 1.0)
    sin_t = jnp.where(is_rot, jnp.sin(theta), 0.0)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    a = cos_t
    bb = jnp.where(is_sx, shear, 0.0) + jnp.where(is_rot, sin_t, 0.0)
    d = jnp.where(is_sy, shear, 0.0) - jnp.where(is_rot, sin_t, 0.0)
    e = cos_t
    c = jnp.where(is_tx, trans, 0.0)
    f = jnp.where(is_ty, trans, 0.0)

    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    # rotate around center; shears/translates use PIL's top-left origin
    x_rel = xs - jnp.where(is_rot, cx, 0.0)[:, None, None]
    y_rel = ys - jnp.where(is_rot, cy, 0.0)[:, None, None]
    src_x = (a[:, None, None] * x_rel + bb[:, None, None] * y_rel
             + c[:, None, None] + jnp.where(is_rot, cx, 0.0)[:, None, None])
    src_y = (d[:, None, None] * x_rel + e[:, None, None] * y_rel
             + f[:, None, None] + jnp.where(is_rot, cy, 0.0)[:, None, None])
    return jnp.stack(jnp.broadcast_arrays(src_y, src_x), axis=-1)


def _equalize_cdf(x, knots=64):
    """Approximate per-channel histogram equalization via a CDF lookup."""
    b, h, w, c = x.shape
    levels = jnp.linspace(0.0, 1.0, knots)

    def count_leq(t):
        return (x <= t).mean(axis=(1, 2))  # [B, C]

    cdf = jax.vmap(count_leq)(levels)  # [K, B, C]
    cdf = jnp.moveaxis(cdf, 0, -1)  # [B, C, K]
    # map each pixel through the CDF with linear interpolation
    pos = jnp.clip(x, 0.0, 1.0) * (knots - 1)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, knots - 1)
    frac = pos - i0
    cdf_b = cdf[:, None, None, :, :]  # [B,1,1,C,K]
    g0 = jnp.take_along_axis(
        jnp.broadcast_to(cdf_b, (b, h, w, c, knots)), i0[..., None], axis=-1
    )[..., 0]
    g1 = jnp.take_along_axis(
        jnp.broadcast_to(cdf_b, (b, h, w, c, knots)), i1[..., None], axis=-1
    )[..., 0]
    return g0 * (1 - frac) + g1 * frac


def ta_wide(key, images):
    """images: [B, H, W, 3] float in [0,1] → augmented, same shape/dtype."""
    b, h, w, _ = images.shape
    k_op, k_mag, k_sign = jax.random.split(key, 3)
    op = jax.random.randint(k_op, (b,), 0, NUM_OPS)
    u = jax.random.uniform(k_mag, (b,))
    sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b,)), 1.0, -1.0)
    mag = u * sign  # signed magnitude for the ops that use it

    x = images.astype(jnp.float32)

    # ---- geometric family: one batched grid sample -------------------------
    geo = (op >= _SHEAR_X) & (op <= _ROTATE)
    grids = _affine_grids(op, mag, h, w)
    warped = grid_sample_bilinear(x, grids)
    out = jnp.where(geo[:, None, None, None], warped, x)

    m = jnp.abs(mag)[:, None, None, None]
    s = mag[:, None, None, None]

    def select(idx, val):
        return jnp.where((op == idx)[:, None, None, None], val, out)

    # ---- photometric family ------------------------------------------------
    out = select(_BRIGHT, jnp.clip(out * (1.0 + s * 0.99), 0.0, 1.0))

    gray = (out @ _GRAY_W)[..., None]
    out = select(_COLOR, jnp.clip(gray + (1.0 + s * 0.99) * (out - gray), 0, 1))

    mean_gray = gray.mean(axis=(1, 2, 3), keepdims=True)
    out = select(_CONTRAST,
                 jnp.clip(mean_gray + (1.0 + s * 0.99) * (out - mean_gray), 0, 1))

    # sharpness: PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13, border kept
    kern = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    smooth = jax.lax.conv_general_dilated(
        out, jnp.tile(kern[:, :, None, None], (1, 1, 1, 3)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3)
    out = select(_SHARP, jnp.clip(smooth + (1.0 + s * 0.99) * (out - smooth), 0, 1))

    # posterize: keep `bits` high bits, TA-wide range 8→2
    bits = jnp.round(8.0 - jnp.abs(mag)[:, None, None, None] * 6.0)
    q = jnp.floor(out * 255.0)
    shift = 2.0 ** (8.0 - bits)
    out = select(_POSTERIZE, jnp.floor(q / shift) * shift / 255.0)

    # solarize: invert above threshold, TA-wide range 255→0
    thresh = (1.0 - jnp.abs(mag))[:, None, None, None]
    out = select(_SOLARIZE, jnp.where(out >= thresh, 1.0 - out, out))

    lo = out.min(axis=(1, 2), keepdims=True)
    hi = out.max(axis=(1, 2), keepdims=True)
    auto = (out - lo) / jnp.maximum(hi - lo, 1e-6)
    out = select(_AUTOCONTRAST, auto)

    out = select(_EQUALIZE, _equalize_cdf(out))

    return out.astype(images.dtype)
