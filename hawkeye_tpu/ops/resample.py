"""Batched on-device crop + resize kernels.

The reference does all region resampling on host or with per-image torch calls:
NTS-Net part crops (``model/methods/NTS_Net/NTSNet.py:43-50``), APCNN ROI zoom
(``model/methods/APCNN.py:478-531``), MGE bbox crop (``MGE.py:48-72``), S3N
``F.grid_sample`` (``S3N.py:283-288``), and torchvision RandomResizedCrop in
the input pipeline. Here they are single fused device ops:

- ``crop_resize_bilinear``: separable bilinear interpolation written as TWO
  BATCHED MATMULS ``(Wy @ img) @ Wx^T`` so the MXU does the resampling —
  a per-pixel 4-tap gather would be VPU/HBM-bound instead. One program
  handles any per-image axis-aligned box (so it *is* RandomResizedCrop,
  center-crop, ROI zoom, and box crop, all batched, all static-shaped).
- ``grid_sample_bilinear``: general (non-separable) grid sampling via
  vectorized 4-tap gathers, for saliency-warped grids (S3N).

All coordinate conventions follow ``align_corners=False`` (torchvision /
``F.interpolate`` default), which the reference relies on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_weights(starts, sizes, in_size: int, out_size: int, dtype,
                      align_corners=False):
    """Per-image 1-D bilinear interpolation matrices.

    Args:
      starts: [B] crop start (float, pixels, inclusive-left edge).
      sizes:  [B] crop extent in pixels (float).
      in_size: source length H (static).
      out_size: destination length S (static).
      align_corners: False = torchvision/F.interpolate default half-pixel
        centers; True = endpoint-aligned (``F.interpolate(...,
        align_corners=True)``, the NTS-Net part-crop convention,
        ``NTSNet.py:47-48``).

    Returns [B, out_size, in_size] such that ``W @ v`` bilinearly resamples
    ``v`` from the window [start, start+size) to out_size points with edge
    clamping.
    """
    starts = starts.astype(jnp.float32)[:, None]
    sizes = sizes.astype(jnp.float32)[:, None]
    # source coordinate of each output sample center
    j = jnp.arange(out_size, dtype=jnp.float32)[None, :]
    if align_corners:
        scale = (sizes - 1.0) / float(max(out_size - 1, 1))
        src = starts + j * scale  # [B, S]
    else:
        scale = sizes / float(out_size)
        src = starts + (j + 0.5) * scale - 0.5  # [B, S]
    # clamp samples to the crop WINDOW (torch interpolates the cropped
    # tensor, so border samples clamp to the window edge, never to pixels
    # outside the crop), intersected with the image bounds
    lo = jnp.clip(starts, 0.0, float(in_size - 1))
    hi = jnp.clip(starts + sizes - 1.0, 0.0, float(in_size - 1))
    src = jnp.clip(src, lo, hi)
    i0 = jnp.floor(src)
    frac = src - i0  # [B, S]
    # hat weights against every source index: w[b, s, i]
    i = jnp.arange(in_size, dtype=jnp.float32)[None, None, :]
    d0 = 1.0 - jnp.abs(i - i0[..., None])  # weight for floor tap
    w0 = jnp.clip(d0, 0.0, 1.0) * (1.0 - frac[..., None])
    d1 = 1.0 - jnp.abs(i - (i0[..., None] + 1.0))
    w1 = jnp.clip(d1, 0.0, 1.0) * frac[..., None]
    w = w0 + w1
    # renormalize rows (edge clamp can leave mass < 1 when i0+1 == in_size)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-6)
    return w.astype(dtype)


def crop_resize_bilinear(images, boxes, out_h: int, out_w: int, dtype=None,
                         align_corners=False, flip_x_mask=None):
    """Crop per-image boxes and resize to (out_h, out_w), fully batched.

    Args:
      images: [B, H, W, C] (any float dtype or uint8).
      boxes: [B, 4] float (y0, x0, h, w) in PIXELS of the source image.
             (y0, x0) is the top-left corner; h/w the crop extent.
      out_h, out_w: static output size.
      flip_x_mask: optional [B] bool — fold a per-image horizontal flip into
             the resample by reversing that image's x-weight rows. Bit-exact
             vs flipping the output afterwards (same per-element arithmetic)
             but free: a ``rev`` + layout copies on the full [B,S,S,3]
             output profiled at ~2.6 ms/step of the ResNet-50 448² bs128
             train step; the [B,ow,W] weight reversal fuses away.

    Returns [B, out_h, out_w, C] float.
    """
    b, h, w, c = images.shape
    if dtype is None:
        dtype = images.dtype if jnp.issubdtype(images.dtype, jnp.floating) else jnp.float32
    imgs = images.astype(dtype)
    wy = _bilinear_weights(boxes[:, 0], boxes[:, 2], h, out_h, dtype,
                           align_corners=align_corners)  # [B, oh, H]
    wx = _bilinear_weights(boxes[:, 1], boxes[:, 3], w, out_w, dtype,
                           align_corners=align_corners)  # [B, ow, W]
    if flip_x_mask is not None:
        wx = jnp.where(flip_x_mask[:, None, None], wx[:, ::-1, :], wx)
    # (Wy @ img): [B, oh, H] x [B, H, W*C] -> [B, oh, W*C]
    tmp = jax.lax.dot_general(
        wy, imgs.reshape(b, h, w * c),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    # (tmp @ Wx^T) over the W axis: [B, ow, W] x [B, oh, W, C]
    tmp = tmp.reshape(b, out_h, w, c)
    out = jnp.einsum("bow,bhwc->bhoc", wx, tmp,
                     preferred_element_type=jnp.float32).astype(dtype)
    return out


def crop_resize_multibox(images, boxes, out_h: int, out_w: int, dtype=None,
                         align_corners=False):
    """Crop M boxes per image without replicating the image M times.

    images: [B, H, W, C]; boxes: [B, M, 4] (y0, x0, h, w) in pixels.
    Returns [B, M, out_h, out_w, C]. The separable weight matrices carry the
    M axis; the source image is shared inside the einsum (one MXU contraction
    instead of an M-fold gather of padded copies — this is the NTS-Net /
    APCNN part-crop path).
    """
    b, h, w, c = images.shape
    m = boxes.shape[1]
    if dtype is None:
        dtype = images.dtype if jnp.issubdtype(images.dtype, jnp.floating) else jnp.float32
    imgs = images.astype(dtype)
    flat = boxes.reshape(b * m, 4)
    wy = _bilinear_weights(flat[:, 0], flat[:, 2], h, out_h, dtype,
                           align_corners=align_corners).reshape(
        b, m, out_h, h)
    wx = _bilinear_weights(flat[:, 1], flat[:, 3], w, out_w, dtype,
                           align_corners=align_corners).reshape(
        b, m, out_w, w)
    tmp = jnp.einsum("bmoh,bhwc->bmowc", wy, imgs,
                     preferred_element_type=jnp.float32).astype(dtype)
    out = jnp.einsum("bmpw,bmowc->bmopc", wx, tmp,
                     preferred_element_type=jnp.float32).astype(dtype)
    return out


def resize_bilinear(images, out_h: int, out_w: int, dtype=None,
                    align_corners=False):
    """Plain full-image resize (shared weight matrices across the batch)."""
    b, h, w, _ = images.shape
    boxes = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, float(h), float(w)]], jnp.float32), (b, 4)
    )
    return crop_resize_bilinear(images, boxes, out_h, out_w, dtype=dtype,
                                align_corners=align_corners)


def grid_sample_bilinear(images, grid):
    """General bilinear grid sample (4-tap gather), zero padding outside.

    Args:
      images: [B, H, W, C] float.
      grid: [B, out_h, out_w, 2] sample coords in PIXELS, last dim (y, x).

    Matches ``F.grid_sample(..., mode='bilinear', padding_mode='zeros',
    align_corners=False)`` semantics after the caller converts normalized
    coords to pixels (reference S3N usage, ``model/methods/S3N.py:283-288``).
    """
    b, h, w, c = images.shape
    out_sp = grid.shape[1:-1]
    y = grid[..., 0]
    x = grid[..., 1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = (y - y0)[..., None].astype(images.dtype)
    wx1 = (x - x0)[..., None].astype(images.dtype)

    # TPU gathers are latency-bound on the INDEX COUNT, not bytes: the naive
    # four per-pixel taps compile to a ~6 GB/s gather fusion that dominated
    # the S3N step (59% of 180 ms). Packing the 2×2 neighborhood into the
    # channel axis of a zero-padded copy turns them into ONE flat-index
    # take_along_axis per output pixel (4× fewer indices, wider slices) —
    # measured 7.1× faster at S3N shapes (113 → 16 ms per 8×448² warp pair),
    # bit-exact vs the 4-tap formulation. Zero-padding reproduces the
    # per-tap 'zeros' boundary semantics: a tap at row -1 or h reads the
    # pad ring; samples further out are masked entirely below.
    # Tensors are kept with the LARGE axis minor throughout: a [B, N, 4C]
    # gather operand/output has its 12-wide minor dim padded to full 128
    # lanes by XLA's layout assignment (~10× wasted bytes on every touch,
    # measured as 15–25 GB/s effective on the S3N profile), while the
    # [B, 4C, N] plane form tiles cleanly (N in lanes, 4C in sublanes).
    xp = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [xp[:, :-1, :-1], xp[:, :-1, 1:], xp[:, 1:, :-1], xp[:, 1:, 1:]],
        axis=-1).reshape(b, (h + 1) * (w + 1), 4 * c)
    packed = packed.transpose(0, 2, 1)  # [B, 4C, N], N minor
    iy = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    ix = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    flat = (iy * (w + 1) + ix).reshape(b, 1, -1)  # [B, 1, O]
    # indices are clipped above — promise_in_bounds skips the gather's
    # fill-value select pass (~10 ms/step in the S3N profile)
    v = jnp.take_along_axis(packed, flat, axis=2,
                            mode="promise_in_bounds")  # [B, 4C, O]
    wy1 = wy1.reshape(b, 1, -1).astype(images.dtype)  # [B, 1, O]
    wx1 = wx1.reshape(b, 1, -1).astype(images.dtype)
    ok = ((y0 >= -1) & (y0 <= h - 1) & (x0 >= -1)
          & (x0 <= w - 1)).reshape(b, 1, -1).astype(images.dtype)
    v00, v01, v10, v11 = jnp.split(v, 4, axis=1)      # [B, C, O] each
    top = v00 * (1 - wx1) + v01 * wx1
    bot = v10 * (1 - wx1) + v11 * wx1
    out = (top * (1 - wy1) + bot * wy1) * ok          # [B, C, O]
    return out.transpose(0, 2, 1).reshape(b, *out_sp, c)


def resize_nearest(images, out_h: int, out_w: int):
    """Nearest-neighbor resize matching ``F.interpolate(mode='nearest')``:
    src index = floor(dst * in/out). Used by CrossX fusion (reference
    ``model/methods/CrossX.py:215-226`` upsamples with the torch default)."""
    b, h, w, c = images.shape
    iy = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return images[:, iy][:, :, ix]
