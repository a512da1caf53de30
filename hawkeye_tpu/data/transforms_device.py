"""Device-resident batched augmentation (the performance path).

The reference runs its whole augmentation stack per-image on host CPU worker
processes (``dataset/transforms.py``, ``train.py:200-209``). Here the host
only decodes + fixes the shape (uint8 [B, R, R, 3]); everything else —
random-resized-crop, horizontal flip, normalize, random erasing — is ONE
jitted program over the whole batch, with the crop+resize expressed as
batched matmuls on the MXU (``ops/resample.crop_resize_bilinear``).

Functional-randomness contract: every op takes an explicit PRNG key; the
trainer steps one key per batch.

Known (documented) deltas vs torchvision, invisible to training quality but
worth stating: crop boxes are clamped instead of rejection-sampled (10-try
loop), and downscale is pure bilinear without PIL's implicit antialias.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.resample import crop_resize_bilinear
# module-level import, NOT lazily inside the jitted augment: importing a
# module under an active trace creates its module-level jnp constants as
# values owned by that trace — later traces then see a leaked tracer
# (order-dependent UnexpectedTracerError, found via test_device_pipeline)
from .ta_wide_device import ta_wide

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def sample_rrc_boxes(key, batch, h, w, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """Per-image RandomResizedCrop boxes [B,4] = (y0, x0, ch, cw) in pixels."""
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    area = float(h * w)
    target = area * jax.random.uniform(k_area, (batch,), minval=scale[0],
                                       maxval=scale[1])
    log_r = jax.random.uniform(k_ratio, (batch,), minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.sqrt(target * aspect)
    ch = jnp.sqrt(target / aspect)
    cw = jnp.clip(cw, 8.0, float(w))
    ch = jnp.clip(ch, 8.0, float(h))
    y0 = jax.random.uniform(k_y, (batch,)) * (h - ch)
    x0 = jax.random.uniform(k_x, (batch,)) * (w - cw)
    return jnp.stack([y0, x0, ch, cw], axis=1)


def hflip(key, images, prob=0.5):
    mask = jax.random.bernoulli(key, prob, (images.shape[0],))
    return jnp.where(mask[:, None, None, None], images[:, :, ::-1, :], images)


def normalize(images, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    return (images - mean) / std


def random_erase(key, images, prob=0.1, scale=(0.02, 0.33), ratio=(0.3, 3.3),
                 value=0.0):
    """Batched RandomErasing: one candidate rectangle per image, applied with
    probability ``prob`` (static shapes; no retry loop needed since the
    candidate is always in-bounds by construction)."""
    b, h, w, _ = images.shape
    k_on, k_area, k_ratio, k_y, k_x = jax.random.split(key, 5)
    on = jax.random.bernoulli(k_on, prob, (b,))
    area = float(h * w)
    target = area * jax.random.uniform(k_area, (b,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k_ratio, (b,), minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    eh = jnp.clip(jnp.sqrt(target * jnp.exp(log_r)), 1.0, float(h - 1))
    ew = jnp.clip(jnp.sqrt(target / jnp.exp(log_r)), 1.0, float(w - 1))
    y0 = jax.random.uniform(k_y, (b,)) * (h - eh)
    x0 = jax.random.uniform(k_x, (b,)) * (w - ew)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inside = (
        (ys >= y0[:, None, None]) & (ys < (y0 + eh)[:, None, None])
        & (xs >= x0[:, None, None]) & (xs < (x0 + ew)[:, None, None])
    )
    erase = inside & on[:, None, None]
    return jnp.where(erase[..., None], jnp.asarray(value, images.dtype), images)


def make_train_augment(image_size: int, hflip_prob=0.5, erase_prob=0.1,
                       scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                       mean=IMAGENET_MEAN, std=IMAGENET_STD,
                       auto_augment=None,
                       out_dtype=jnp.float32, compute_dtype=jnp.bfloat16):
    """Build a jittable ``augment(key, uint8 [B,R,R,3]) -> [B,S,S,3]``.

    Order matches the host preset (``transforms_host.TrainPreset``):
    RandomResizedCrop → HFlip → auto-augment policy → normalize → erase.
    The crop-resize matmuls run in ``compute_dtype`` (bf16 by default —
    sub-pixel resampling error ≪ the augmentation noise itself, and the MXU
    runs 8× faster than f32); normalization returns ``out_dtype``.
    ``auto_augment='ta_wide'`` enables the batched TrivialAugmentWide
    (``data/ta_wide_device.py``).
    """

    @partial(jax.jit, static_argnums=())
    def augment(key, batch_u8):
        b, h, w, _ = batch_u8.shape
        k_box, k_flip, k_ta, k_erase = jax.random.split(key, 4)
        imgs = batch_u8.astype(compute_dtype) / 255.0
        boxes = sample_rrc_boxes(k_box, b, h, w, scale, ratio)
        # hflip folds into the crop-resample x-weights (bit-exact vs
        # flipping afterwards; saves the full-image rev + layout copies —
        # see crop_resize_bilinear)
        flip_mask = jax.random.bernoulli(k_flip, hflip_prob, (b,)) \
            if hflip_prob > 0 else None
        out = crop_resize_bilinear(imgs, boxes, image_size, image_size,
                                   dtype=compute_dtype,
                                   flip_x_mask=flip_mask)
        if auto_augment == "ta_wide":
            out = ta_wide(k_ta, out.astype(jnp.float32))
        out = normalize(out.astype(jnp.float32), mean, std)
        if erase_prob > 0:
            out = random_erase(k_erase, out, erase_prob)
        return out.astype(out_dtype)

    return augment


def make_eval_transform(image_size: int, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                        out_dtype=jnp.float32):
    """Build jittable eval prep: center crop-resize + normalize.

    The host stage already produced a square ``resize_size`` image; this
    center-crops the torchvision ratio (image_size out of the square) and
    resizes, matching Resize+CenterCrop statistics.
    """

    @jax.jit
    def prep(batch_u8):
        b, h, w, _ = batch_u8.shape
        imgs = batch_u8.astype(jnp.float32) / 255.0
        if (h, w) != (image_size, image_size):
            y0 = (h - image_size) / 2.0
            x0 = (w - image_size) / 2.0
            boxes = jnp.broadcast_to(
                jnp.array([[y0, x0, float(image_size), float(image_size)]],
                          jnp.float32), (b, 4))
            imgs = crop_resize_bilinear(imgs, boxes, image_size, image_size)
        return normalize(imgs, mean, std).astype(out_dtype)

    return prep
