"""Batch-level Mixup / CutMix.

Reference: ``dataset/transforms.py:76-240`` (RandomMixup / RandomCutmix) wired
through ``MixupCutmixCollateFn`` (``dataset/collate_fn.py:8-17``) — defined in
the reference but not used by any Example; kept as available API surface.

TPU design: a single jitted batch op (one Beta draw + a roll of the batch,
matching torchvision's v0.13 RandomMixup/RandomCutmix semantics) instead of a
host-side collate. Produces soft labels [B, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _beta(key, alpha):
    a = jax.random.gamma(key, alpha)
    key2 = jax.random.fold_in(key, 1)
    b = jax.random.gamma(key2, alpha)
    return a / (a + b)


def mixup_cutmix(key, images, labels, num_classes, mixup_alpha=0.2,
                 cutmix_alpha=1.0, p=0.5):
    """Apply mixup OR cutmix (50/50 among the two) with probability ``p``.

    Returns (images, soft_labels [B, C]).
    """
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    k_apply, k_choice, k_lam, k_box = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, p)
    use_cutmix = jax.random.bernoulli(k_choice, 0.5)

    rolled_img = jnp.roll(images, 1, axis=0)
    rolled_lab = jnp.roll(one_hot, 1, axis=0)

    def do_mixup(_):
        lam = _beta(k_lam, mixup_alpha)
        img = images * lam + rolled_img * (1 - lam)
        lab = one_hot * lam + rolled_lab * (1 - lam)
        return img, lab

    def do_cutmix(_):
        b, h, w, _c = images.shape
        lam = _beta(k_lam, cutmix_alpha)
        rh = jnp.sqrt(1.0 - lam) * h
        rw = jnp.sqrt(1.0 - lam) * w
        ky, kx = jax.random.split(k_box)
        cy = jax.random.uniform(ky) * h
        cx = jax.random.uniform(kx) * w
        y0, y1 = jnp.clip(cy - rh / 2, 0, h), jnp.clip(cy + rh / 2, 0, h)
        x0, x1 = jnp.clip(cx - rw / 2, 0, w), jnp.clip(cx + rw / 2, 0, w)
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        inside = ((ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1))
        img = jnp.where(inside[None, :, :, None], rolled_img, images)
        lam_adj = 1.0 - (y1 - y0) * (x1 - x0) / (h * w)
        lab = one_hot * lam_adj + rolled_lab * (1 - lam_adj)
        return img, lab

    def do_apply(_):
        return jax.lax.cond(use_cutmix, do_cutmix, do_mixup, None)

    def no_apply(_):
        return images, one_hot

    return jax.lax.cond(apply, do_apply, no_apply, None)
