"""DCL destruction (jigsaw swap) data machinery.

Reference pipeline (``dataset/dataset_DCL.py`` + ``dataset/transforms.py:
243-319``): per image, apply common augmentation, build a 7×7
neighborhood-constrained jigsaw permutation of the image, compute the
"swap law" ground truth (normalized original index per patch position —
the reference recovers it from per-patch pixel statistics; we KNOW the
permutation so the law is exact), and emit an interleaved 2× batch
[unswapped; swapped] with class labels, swap labels, and laws
(collate semantics of ``dataset_DCL.py:118-143``).

The patch shuffle itself is a pure permutation gather on equal-size cells
(448/7 = 64 px). Two implementations share the permutation math:

- host collate classes (numpy, reference-faithful path), below;
- a device-resident variant (SURVEY §2.6 item 7): ``make_dcl_device_augment``
  runs the whole DCL train pipeline — rotate(±15°) + random-crop(448) + hflip
  as ONE batched grid-sample, then the jigsaw permutation gather and the 2×
  [unswapped; swapped] batch assembly — inside the jitted train step, so
  DCL's double-size batches get the device-pipeline speedup. Enabled by
  ``dataset.pipeline: device`` in ``configs/DCL.yaml`` recipes. One
  documented delta: the host decode stage resize-shorter+center-crops to the
  512² square, where the reference ``Resize((512,512))`` squashes the aspect
  ratio (``dataset/transforms.py:243-319``).
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image

from .transforms_host import IMAGENET_MEAN, IMAGENET_STD


def neighborhood_permutation(rng, grid=7, ran=2):
    """Local jigsaw permutation of a grid×grid board: each cell's sort key is
    its index + U(-ran, ran), applied first along rows then columns
    (RandomSwap semantics: patches move at most ~ran cells)."""
    base = np.arange(grid * grid).reshape(grid, grid)
    # shuffle within rows
    keys = np.arange(grid)[None, :] + rng.uniform(-ran, ran, size=(grid, grid))
    cols = np.argsort(keys, axis=1)
    base = np.take_along_axis(base, cols, axis=1)
    # shuffle within columns
    keys = np.arange(grid)[:, None] + rng.uniform(-ran, ran, size=(grid, grid))
    rows = np.argsort(keys, axis=0)
    base = np.take_along_axis(base, rows, axis=0)
    return base.reshape(-1)  # perm[i] = original cell now at position i


def apply_jigsaw(img, perm, grid=7):
    """img: [S, S, C] with S divisible by grid; perm: [grid*grid]."""
    s = img.shape[0]
    assert s % grid == 0, f"image size {s} not divisible by grid {grid}"
    cell = s // grid
    c = img.shape[-1]
    patches = img.reshape(grid, cell, grid, cell, c).transpose(0, 2, 1, 3, 4)
    patches = patches.reshape(grid * grid, cell, cell, c)
    out = patches[perm].reshape(grid, grid, cell, cell, c)
    return out.transpose(0, 2, 1, 3, 4).reshape(s, s, c)


def swap_law(perm, grid=7):
    """law[i] = (original index of patch at position i − mid) / n."""
    n = grid * grid
    return (perm.astype(np.float32) - n // 2) / n


def identity_law(grid=7):
    n = grid * grid
    return (np.arange(n, dtype=np.float32) - n // 2) / n


def _normalize(u8):
    return ((u8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD


def _weights(items):
    """Per-row sample weights: PaddingAwareDataset marks multi-host padding
    rows weight 0; collates must carry the key through or prepare_batch will
    re-weight every row 1 and padded rows would count in losses/metrics."""
    return np.asarray([float(it.get("weight", 1.0)) for it in items],
                      np.float32)


class DCLTrainCollate:
    """Items carry uint8 'img' [S,S,3] (post common-aug). Emits the 2× batch:
    [unswapped; swapped] with labels / swap labels / laws."""

    def __init__(self, grid=7, ran=2, cls_2=True, num_classes=None, seed=0):
        self.grid = grid
        self.ran = ran
        self.cls_2 = cls_2
        self.num_classes = num_classes
        self.rng = np.random.RandomState(seed)

    def __call__(self, items):
        imgs, labels = [], []
        swap_imgs, swap_labels, laws, swap_laws = [], [], [], []
        for it in items:
            img = it["img"]
            label = int(it["label"])
            perm = neighborhood_permutation(self.rng, self.grid, self.ran)
            imgs.append(_normalize(img))
            swap_imgs.append(_normalize(apply_jigsaw(img, perm, self.grid)))
            labels.append(label)
            laws.append(identity_law(self.grid))
            swap_laws.append(swap_law(perm, self.grid))
            if self.cls_2:
                swap_labels.append((1, 0))  # (unswapped, swapped)
            else:
                swap_labels.append((label, label + self.num_classes))
        n = len(items)
        img_batch = np.stack(imgs + swap_imgs).astype(np.float32)
        label_batch = np.asarray(labels + labels, np.int64)
        swap_label_batch = np.asarray(
            [s[0] for s in swap_labels] + [s[1] for s in swap_labels], np.int64)
        law_batch = np.stack(laws + swap_laws).astype(np.float32)
        w = _weights(items)
        return {
            "img": img_batch,
            "label": label_batch,
            "label_swap": swap_label_batch,
            "swap_law": law_batch,
            "weight": np.concatenate([w, w]),  # [unswapped; swapped]
        }


class DCLValCollate:
    """Unswapped images only; swap label = 'unswapped' class, identity law."""

    def __init__(self, grid=7, cls_2=True):
        self.grid = grid
        self.cls_2 = cls_2

    def __call__(self, items):
        imgs = np.stack([_normalize(it["img"]) for it in items]).astype(np.float32)
        labels = np.asarray([int(it["label"]) for it in items], np.int64)
        law = np.stack([identity_law(self.grid)] * len(items)).astype(np.float32)
        swap_label = (np.ones_like(labels) if self.cls_2 else labels)
        return {"img": imgs, "label": labels, "label_swap": swap_label,
                "swap_law": law, "weight": _weights(items)}


class DCLBackboneCollate:
    """Unswapped images + class labels only (reference collate_fn4backbone,
    ``dataset_DCL.py:167-180``) — for backbone-only pretraining on the DCL
    augmentation."""

    def __call__(self, items):
        imgs = np.stack([_normalize(it["img"]) for it in items]).astype(np.float32)
        labels = np.asarray([int(it["label"]) for it in items], np.int64)
        return {"img": imgs, "label": labels, "weight": _weights(items)}


class DCLTestCollate:
    """Raw eval collate (reference collate_fn4test, ``dataset_DCL.py:183-193``)."""

    def __call__(self, items):
        imgs = np.stack([_normalize(it["img"]) for it in items]).astype(np.float32)
        labels = np.asarray([int(it["label"]) for it in items], np.int64)
        return {"img": imgs, "label": labels, "weight": _weights(items)}


class DCLCommonAug:
    """Reference common_aug (``Examples/DCL.py:28-33``): Resize(R,R) →
    RandomRotation(±15°) → RandomCrop(S) → HFlip. Returns uint8 [S,S,3]."""

    def __init__(self, resize_size=512, crop_size=448, rotate=15, train=True):
        self.resize_size = resize_size
        self.crop_size = crop_size
        self.rotate = rotate
        self.train = train

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = img.resize((self.resize_size, self.resize_size), Image.BILINEAR)
        if self.train:
            if self.rotate:
                img = img.rotate(random.uniform(-self.rotate, self.rotate),
                                 resample=Image.BILINEAR)
            max_off = self.resize_size - self.crop_size
            left = random.randint(0, max_off)
            top = random.randint(0, max_off)
            img = img.crop((left, top, left + self.crop_size, top + self.crop_size))
            if random.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        else:
            off = (self.resize_size - self.crop_size) // 2
            img = img.crop((off, off, off + self.crop_size, off + self.crop_size))
        return np.asarray(img, np.uint8)


def subsample_per_class(labels, fraction=0.1, seed=0):
    """Indices of a ~fraction-per-class subsample (reference
    ``dataset_DCL.py:100-115`` 10% val subsampling)."""
    rng = np.random.RandomState(seed)
    labels = np.asarray(labels)
    keep = []
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        k = max(len(idx) // int(round(1 / fraction)), 1)
        keep.extend(rng.choice(idx, size=k, replace=False))
    return np.sort(np.asarray(keep))


# ---------------------------------------------------------------------------
# device-resident DCL pipeline (jitted; SURVEY §2.6 item 7)
# ---------------------------------------------------------------------------

def device_neighborhood_permutation(key, n, grid=7, ran=2):
    """Batched jax version of ``neighborhood_permutation``: [n, grid*grid].

    Identical law: per-cell sort keys index + U(-ran, ran), argsort within
    rows then within columns.
    """
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(key)
    base = jnp.broadcast_to(
        jnp.arange(grid * grid, dtype=jnp.int32).reshape(1, grid, grid),
        (n, grid, grid))
    keys = jnp.arange(grid, dtype=jnp.float32)[None, None, :] + jax.random.uniform(
        k1, (n, grid, grid), minval=-ran, maxval=ran)
    base = jnp.take_along_axis(base, jnp.argsort(keys, axis=2), axis=2)
    keys = jnp.arange(grid, dtype=jnp.float32)[None, :, None] + jax.random.uniform(
        k2, (n, grid, grid), minval=-ran, maxval=ran)
    base = jnp.take_along_axis(base, jnp.argsort(keys, axis=1), axis=1)
    return base.reshape(n, -1)


def device_apply_jigsaw(imgs, perms, grid=7):
    """Batched jax version of ``apply_jigsaw``.

    imgs: [B, S, S, C] with S divisible by grid; perms: [B, grid*grid].
    """
    import jax.numpy as jnp

    b, s, _, c = imgs.shape
    assert s % grid == 0, f"image size {s} not divisible by grid {grid}"
    cell = s // grid
    p = imgs.reshape(b, grid, cell, grid, cell, c)
    p = p.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid * grid, cell, cell, c)
    p = jnp.take_along_axis(p, perms[:, :, None, None, None], axis=1)
    p = p.reshape(b, grid, grid, cell, cell, c)
    return p.transpose(0, 1, 3, 2, 4, 5).reshape(b, s, s, c)


def device_swap_law(perms, grid=7):
    import jax.numpy as jnp

    n = grid * grid
    return (perms.astype(jnp.float32) - n // 2) / n


def make_dcl_device_augment(image_size, rotate=15.0, grid=7, ran=2,
                            cls_2=True, num_classes=None, hflip_prob=0.5):
    """Jitted DCL train-batch builder: (key, batch) -> 2x batch.

    Input batch: {'img': uint8 [B, R, R, 3], 'label': [B], 'weight'?: [B]}.
    Output: the reference DCLTrainCollate contract (``dataset_DCL.py:118-143``)
    with 2B rows — images rotated(±rotate°)/random-cropped(S)/flipped, then
    [unswapped; jigsaw-swapped], plus label/label_swap/swap_law (and weight,
    duplicated, when the trainer padded the host batch).
    """
    import math

    import jax
    import jax.numpy as jnp

    from ..ops.resample import grid_sample_bilinear
    from .transforms_device import IMAGENET_MEAN as MEAN_J
    from .transforms_device import IMAGENET_STD as STD_J
    from .transforms_device import hflip

    s = int(image_size)
    n_cells = grid * grid

    def augment(key, batch):
        raw = batch["img"]
        b, r = raw.shape[0], raw.shape[1]
        k_rot, k_y, k_x, k_flip, k_perm = jax.random.split(key, 5)
        imgs = raw.astype(jnp.float32) / 255.0

        # rotate about the R-image center (PIL rotate = CCW, zero fill),
        # fused with the random S-crop into one output->input grid sample
        theta = jax.random.uniform(k_rot, (b,), minval=-rotate, maxval=rotate)
        theta = theta * (math.pi / 180.0)
        top = jax.random.randint(k_y, (b,), 0, r - s + 1).astype(jnp.float32)
        left = jax.random.randint(k_x, (b,), 0, r - s + 1).astype(jnp.float32)
        cy = cx = (r - 1) / 2.0
        ys = jnp.arange(s, dtype=jnp.float32)[None, :, None] + top[:, None, None]
        xs = jnp.arange(s, dtype=jnp.float32)[None, None, :] + left[:, None, None]
        cos_t = jnp.cos(theta)[:, None, None]
        sin_t = jnp.sin(theta)[:, None, None]
        src_x = cos_t * (xs - cx) + sin_t * (ys - cy) + cx
        src_y = -sin_t * (xs - cx) + cos_t * (ys - cy) + cy
        grid_yx = jnp.stack(jnp.broadcast_arrays(src_y, src_x), axis=-1)
        out = grid_sample_bilinear(imgs, grid_yx)
        out = hflip(k_flip, out, hflip_prob)

        perms = device_neighborhood_permutation(k_perm, b, grid, ran)
        swapped = device_apply_jigsaw(out, perms, grid)
        both = jnp.concatenate([out, swapped], axis=0)
        both = (both - MEAN_J) / STD_J

        labels = batch["label"]
        new = dict(batch)
        new["img"] = both
        new["label"] = jnp.concatenate([labels, labels])
        if cls_2:
            new["label_swap"] = jnp.concatenate(
                [jnp.ones((b,), labels.dtype), jnp.zeros((b,), labels.dtype)])
        else:
            new["label_swap"] = jnp.concatenate(
                [labels, labels + int(num_classes)])
        ident = jnp.broadcast_to(
            (jnp.arange(n_cells, dtype=jnp.float32) - n_cells // 2) / n_cells,
            (b, n_cells))
        new["swap_law"] = jnp.concatenate([ident, device_swap_law(perms, grid)])
        if "weight" in batch:
            new["weight"] = jnp.concatenate([batch["weight"], batch["weight"]])
        return new

    return augment


def make_dcl_device_eval(image_size, grid=7, cls_2=True):
    """Jitted DCL eval-batch prep: center crop + normalize + identity law
    (``DCLValCollate`` semantics; no 2x expansion)."""
    import jax.numpy as jnp

    from .transforms_device import IMAGENET_MEAN as MEAN_J
    from .transforms_device import IMAGENET_STD as STD_J

    s = int(image_size)
    n_cells = grid * grid

    def prep(batch):
        raw = batch["img"]
        b, r = raw.shape[0], raw.shape[1]
        off = (r - s) // 2
        imgs = raw[:, off:off + s, off:off + s, :].astype(jnp.float32) / 255.0
        new = dict(batch)
        new["img"] = (imgs - MEAN_J) / STD_J
        labels = batch["label"]
        new["label_swap"] = (jnp.ones_like(labels) if cls_2 else labels)
        new["swap_law"] = jnp.broadcast_to(
            (jnp.arange(n_cells, dtype=jnp.float32) - n_cells // 2) / n_cells,
            (b, n_cells))
        return new

    return prep
