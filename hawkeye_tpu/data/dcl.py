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
(448/7 = 64 px), done in numpy at collate time here; a jitted device variant
is trivial with the same permutation tensors.
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
        return {
            "img": img_batch,
            "label": label_batch,
            "label_swap": swap_label_batch,
            "swap_law": law_batch,
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
                "swap_law": law}


class DCLBackboneCollate:
    """Unswapped images + class labels only (reference collate_fn4backbone,
    ``dataset_DCL.py:167-180``) — for backbone-only pretraining on the DCL
    augmentation."""

    def __call__(self, items):
        imgs = np.stack([_normalize(it["img"]) for it in items]).astype(np.float32)
        labels = np.asarray([int(it["label"]) for it in items], np.int64)
        return {"img": imgs, "label": labels}


class DCLTestCollate:
    """Raw eval collate (reference collate_fn4test, ``dataset_DCL.py:183-193``)."""

    def __call__(self, items):
        imgs = np.stack([_normalize(it["img"]) for it in items]).astype(np.float32)
        labels = np.asarray([int(it["label"]) for it in items], np.int64)
        return {"img": imgs, "label": labels}


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
