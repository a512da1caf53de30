#!/usr/bin/env python
"""Generate the committed JPEG fixture set (license-free, procedurally
generated locally — no external imagery). Deterministic: re-running
reproduces byte-identical files with the same PIL/libjpeg version.

Layout (mirrors a CUB-style tree + metadata lists, reference
``dataset/dataset.py:27-30`` format):

    tests/fixtures/images/class_<k>/img_<i>.jpg   (~500px, quality 85)
    tests/fixtures/meta/train.txt                 "<label> <relpath>"
    tests/fixtures/meta/val.txt
"""

import os

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))
N_CLASSES = 8
TRAIN_PER_CLASS = 5
VAL_PER_CLASS = 2


def make_image(rng, w, h):
    """Natural-ish statistics so JPEG files have realistic size/entropy:
    low-frequency color field + mid-frequency texture + a few shapes."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        # random low-frequency plane waves
        for _ in range(3):
            fx, fy = rng.uniform(0.5, 4, 2)
            ph = rng.uniform(0, 2 * np.pi)
            img[..., c] += rng.uniform(20, 60) * np.sin(
                2 * np.pi * (fx * xx / w + fy * yy / h) + ph)
        img[..., c] += rng.uniform(60, 180)
    # mid-frequency texture (smoothed noise via box blur)
    tex = rng.randn(h // 4 + 1, w // 4 + 1, 3).astype(np.float32)
    tex = np.kron(tex, np.ones((4, 4, 1), np.float32))[:h, :w]
    img += 18.0 * tex
    # a few filled ellipses ("parts")
    for _ in range(rng.randint(3, 7)):
        cy, cx = rng.uniform(0.15, 0.85) * h, rng.uniform(0.15, 0.85) * w
        ry, rx = rng.uniform(0.04, 0.18) * h, rng.uniform(0.04, 0.18) * w
        mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
        img[mask] = rng.uniform(0, 255, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    rng = np.random.RandomState(20260817)
    train_lines, val_lines = [], []
    for k in range(N_CLASSES):
        cls_dir = os.path.join(HERE, "images", f"class_{k:02d}")
        os.makedirs(cls_dir, exist_ok=True)
        for i in range(TRAIN_PER_CLASS + VAL_PER_CLASS):
            # varied sizes around the ~500px CUB photo scale
            w = int(rng.randint(420, 640))
            h = int(rng.randint(340, 560))
            arr = make_image(rng, w, h)
            rel = f"class_{k:02d}/img_{i:02d}.jpg"
            Image.fromarray(arr).save(os.path.join(HERE, "images", rel),
                                      quality=85)
            line = f"{k} {rel}"
            (train_lines if i < TRAIN_PER_CLASS else val_lines).append(line)
    os.makedirs(os.path.join(HERE, "meta"), exist_ok=True)
    with open(os.path.join(HERE, "meta", "train.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(HERE, "meta", "val.txt"), "w") as f:
        f.write("\n".join(val_lines) + "\n")
    print(f"wrote {len(train_lines)} train / {len(val_lines)} val JPEGs")


if __name__ == "__main__":
    main()
