"""MGE-CNN: mixture of granularity-specific experts.

Reference: ``model/methods/MGE_CNN/`` — three expert branches (full image →
GradCAM-guided bbox crop → nested crop), each a full ResNet-50 copy with a
conv6 part head and cat classifiers; a gating branch softmax-mixes the three
cat logits; 10 logit sets total, trained with summed CE
(``Examples/MGE_CNN.py:37-56``).

TPU redesign of the GradCAM-in-forward (``grad_cam.py:51-91``): the
reference's hook-based ``one_hot.backward(retain_graph=True)`` computes the
gradient of the target-class score w.r.t. the LAST conv5 block's output —
but that layer feeds straight into avg-pool + linear, so the gradient is
analytically ``W[y, c] / HW``: the per-sample CAM weights are simply the
relu'd classifier rows. No inner backward pass exists in this build; the
crop box comes from a thresholded CAM via static min/max index arithmetic
(``get_bbox``, ``MGE.py:48-72``, which the reference loops per image), and
the crop itself is the batched MXU resample.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import crop_resize_bilinear, resize_bilinear
from ...registry import BACKBONE, MODEL


def l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def cam_bbox(images, conv5, weights, rate, img_size):
    """Threshold the CAM and crop the enclosing box, batched & static-shape.

    images: [B, S, S, 3]; conv5: [B, h, w, C]; weights: [B, C] (relu'd
    classifier rows). Returns cropped+resized images [B, S, S, 3].
    """
    cam = jnp.einsum("bhwc,bc->bhw", jax.lax.stop_gradient(conv5), weights)
    # align_corners=True: reference get_bbox interpolation (MGE.py:54)
    cam = resize_bilinear(cam[..., None], img_size, img_size,
                          align_corners=True)[..., 0]
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    cam = (cam - lo) / jnp.maximum(hi - lo, 1e-8)
    mask = cam > rate  # [B, S, S]; max position is always 1.0 > rate

    rows = mask.any(axis=2)  # [B, S]
    cols = mask.any(axis=1)
    idx = jnp.arange(img_size, dtype=jnp.float32)

    def lohi(active):
        big = jnp.asarray(img_size, jnp.float32)
        lo = jnp.min(jnp.where(active, idx, big), axis=1)
        hi = jnp.max(jnp.where(active, idx, -1.0), axis=1)
        return lo, hi

    y1, y2 = lohi(rows)
    x1, x2 = lohi(cols)
    # degenerate (empty/single-pixel) boxes fall back to the full image
    bad = (y2 <= y1) | (x2 <= x1)
    y1 = jnp.where(bad, 0.0, y1)
    x1 = jnp.where(bad, 0.0, x1)
    y2 = jnp.where(bad, float(img_size), y2)
    x2 = jnp.where(bad, float(img_size), x2)
    boxes = jnp.stack([y1, x1, y2 - y1, x2 - x1], axis=1)
    crops = crop_resize_bilinear(images, boxes, img_size, img_size,
                                 align_corners=True)  # MGE.py:69-70
    return jax.lax.stop_gradient(crops)


class _Expert(nn.Module):
    """One granularity expert: backbone + classifier + conv6 part head +
    cat classifier. Returns (logits, logits_max, logits_cat, c4, c5, pool)."""

    num_classes: int
    backbone_name: str
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train):
        stages = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")(x, train=train)
        pool = stages["pool"]  # [B, 2048] f32
        logits = nn.Dense(self.num_classes, name="classifier")(pool)

        # the reference's conv6 is a 1x1 conv with PADDING 1 (MGE.py:106-108):
        # the padded ring contributes relu(bias) to the max pool — replicate
        # by zero-padding the input ring
        c4 = jnp.pad(jax.lax.stop_gradient(stages["c4"]).astype(jnp.float32),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        part = nn.Conv(10 * self.num_classes, (1, 1), name="conv6")(c4)
        pool_part = nn.relu(part).max(axis=(1, 2))  # [B, 10C]
        logits_max = nn.Dense(self.num_classes, name="cls_part")(pool_part)
        cat = jnp.concatenate([
            10 * l2n(jax.lax.stop_gradient(pool)),
            10 * l2n(jax.lax.stop_gradient(pool_part))], axis=1)
        logits_cat = nn.Dense(self.num_classes, name="cls_cat")(cat)
        return logits, logits_max, logits_cat, stages["c5"]


class MGECNN(nn.Module):
    num_classes: int
    image_size: int = 448
    box_thred: float = 0.2
    backbone_name: str = "resnet50"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, labels=None):
        experts = [
            _Expert(self.num_classes, self.backbone_name, self.dtype,
                    name=f"expert_{i}") for i in range(3)
        ]

        def cam_weights(expert_idx, logits, pick_labels):
            """relu'd classifier rows = the analytic GradCAM weights."""
            w = self.variables["params"][f"expert_{expert_idx}"]["classifier"][
                "kernel"]  # [2048, C]
            y = pick_labels if pick_labels is not None else jnp.argmax(
                jax.lax.stop_gradient(logits), -1)
            return nn.relu(jax.lax.stop_gradient(w)[:, y].T)  # [B, 2048]

        all_logits = []
        cats = []
        view = x
        for i, expert in enumerate(experts):
            logits, logits_max, logits_cat, c5 = expert(view, train)
            all_logits += [logits, logits_max, logits_cat]
            cats.append(logits_cat)
            if i < 2:
                weights = cam_weights(i, logits, labels)
                view = cam_bbox(view, c5, weights, self.box_thred,
                                self.image_size)

        gate_stages = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="gate_backbone")(x, train=train)
        g = nn.Dense(512, name="cls_gate_0")(gate_stages["pool"])
        g = nn.Dense(3, name="cls_gate_1")(g)
        pr_gate = nn.softmax(g, axis=-1)  # [B, 3]
        gate_logits = sum(
            jax.lax.stop_gradient(cats[i]) * pr_gate[:, i:i + 1]
            for i in range(3))
        all_logits.append(gate_logits)

        return {
            "logits": gate_logits,
            "all_logits": jnp.stack(all_logits),  # [10, B, C]
            "pr_gate": pr_gate,
        }


@MODEL.register(name="MGE_CNN")
def build_mge(config):
    return MGECNN(
        num_classes=int(config.num_classes),
        image_size=int(config.get("image_size", 448)),
        box_thred=float(config.get("box_thred", 0.2)),
        backbone_name=config.get("backbone", "resnet50"),
    )
