"""DCL: destruction-construction learning.

Reference: ``model/methods/DCL.py`` — ResNet-50 trunk with three heads:
class logits (bias-free), adversarial swap classifier (2-way or 2×C), and a
Convmask region-alignment head (1×1 conv → 2×2 avgpool → tanh → flatten)
whose output regresses the jigsaw "swap law".

Data-side machinery (reference ``dataset/dataset_DCL.py`` + RandomSwap in
``dataset/transforms.py:243-319``) lives in ``hawkeye_tpu/data/dcl.py``:
the destruction is a device-side permutation gather instead of per-image
PIL crops.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONE, MODEL


class DCL(nn.Module):
    num_classes: int
    cls_2: bool = True
    cls_2xmul: bool = False
    backbone_name: str = "resnet50"
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")
        self.convmask = nn.Conv(1, (1, 1), use_bias=True, dtype=jnp.float32,
                                name="convmask")
        self.classifier = nn.Dense(self.num_classes, use_bias=False,
                                   dtype=jnp.float32, name="classifier")
        swap_classes = 2 if self.cls_2 else 2 * self.num_classes
        self.classifier_swap = nn.Dense(swap_classes, use_bias=False,
                                        dtype=jnp.float32,
                                        name="classifier_swap")

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train=train)["c5"]  # [B, H, W, 2048]
        mask = self.convmask(feats.astype(jnp.float32))  # [B, H, W, 1]
        b, h, w, _ = mask.shape
        mask = mask.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))  # 2x2 avgpool
        mask = jnp.tanh(mask).reshape(b, -1)

        pooled = jnp.mean(feats, axis=(1, 2)).astype(jnp.float32)
        return {
            "logits": self.classifier(pooled),
            "swap_logits": self.classifier_swap(pooled),
            "mask": mask,
        }


@MODEL.register(name="DCL")
def build_dcl(config):
    return DCL(
        num_classes=int(config.num_classes),
        cls_2=bool(config.get("cls_2", True)),
        cls_2xmul=bool(config.get("cls_2xmul", False)),
        backbone_name=config.get("backbone", "resnet50"),
    )
