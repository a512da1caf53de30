"""Baseline classifiers: a bare backbone + softmax head.

Reference: ``model/backbone/resnet.py:403-412`` registers ``ResNet50`` /
``ResNet101`` directly in the MODEL registry as the Baseline method
(used by ``Examples/Baseline.py`` with ``configs/Baseline.yaml``).

Model output contract (framework-wide): every MODEL module returns a dict
containing at least ``'logits'`` [B, C]; methods add extra keys their loss
consumes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONE, MODEL


class BaselineClassifier(nn.Module):
    """Backbone trunk + linear classifier."""

    backbone_name: str
    num_classes: int
    dtype: Any = jnp.bfloat16
    stem_space_to_depth: bool = False

    def setup(self):
        kwargs = {}
        if self.stem_space_to_depth:
            kwargs["stem_space_to_depth"] = True  # resnets only
        self.backbone = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone", **kwargs
        )
        self.fc = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")

    def __call__(self, x, train: bool = False):
        stages = self.backbone(x, train=train)
        logits = self.fc(stages["pool"])
        return {"logits": logits}


def _register_baseline(model_name, backbone_name):
    def factory(config):
        return BaselineClassifier(
            backbone_name=backbone_name,
            num_classes=config.num_classes,
            dtype=(jnp.float32
                   if str(getattr(config, "dtype", "bfloat16"))
                   in ("float32", "f32")
                   else jnp.bfloat16),
            stem_space_to_depth=bool(getattr(config, "stem_space_to_depth", False)),
        )

    factory.__name__ = model_name
    MODEL.register(factory, name=model_name)


_register_baseline("ResNet50", "resnet50")
_register_baseline("ResNet101", "resnet101")
_register_baseline("ResNet18", "resnet18")
_register_baseline("ResNet34", "resnet34")
_register_baseline("ResNet152", "resnet152")
_register_baseline("VGG16", "vgg16")
