"""Fast MPN-COV: covariance pooling with iterative matrix square root.

Reference behavior (``model/methods/MPNCOV.py:41-102``): ResNet-50 c5
features → 1×1 conv dimensionality reduction 2048→256 (+BN+ReLU) → Covpool
(X Ī Xᵀ) → Sqrtm (Newton–Schulz, iterN=5) → Triuvec → linear classifier.
Config keys per ``configs/MPN.yaml``: iter_num, is_sqrt, is_vec, input_dim,
dimension_reduction, num_classes. Training uses backbone lr×0.2 param groups
(``Examples/MPN.py:13-18``).

TPU notes: the whole pooling chain lives in ``ops/isqrt.py`` as batched
f32 matmuls differentiated by autodiff (see that module's docstring for why
no hand-written VJP is needed).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.isqrt import covariance_pool, newton_schulz_sqrt, triu_vec
from ...registry import BACKBONE, MODEL


class MPN(nn.Module):
    num_classes: int
    iter_num: int = 5
    is_sqrt: bool = True
    is_vec: bool = True
    dimension_reduction: int | None = 256
    backbone_name: str = "resnet50"
    # A/B knob for ops/isqrt.py's [2B,C,C] coupled-pair bmm (round 5)
    coupled_newton_schulz: bool = True
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")
        if self.dimension_reduction:
            self.dr_conv = nn.Conv(self.dimension_reduction, (1, 1),
                                   use_bias=False, dtype=self.dtype,
                                   name="dr_conv")
            self.dr_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                      dtype=self.dtype, name="dr_bn")
        self.fc = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train=train)["c5"]
        if self.dimension_reduction:
            feats = self.dr_conv(feats)
            feats = self.dr_bn(feats, use_running_average=not train)
            feats = nn.relu(feats)
        cov = covariance_pool(feats)  # [B, C, C] f32
        if self.is_sqrt:
            cov = newton_schulz_sqrt(
                cov, self.iter_num,
                coupled_batched=self.coupled_newton_schulz)
        if self.is_vec:
            v = triu_vec(cov)
        else:
            v = cov.reshape(cov.shape[0], -1)
        return {"logits": self.fc(v), "features": v}


@MODEL.register(name="MPN")
def build_mpn(config):
    return MPN(
        num_classes=int(config.num_classes),
        iter_num=int(config.get("iter_num", 5)),
        is_sqrt=bool(config.get("is_sqrt", True)),
        is_vec=bool(config.get("is_vec", True)),
        dimension_reduction=config.get("dimension_reduction", 256),
        backbone_name=config.get("backbone", "resnet50"),
        coupled_newton_schulz=bool(config.get("coupled_newton_schulz", True)),
    )
