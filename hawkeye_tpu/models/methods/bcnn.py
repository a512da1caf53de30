"""BCNN: bilinear CNN pooling over VGG-16 conv5 features.

Reference behavior (``model/methods/BCNN.py``): relu5_3 feature map →
bilinear pooling (C×C Gram / HW, ``:13-27``) → sqrt + L2 normalize → linear
classifier; two-stage training where stage 1 freezes the backbone (the
reference sets requires_grad=False AND detaches features, ``:45-52``) with
SGD lr=1.0 (``configs/BCNN_S1.yaml``), stage 2 fine-tunes everything from the
stage-1 best model (``configs/BCNN_S2.yaml``).

TPU notes: the pooling is the fused MXU op in ``ops/bilinear.py``; stage-1
freezing is ``lax.stop_gradient`` on the feature map (zero gradient flow,
matching the reference's detach) — the optimizer still holds backbone slots
so stage-2 resume is shape-compatible.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.bilinear import bilinear_pool
from ...registry import BACKBONE, MODEL


class BCNN(nn.Module):
    num_classes: int
    stage: int = 2
    backbone_name: str = "vgg16"
    fused_pooling: bool = False  # Pallas kernel (ops/pallas_bilinear.py)
    efficient_pool: bool = True  # argmax-index pools (ops/pool.py)
    remat_first: bool = True     # checkpoint the first conv+relu
    fast_dgrad: bool = False     # fwd-form dgrad for 64->64 convs (ops/conv)
    dtype: Any = jnp.bfloat16

    def setup(self):
        kwargs = {}
        if self.backbone_name.startswith("vgg"):
            kwargs = dict(efficient_pool=self.efficient_pool,
                          remat_first=self.remat_first,
                          fast_dgrad=self.fast_dgrad)
        self.backbone = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone", **kwargs)
        self.fc = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")

    def __call__(self, x, train: bool = False):
        # The reference's backbone is the WHOLE torchvision features stack
        # including the final maxpool (``nn.Sequential(*list(children)[:-2]
        # [0])`` unpacks all of ``features``, model/methods/BCNN.py:38-39),
        # so bilinear pooling consumes the post-pool5 map (14x14 at 448).
        feats = self.backbone(x, train=train)["pooled_features"]
        if self.stage == 1:
            feats = jax.lax.stop_gradient(feats)
        if self.fused_pooling:
            from ...ops.pallas_bilinear import bilinear_pool_fused

            v = bilinear_pool_fused(feats)
        else:
            v = bilinear_pool(feats)  # [B, C*C], f32, sqrt+L2 normalized
        return {"logits": self.fc(v), "features": v}


@MODEL.register(name="BCNN")
def build_bcnn(config):
    return BCNN(
        num_classes=int(config.num_classes),
        stage=int(config.get("stage", 2)),
        backbone_name=config.get("backbone", "vgg16"),
        fused_pooling=bool(config.get("fused_pooling", False)),
        efficient_pool=bool(config.get("efficient_pool", True)),
        remat_first=bool(config.get("remat_first", True)),
        fast_dgrad=bool(config.get("fast_dgrad", False)),
    )
