"""CBCNN: compact bilinear pooling (count-sketch + FFT) over VGG-16.

Reference behavior (``model/methods/CBCNN.py``): two fixed count-sketch
projections (seeds 1/3/5/7, ``:76-94``) of the relu5_3 features to d=6000
(``configs/CBCNN_S1.yaml`` output_channel), multiplied in the Fourier domain
and summed over positions (``:96-135``), then signed-sqrt + L2 and a linear
classifier; same two-stage recipe as BCNN.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.cbp import (compact_bilinear_pool, make_irdft_half,
                        make_sketch_matrix)
from ...registry import BACKBONE, MODEL


class CBCNN(nn.Module):
    num_classes: int
    stage: int = 2
    input_channel: int = 512
    output_channel: int = 6000
    backbone_name: str = "vgg16"
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")
        self.fc = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")
        # fixed sketches, reference seeds (CBCNN.py:76-94): h seeds 1/5,
        # s 3/7. Kept as HOST numpy arrays so compact_bilinear_pool can
        # precompute their rfft on host (a traced rfft of a constant is a
        # per-step device FFT — XLA can't fold fft custom-calls)
        self.sketch1 = make_sketch_matrix(
            self.input_channel, self.output_channel, 1, 3)
        self.sketch2 = make_sketch_matrix(
            self.input_channel, self.output_channel, 5, 7)
        # inverse-rDFT matrices as a DEVICE-RESIDENT variable collection
        # (TPU fft custom-calls are slow, and jit literal constants this
        # size are re-staged per dispatch on remote runtimes — cbp.py).
        # ``*_cache`` collections are derived constants: checkpointing
        # skips them and re-derives at init (engine/checkpoint.py).
        self.irdft = self.variable(
            "fourier_cache", "irdft",
            lambda: tuple(jnp.asarray(m)
                          for m in make_irdft_half(self.output_channel)))

    def __call__(self, x, train: bool = False):
        # post-pool5 map, matching the reference's full-features backbone
        # (model/methods/CBCNN.py:21-22; see bcnn.py note)
        feats = self.backbone(x, train=train)["pooled_features"]
        if self.stage == 1:
            feats = jax.lax.stop_gradient(feats)
        v = compact_bilinear_pool(feats, self.sketch1, self.sketch2,
                                  irdft=self.irdft.value)
        return {"logits": self.fc(v), "features": v}


@MODEL.register(name="CBCNN")
def build_cbcnn(config):
    return CBCNN(
        num_classes=int(config.num_classes),
        stage=int(config.get("stage", 2)),
        input_channel=int(config.get("input_channel", 512)),
        output_channel=int(config.get("output_channel", 6000)),
        backbone_name=config.get("backbone", "vgg16"),
    )
