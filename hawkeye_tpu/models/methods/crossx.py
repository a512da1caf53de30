"""CrossX: cross-layer multi-excitation feature learning.

Reference: ``model/methods/CrossX.py`` — a ResNet-50 whose LAST block of
layer3 and layer4 applies P parallel SE-style excitations (MELayer) to the
pre-residual output, yielding P part maps per stage (``:47-70,73-122``);
cross-layer fusion upsamples the layer4 parts to layer3 resolution, adds,
and refines with 3×3 conv+BN (``:205-244``); three classifier heads (ulti =
avg-pooled layer4 parts, plty = max-pooled layer3 parts, cmbn = fused) are
trained with CrossXLoss (CE on summed logits + decorrelation + KL).

TPU notes: the trunk reuses the standard Bottleneck; only the final block of
stages 3/4 is the custom MEBottleneck. Upsampling is the batched MXU
resize (``ops/resample``) with a shared nearest/bilinear weight matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resample import resize_nearest
from ...registry import MODEL
from ..backbones.resnet import Bottleneck


class MELayer(nn.Module):
    channels: int
    nparts: int
    reduction: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        z = jnp.mean(x, axis=(1, 2))
        parts = []
        for i in range(self.nparts):
            m = nn.Dense(max(self.channels // self.reduction, 1),
                         dtype=self.dtype, name=f"fc1_{i}")(z)
            m = nn.relu(m)
            m = nn.Dense(self.channels, dtype=self.dtype, name=f"fc2_{i}")(m)
            m = nn.sigmoid(m)
            parts.append(x * m[:, None, None, :])
        return parts


class MEBottleneck(nn.Module):
    """Bottleneck whose output splits into P excitation branches: the main
    path adds the residual as usual; each part is relu(excited + residual)."""

    filters: int
    nparts: int
    reduction: int
    norm: Any
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        identity = x
        out = conv(self.filters, (1, 1), name="conv1")(x)
        out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(out)
        out = self.norm(name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.filters * 4, (1, 1), name="conv3")(out)
        out = self.norm(name="bn3")(out)
        parts = MELayer(channels=self.filters * 4, nparts=self.nparts,
                        reduction=self.reduction, dtype=self.dtype,
                        name="me")(out)
        main = nn.relu(out + identity)
        parts = [nn.relu(p + identity) for p in parts]
        return main, parts


class CrossXNet(nn.Module):
    num_classes: int
    num_parts: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        stage_sizes = (3, 4, 6, 3)
        filters = 64
        for i, num_blocks in enumerate(stage_sizes):
            stride = 1 if i == 0 else 2
            me_stage = i >= 2 and self.num_parts > 1
            for j in range(num_blocks):
                blk_stride = stride if j == 0 else 1
                needs_down = j == 0 and (blk_stride != 1 or x.shape[-1] != filters * 4)
                if me_stage and j == num_blocks - 1:
                    x, parts = MEBottleneck(
                        filters=filters, nparts=self.num_parts, reduction=256,
                        norm=norm, dtype=self.dtype,
                        name=f"layer{i + 1}_{j}")(x)
                    if i == 2:
                        plty_parts = parts
                    else:
                        ulti_parts = parts
                else:
                    x = Bottleneck(filters=filters, stride=blk_stride,
                                   downsample=needs_down, norm=norm,
                                   dtype=self.dtype,
                                   name=f"layer{i + 1}_{j}")(x)
            filters *= 2

        if self.num_parts == 1:
            pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
            logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                              name="fc_ulti")(pooled)
            return {"logits": logits}

        plty_hw = plty_parts[0].shape[1]
        cmbn_feats = []
        for i in range(self.num_parts):
            u = nn.Conv(1024, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"conv2_{i}")(ulti_parts[i])
            # nearest (torch F.interpolate default, CrossX.py:215) — parity
            u = resize_nearest(u, plty_hw, plty_hw)
            f = nn.Conv(1024, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"conv3_{i}")(plty_parts[i] + u)
            f = norm(name=f"bn3_{i}")(f)
            cmbn_feats.append(jnp.mean(f, axis=(1, 2)).astype(jnp.float32))

        plty_pooled = [jnp.max(p, axis=(1, 2)).astype(jnp.float32)
                       for p in plty_parts]
        ulti_pooled = [jnp.mean(p, axis=(1, 2)).astype(jnp.float32)
                       for p in ulti_parts]

        xp = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc_plty")(
            jnp.concatenate(plty_pooled, axis=1))
        xf = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc_ulti")(
            jnp.concatenate(ulti_pooled, axis=1))
        xc = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc_cmbn")(
            jnp.concatenate(cmbn_feats, axis=1))

        return {
            "logits": xf + xp + xc,  # eval prediction = summed heads
            "logits_ulti": xf,
            "logits_plty": xp,
            "logits_cmbn": xc,
            "ulti_parts": jnp.stack(ulti_pooled, axis=1),
            "plty_parts": jnp.stack(plty_pooled, axis=1),
            "cmbn_parts": jnp.stack(cmbn_feats, axis=1),
        }


@MODEL.register(name="CrossX")
def build_crossx(config):
    return CrossXNet(
        num_classes=int(config.get("num_classes", 200)),
        num_parts=int(config.get("num_parts", 2)),
    )
