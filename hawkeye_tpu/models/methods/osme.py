"""OSME: one-squeeze multi-excitation attention (paired with MAMC loss).

Reference: ``model/methods/OSME.py`` — P parallel SE-style excitation blocks
over ResNet-101 c5 features; each branch reweights channels, flattens the
map, and maps to a 1024-d part feature via its own FC; the classifier runs
on the SUM of part features. Trained with BalancedBatchSampler(5×2) + MAMC
(``Examples/OSMENet.py:18-33``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONE, MODEL


class OSMEBlock(nn.Module):
    channels: int
    ratio: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        z = jnp.mean(x, axis=(1, 2))  # squeeze
        m = nn.Dense(self.channels // self.ratio, dtype=self.dtype, name="fc1")(z)
        m = nn.relu(m)
        m = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(m)
        m = nn.sigmoid(m)
        return x * m[:, None, None, :]  # excitation


class OSMENet(nn.Module):
    num_classes: int
    num_attention: int = 2
    part_dim: int = 1024
    backbone_name: str = "resnet101"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")(x, train=train)["c5"]
        b = feats.shape[0]
        c = feats.shape[-1]
        parts = []
        for p in range(self.num_attention):
            s = OSMEBlock(channels=c, dtype=self.dtype, name=f"osme_{p}")(feats)
            f = nn.Dense(self.part_dim, dtype=jnp.float32, name=f"part_fc_{p}")(
                s.reshape(b, -1).astype(jnp.float32))
            parts.append(f)
        summed = sum(parts)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(summed)
        return {"logits": logits, "parts": jnp.stack(parts, axis=1)}


@MODEL.register(name="OSMENet")
def build_osme(config):
    return OSMENet(
        num_classes=int(config.num_classes),
        num_attention=int(config.get("num_attention", 2)),
        backbone_name=config.get("backbone", "resnet101"),
    )
