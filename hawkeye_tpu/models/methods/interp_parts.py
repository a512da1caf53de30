"""Interpretable Parts (IP-ResNet): region grouping with part dictionary.

Reference: ``model/methods/Interp_Parts.py`` — a ResNet trunk truncated at
layer3 feeds a GroupingUnit (``:25-128``): HW positions soft-assign to K
learned part centers by negative squared distance with a learned per-part
smoothing (sigmoid), residual-encoded against the centers and L2-normalized;
1×1-bottleneck post blocks and an attention head over the K part features
(``:276-298``); output is the attention-weighted sum of part features → BN →
linear. Forward returns (logits, att, assign).

TPU notes: the grouping is two batched matmuls (assignment logits = distance
matrix; pooling = assign @ X) — pure MXU. The trunk reuses the standard
Bottleneck stack with 3 stages.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...registry import MODEL
from ..backbones.resnet import Bottleneck, ResNet


class GroupingUnit(nn.Module):
    num_parts: int

    @nn.compact
    def __call__(self, feats):
        """feats: [B, H, W, C] → (region features [B, K, C] L2-normalized,
        assign [B, H, W, K])."""
        b, h, w, c = feats.shape
        x = feats.reshape(b, h * w, c).astype(jnp.float32)
        centers = self.param(
            "weight",
            lambda key: jnp.clip(
                nn.initializers.kaiming_normal()(key, (self.num_parts, c)),
                1e-5, None))  # [K, C] (reference msra init + clamp)
        smooth = self.param("smooth_factor",
                            nn.initializers.zeros, (self.num_parts,))
        beta = nn.sigmoid(smooth)  # [K]

        cx = x @ centers.T  # [B, HW, K]
        x_sq = (x**2).sum(-1, keepdims=True)  # [B, HW, 1]
        c_sq = (centers**2).sum(-1)[None, None, :]  # [1, 1, K]
        logits = jnp.clip(2 * cx - x_sq - c_sq, None, 0.0) / beta
        assign = nn.softmax(logits, axis=-1)  # over parts, [B, HW, K]

        qx = jnp.einsum("bpk,bpc->bkc", assign, x)  # [B, K, C]
        sum_ass = jnp.clip(assign.sum(axis=1), 1e-5, None)[..., None]  # [B,K,1]
        sigma = jnp.sqrt(beta / 2.0)[None, :, None]
        out = (qx / sum_ass - centers[None]) / sigma
        out = out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out, assign.reshape(b, h, w, self.num_parts)


class Bottleneck1x1(nn.Module):
    """Bottleneck whose spatial conv is 1×1 (operates on the parts axis)."""

    filters: int
    downsample: bool = False
    norm: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        identity = x
        out = conv(self.filters, (1, 1), name="conv1")(x)
        out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.filters, (1, 1), name="conv2")(out)
        out = self.norm(name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.filters * 4, (1, 1), name="conv3")(out)
        # reference zero-inits the last BN's gamma in residual blocks
        out = self.norm(name="bn3", scale_init=nn.initializers.zeros)(out)
        if self.downsample:
            identity = conv(self.filters * 4, (1, 1), name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class InterpParts(nn.Module):
    num_classes: int
    num_parts: int = 5
    stage_sizes: tuple = (3, 4, 6)  # resnet50 layers 1-3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk = ResNet(block_cls=Bottleneck, stage_sizes=self.stage_sizes,
                       strides=(1, 2, 2), num_classes=0, dtype=self.dtype,
                       name="backbone")
        feats = trunk(x, train=train)["c4"]  # [B, H, W, 1024]

        region, assign = GroupingUnit(self.num_parts, name="grouping")(feats)
        # region features as a [B, K, 1, C] "image" for the 1x1 blocks
        rf = region[:, :, None, :]  # [B, K, 1, 1024]
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)

        att = Bottleneck1x1(256, norm=norm, name="attconv_0")(rf)
        att = Bottleneck1x1(256, norm=norm, name="attconv_1")(att)
        att = nn.Conv(1, (1, 1), use_bias=True, name="attconv_out")(att)
        att = norm(name="attconv_bn")(att)
        att = nn.relu(att)
        att = nn.softmax(att, axis=1)  # over parts, [B, K, 1, 1]

        pf = Bottleneck1x1(512, downsample=True, norm=norm, name="post_0")(rf)
        for i in range(1, 4):
            pf = Bottleneck1x1(512, norm=norm, name=f"post_{i}")(pf)
        # attention-weighted SUM over parts (avg_pool1d * n_parts)
        pooled = (pf * att).sum(axis=(1, 2))  # [B, 2048]
        pooled = norm(name="groupingbn")(pooled[:, None, None, :])[:, 0, 0, :]
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="mylinear")(pooled)
        return {"logits": logits, "att": att[:, :, 0, 0],
                "assign": assign}


def _build_ip(stage_sizes):
    def factory(config):
        return InterpParts(
            num_classes=int(config.num_classes),
            num_parts=int(config.get("num_parts", 5)),
            stage_sizes=stage_sizes,
        )

    return factory


MODEL.register(_build_ip((3, 4, 6)), name="IP_ResNet50")
MODEL.register(_build_ip((3, 4, 23)), name="IP_ResNet101")
