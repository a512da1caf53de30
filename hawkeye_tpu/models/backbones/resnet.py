"""ResNet backbone family (Flax, NHWC, TPU-first).

Re-implements the capability surface of the reference's torchvision-style
ResNet (``model/backbone/resnet.py:40-267`` with registrations at
``:270-400``): BasicBlock/Bottleneck, groups/width for ResNeXt and Wide
variants, and a ``ResNet50``/``ResNet101`` Baseline classifier registered in
the MODEL registry (``model/backbone/resnet.py:403-412``).

TPU-first choices (deliberately NOT a translation):
- NHWC layout end-to-end (XLA TPU native); bf16 compute with f32 params and
  f32 BatchNorm statistics.
- Stage outputs are returned as a dict so method heads (NTS/CrossX/APCNN/...)
  tap intermediate feature maps without forward hooks.
- BatchNorm statistics: under the Trainer's jit-SPMD train step (no
  ``axis_name``), XLA computes batch statistics over the GLOBAL sharded
  batch — i.e. sync-BN across all chips. This differs from the reference's
  ``DataParallel``, which computes per-replica statistics; sync-BN over the
  same global batch is statistically stronger (more samples per estimate)
  and the expected parity impact is neutral-to-positive. For a per-device-
  stats forward (e.g. exact replication of per-replica BN), wrap the model
  in ``shard_map`` over the data axis; ``bn_cross_replica_axis`` exists for
  explicitly syncing inside such a pmap/shard_map region. Pinned by
  ``tests/test_bn_semantics.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ...registry import BACKBONE
from .norm import GroupedBatchNorm

ModuleDef = Any


class SpaceToDepthStem(nn.Module):
    """7x7/stride-2 stem conv, computed in space-to-depth form (MXU-friendly).

    Mathematically identical to ``Conv(64, (7,7), strides 2, padding 3)`` on
    the raw image, but the image is first rearranged to (H/2, W/2, 12) and the
    kernel (zero-padded 7->8 at the top/left and block-rearranged to
    (4, 4, 12, C)) is applied at stride 1. A 3-channel conv wastes almost the
    whole MXU lane dimension; 12 channels at a quarter of the spatial size is
    ~2x faster on TPU (the classic MLPerf-ResNet input optimization). The
    learnable parameter keeps the canonical (7, 7, 3, C) shape, so checkpoint
    layout and torchvision weight conversion are unchanged; the rearrangement
    is re-derived inside the traced forward (9408 params — free).
    """

    features: int = 64
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, self.features),
            self.param_dtype,
        )
        # pad 7x7 -> 8x8 with a zero row/col at the top/left, then split each
        # spatial dim into (tap, depth) and fold depth into the input channel.
        w = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w = w.reshape(4, 2, 4, 2, 3, self.features)
        w = w.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, self.features)
        b, h, wd, c = x.shape
        assert h % 2 == 0 and wd % 2 == 0 and c == 3, (
            "space-to-depth stem needs an even-sized RGB input"
        )
        x = x.reshape(b, h // 2, 2, wd // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
        return lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    """Two 3x3 convs. Expansion 1."""

    filters: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    norm: ModuleDef = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x):
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype
        )
        identity = x
        out = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                   padding=[(1, 1), (1, 1)], name="conv1")(x)
        out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(out)
        out = self.norm(name="bn2")(out)
        if self.downsample:
            identity = conv(self.filters * self.expansion, (1, 1),
                            strides=(self.stride, self.stride), name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 reduce, 3x3 (stride here = ResNet v1.5), 1x1 expand. Expansion 4."""

    filters: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    norm: ModuleDef = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x):
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype
        )
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        identity = x
        out = conv(width, (1, 1), name="conv1")(x)
        out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = conv(width, (3, 3), strides=(self.stride, self.stride),
                   padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
                   name="conv2")(out)
        out = self.norm(name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.filters * self.expansion, (1, 1), name="conv3")(out)
        out = self.norm(name="bn3")(out)
        if self.downsample:
            identity = conv(self.filters * self.expansion, (1, 1),
                            strides=(self.stride, self.stride), name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet v1.5 trunk.

    ``__call__(x, train)`` returns a dict of stages:
      ``stem`` (post maxpool), ``c2``..``c5`` (layer1..layer4 outputs, NHWC),
      ``pool`` (global average pooled, f32), ``logits`` (if num_classes>0).
    """

    block_cls: ModuleDef
    stage_sizes: Sequence[int]
    num_classes: int = 0
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_cross_replica_axis: str | None = None
    strides: Sequence[int] = (1, 2, 2, 2)
    stem_space_to_depth: bool = False
    # Per-view BN for fused multi-view passes (S3N/NTS): when True, norm
    # layers are GroupedBatchNorm and ``__call__(..., bn_groups=G)`` computes
    # train-mode batch statistics per contiguous batch group. groups=1 is
    # numerically identical to nn.BatchNorm; the param/stats tree matches.
    grouped_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, bn_groups=1):
        # bn_groups: int G (equal contiguous groups) or tuple of group sizes
        # (unequal, e.g. NTS-Net's fused (B, B*M) global+parts pass)
        if self.grouped_bn:
            by_sizes = isinstance(bn_groups, (tuple, list))
            norm = partial(
                GroupedBatchNorm,
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                axis_name=self.bn_cross_replica_axis,
                groups=1 if by_sizes else bn_groups,
                group_sizes=tuple(bn_groups) if by_sizes else None,
            )
        else:
            assert bn_groups == 1, "bn_groups>1 needs grouped_bn=True"
            norm = partial(
                nn.BatchNorm,
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                axis_name=self.bn_cross_replica_axis,
            )
        x = x.astype(self.dtype)
        if self.stem_space_to_depth:
            # same math as the 7x7/2 conv below; same param path/shape
            # ("conv1"/"kernel", (7,7,3,64)) so checkpoints are interchangeable
            x = SpaceToDepthStem(features=64, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        stages = {"stem": x}
        filters = 64
        for i, (num_blocks, stride) in enumerate(zip(self.stage_sizes, self.strides)):
            for j in range(num_blocks):
                blk_stride = stride if j == 0 else 1
                needs_down = j == 0 and (
                    blk_stride != 1
                    or x.shape[-1] != filters * self.block_cls.expansion
                )
                x = self.block_cls(
                    filters=filters,
                    stride=blk_stride,
                    downsample=needs_down,
                    groups=self.groups,
                    base_width=self.width_per_group,
                    norm=norm,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{i + 1}_{j}",
                )(x)
            stages[f"c{i + 2}"] = x
            filters *= 2

        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        stages["pool"] = pooled
        if self.num_classes > 0:
            logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                              param_dtype=self.param_dtype, name="fc")(pooled)
            stages["logits"] = logits
        return stages


_RESNET_DEFS = {
    # name: (block, stage_sizes, groups, width_per_group)
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 64),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 64),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 1, 64),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 1, 64),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8),
    "wide_resnet50_2": (Bottleneck, (3, 4, 6, 3), 1, 128),
    "wide_resnet101_2": (Bottleneck, (3, 4, 23, 3), 1, 128),
}


def _make_resnet_factory(name):
    block, sizes, groups, wpg = _RESNET_DEFS[name]

    def factory(num_classes=0, **kwargs):
        return ResNet(block_cls=block, stage_sizes=sizes, groups=groups,
                      width_per_group=wpg, num_classes=num_classes, **kwargs)

    factory.__name__ = name
    return factory


for _name in _RESNET_DEFS:
    BACKBONE.register(_make_resnet_factory(_name), name=_name)


def feature_dim(name):
    """Channel count of the c5 feature map for a registered resnet."""
    block, _, _, _ = _RESNET_DEFS[name]
    return 512 * block.expansion
