"""VGG backbone family (Flax, NHWC).

Capability match for the reference's torchvision-style VGG A/B/D/E variants
with optional BatchNorm (``model/backbone/vgg.py:25-87``, registrations
``:89-190``): a conv feature trunk, 7x7 average pool, and a 4096-4096-C
classifier. BCNN/CBCNN tap the conv5 feature map (pre-pool) via the returned
stage dict instead of slicing a Sequential.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.conv import conv3x3_same_fast_dgrad
from ...ops.pool import relu_maxpool2x2
from ...registry import BACKBONE

# torchvision cfgs: number = conv out-channels, "M" = 2x2 maxpool.
_VGG_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512,
          "M", 512, 512, 512, 512, "M"],
}


class _Conv3x3Params(nn.Module):
    """Parameter-only twin of ``nn.Conv`` (same child param tree: kernel,
    bias; same initializers) so a functionally-transformed conv — e.g. one
    under ``jax.checkpoint`` — keeps checkpoint/transplant compatibility."""

    features: int
    in_features: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), self.param_dtype)
        return k, b


class VGG(nn.Module):
    """VGG trunk. Returns stages: ``features`` (pre-final-pool conv5 relu map),
    ``pooled_features`` (post final maxpool), ``pool`` (7x7 avg, flattened),
    ``logits`` (if num_classes > 0).

    ``features`` is the input to the last maxpool — i.e. the relu5_3 map that
    BCNN consumes (reference ``model/methods/BCNN.py:36-43`` slices
    ``features[:-1]``).

    TPU memory/perf options (both numerically equivalent to the plain path):

    * ``efficient_pool``: relu+maxpool boundaries use the argmax-index custom
      VJP (``ops/pool.py``) — no select-and-scatter, no full-resolution
      pre-pool residuals.
    * ``remat_first``: the first conv+relu runs under ``jax.checkpoint`` so
      its (widest-in-the-net) output is recomputed in the backward instead of
      stored; without it XLA is forced at large batch to rematerialize the
      much more expensive SECOND conv (measured: 17.8 ms/step at the BCNN
      448²/bs112 recipe).
    """

    cfg: Sequence
    batch_norm: bool = False
    num_classes: int = 0
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_cross_replica_axis: str | None = None
    efficient_pool: bool = True
    remat_first: bool = True
    fast_dgrad: bool = False  # forward-form dgrad for 64->64 convs (ops/conv)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        layer_idx = 0  # mirrors torchvision features.<idx> numbering
        pre_last_pool = None
        n_pools = sum(1 for v in self.cfg if v == "M")
        pool_seen = 0
        pending_prerelu = None  # set when relu is deferred into the pool op
        for ci, v in enumerate(self.cfg):
            if v == "M":
                pool_seen += 1
                if pending_prerelu is not None:
                    if pool_seen == n_pools:
                        pre_last_pool = nn.relu(pending_prerelu)
                    x = relu_maxpool2x2(pending_prerelu)
                    pending_prerelu = None
                else:
                    if pool_seen == n_pools:
                        pre_last_pool = x
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                layer_idx += 1
            elif (self.remat_first and layer_idx == 0
                    and not self.batch_norm):
                # first conv+relu under checkpoint: store x (3ch), not the
                # 64-channel full-resolution output
                k, b = _Conv3x3Params(v, x.shape[-1], self.param_dtype,
                                      name=f"conv{layer_idx}")()
                dt = self.dtype

                def _conv_relu(xx, kk, bb):
                    y = jax.lax.conv_general_dilated(
                        xx.astype(dt), kk.astype(dt), (1, 1),
                        [(1, 1), (1, 1)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return nn.relu(y + bb.astype(dt))

                x = jax.checkpoint(_conv_relu)(x, k, b)
                layer_idx += 2
            elif (self.fast_dgrad and v == 64 and x.shape[-1] == 64
                    and not self.batch_norm):
                # 64->64 conv with the forward-form data gradient: XLA's
                # dgrad path runs ~69 TF/s at this shape vs ~123 for the
                # identical forward conv (see ops/conv.py)
                k, b = _Conv3x3Params(v, 64, self.param_dtype,
                                      name=f"conv{layer_idx}")()
                x = conv3x3_same_fast_dgrad(
                    x.astype(self.dtype), k.astype(self.dtype)
                ) + b.astype(self.dtype)
                layer_idx += 1
                if (self.efficient_pool and ci + 1 < len(self.cfg)
                        and self.cfg[ci + 1] == "M"):
                    pending_prerelu = x
                else:
                    x = nn.relu(x)
                layer_idx += 1
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"conv{layer_idx}")(x)
                layer_idx += 1
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     axis_name=self.bn_cross_replica_axis,
                                     name=f"bn{layer_idx}")(x)
                    layer_idx += 1
                if (self.efficient_pool and ci + 1 < len(self.cfg)
                        and self.cfg[ci + 1] == "M"):
                    pending_prerelu = x
                else:
                    x = nn.relu(x)
                layer_idx += 1

        stages = {"features": pre_last_pool, "pooled_features": x}

        if self.num_classes > 0:
            # torchvision: AdaptiveAvgPool2d((7,7)) then 3-layer classifier.
            b, h, w, c = x.shape
            if (h, w) != (7, 7):
                # adaptive average pool to 7x7 via mean over equal windows
                assert h % 7 == 0 and w % 7 == 0, (
                    f"VGG head expects spatial dims divisible by 7, got {h}x{w}"
                )
                x = x.reshape(b, 7, h // 7, 7, w // 7, c).mean(axis=(2, 4))
            x = x.reshape(b, -1).astype(jnp.float32)
            stages["pool"] = x
            x = nn.Dense(4096, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="fc0")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = nn.Dense(4096, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="fc3")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            stages["logits"] = nn.Dense(self.num_classes, dtype=jnp.float32,
                                        param_dtype=self.param_dtype, name="fc6")(x)
        else:
            stages["pool"] = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return stages


_VGG_DEFS = {
    "vgg11": ("A", False), "vgg11_bn": ("A", True),
    "vgg13": ("B", False), "vgg13_bn": ("B", True),
    "vgg16": ("D", False), "vgg16_bn": ("D", True),
    "vgg19": ("E", False), "vgg19_bn": ("E", True),
}


def _make_vgg_factory(name):
    cfg_key, bn = _VGG_DEFS[name]

    def factory(num_classes=0, **kwargs):
        return VGG(cfg=_VGG_CFGS[cfg_key], batch_norm=bn, num_classes=num_classes,
                   **kwargs)

    factory.__name__ = name
    return factory


for _name in _VGG_DEFS:
    BACKBONE.register(_make_vgg_factory(_name), name=_name)
