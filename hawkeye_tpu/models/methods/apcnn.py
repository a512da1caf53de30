"""AP-CNN: attention pyramid CNN with ROI-guided refinement.

Reference: ``model/methods/APCNN.py`` — ResNet-50 + top-down FPN
(``:202-233``) + bottom-up spatial/channel attention pyramid (``:236-295``);
per-level single-size anchor grids scored by the spatial attention
(``:306-341``), greedy NMS keeps top-k ROIs per level (``get_att_roi``,
``:444-476``, host loop + pth_nms in the reference); stage II crops the
UNION of all ROIs out of the stride-8 feature map (with a random
ROI dropblock during training, ``get_roi_crop_feat``, ``:478-531``),
re-runs layers 3-4 + FPN + attention + the same heads, and averages 8
logit sets. Training: sum of CE over the heads, manual per-epoch cosine
(``Examples/APCNN.py:49,69-91``).

TPU design: anchors per level are static → NMS is the baked-adjacency
masked-argmax kernel; the union-box crop + resize of the feature map is the
batched MXU resample; the dropblock is a rectangle mask built from iota
comparisons with jax.random — the whole two-stage forward is one jitted
program.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nms import anchor_adjacency, nms_fixed_anchors_batch
from ...ops.resample import crop_resize_bilinear
from ...registry import MODEL
from ..backbones.resnet import Bottleneck


def level_anchors(size, fm_h, fm_w, stride):
    """Single-size square anchors centered at feature positions (y-major
    order to match the attention flatten), boxes (y0, x0, y1, x1) in image
    coords (reference generate_anchors_single_pyramid with ratio 1)."""
    ys = np.arange(fm_h, dtype=np.float32) * stride
    xs = np.arange(fm_w, dtype=np.float32) * stride
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    h = w = float(size)
    boxes = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2],
                     axis=-1).reshape(-1, 4)
    return boxes


class BasicConv(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train):
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ClsHead(nn.Module):
    """BN → Dense(hidden) → BN → ELU → Dense(classes) on pooled features."""

    hidden: int
    num_classes: int

    @nn.compact
    def __call__(self, pooled, train):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(pooled.astype(jnp.float32))
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(x)
        x = nn.elu(x)
        return nn.Dense(self.num_classes, name="fc2")(x)


class APCNN(nn.Module):
    num_classes: int
    image_size: int = 448
    stage_sizes: tuple = (3, 4, 6, 3)
    fpn_dim: int = 256
    dtype: Any = jnp.bfloat16

    def setup(self):
        norm = partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5,
                       dtype=self.dtype)
        self._norm = norm
        # trunk blocks, explicit so stage II can re-run layers 3-4
        self.conv1 = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                             use_bias=False, dtype=self.dtype, name="conv1")
        self.bn1 = norm(name="bn1")
        layers = []
        filters = 64
        in_ch = 64
        for i, n_blocks in enumerate(self.stage_sizes):
            stride = 1 if i == 0 else 2
            blocks = []
            for j in range(n_blocks):
                blk_stride = stride if j == 0 else 1
                needs_down = j == 0 and (blk_stride != 1 or in_ch != filters * 4)
                blocks.append(_DeferredBottleneck(
                    filters=filters, stride=blk_stride, downsample=needs_down,
                    dtype=self.dtype, name=f"layer{i + 1}_{j}"))
                in_ch = filters * 4
            layers.append(blocks)
            filters *= 2
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

        d = self.fpn_dim
        self.p5_master = BasicConv(d, self.dtype, name="p5_master")
        self.p5_gpb = BasicConv(d, self.dtype, name="p5_gpb")
        self.p5_2 = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="p5_2")
        self.p4_1 = nn.Conv(d, (1, 1), dtype=self.dtype, name="p4_1")
        self.p4_2 = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="p4_2")
        self.p3_1 = nn.Conv(d, (1, 1), dtype=self.dtype, name="p3_1")
        self.p3_2 = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="p3_2")

        self.spatial_gates = [
            nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=jnp.float32,
                    name=f"a{i}_spatial") for i in (3, 4, 5)]
        self.channel_fc1 = [
            nn.Conv(d // 16, (1, 1), dtype=jnp.float32, name=f"a{i}_ch1")
            for i in (3, 4, 5)]
        self.channel_fc2 = [
            nn.Conv(d, (1, 1), dtype=jnp.float32, name=f"a{i}_ch2")
            for i in (3, 4, 5)]

        hidden = 512 if self.num_classes == 200 else 256
        self.cls3 = ClsHead(hidden, self.num_classes, name="cls3")
        self.cls4 = ClsHead(hidden, self.num_classes, name="cls4")
        self.cls5 = ClsHead(hidden, self.num_classes, name="cls5")
        self.cls_concate = ClsHead(hidden, self.num_classes, name="cls_concate")

        # static anchor grids + NMS adjacency per level
        s = self.image_size
        specs = [(8, 64, 5), (16, 128, 3), (32, 256, 1)]  # (stride, size, topk)
        self._roi_topk = tuple(t for _, _, t in specs)
        anchors, adjacency = [], []
        for stride, size, _ in specs:
            fm = s // stride
            boxes = level_anchors(size, fm, fm, stride)
            clipped = boxes.copy()
            clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, s - 1)
            clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, s - 1)
            anchors.append(jnp.asarray(clipped))
            adjacency.append(jnp.asarray(anchor_adjacency(boxes, 0.05)))
        self._anchors = tuple(anchors)
        self._adjacency = tuple(adjacency)

    def _run(self, blocks, x, train):
        for b in blocks:
            x = b(x, train)
        return x

    def _fpn(self, c3, c4, c5, train):
        gpb = self.p5_gpb(c5.mean(axis=(1, 2), keepdims=True), train)
        p5 = self.p5_master(c5, train) + gpb
        p5_up = jnp.repeat(jnp.repeat(p5, 2, axis=1), 2, axis=2)
        p5_out = self.p5_2(p5)
        p4 = self.p4_1(c4) + p5_up
        p4_up = jnp.repeat(jnp.repeat(p4, 2, axis=1), 2, axis=2)
        p4_out = self.p4_2(p4)
        p3 = self.p3_1(c3) + p4_up
        p3_out = self.p3_2(p3)
        return p3_out, p4_out, p5_out

    def _apn(self, feats):
        """Attention pyramid: returns attended features + spatial masks."""
        outs, spatials = [], []
        prev_channel = None
        for i, f in enumerate(feats):
            f32 = f.astype(jnp.float32)
            spatial = nn.sigmoid(self.spatial_gates[i](f32))  # [B,h,w,1]
            ch = f32.mean(axis=(1, 2), keepdims=True)
            ch = nn.relu(self.channel_fc1[i](ch))
            channel = nn.sigmoid(self.channel_fc2[i](ch))  # [B,1,1,C]
            if prev_channel is not None:
                channel = (channel + prev_channel) / 2.0
            prev_channel = channel
            outs.append(spatial * f32 + channel * f32)
            spatials.append(spatial)
        return outs, spatials

    def _rois(self, spatial, level, border_frac):
        """Attention mask [B,h,w,1] → top-k ROI boxes [B,k,4] (image px)."""
        b, h, w, _ = spatial.shape
        att = jax.lax.stop_gradient(spatial[..., 0])
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]
        inner = ((yy >= int(border_frac * h)) & (yy < int((1 - border_frac) * h))
                 & (xx >= int(border_frac * w)) & (xx < int((1 - border_frac) * w)))
        att = att * inner.astype(att.dtype)
        scores = att.reshape(b, h * w)
        # reference keeps only above-mean anchors before NMS
        above = scores > scores.mean(axis=1, keepdims=True)
        scores = jnp.where(above, scores, -jnp.inf)
        idx, _ = nms_fixed_anchors_batch(scores, self._adjacency[level],
                                         self._roi_topk[level])
        return self._anchors[level][idx]  # [B, k, 4]

    def _roi_crop(self, c3, rois, train):
        """Union-box crop (+train dropblock) of the stride-8 feature map,
        resized back to its own size (reference get_roi_crop_feat)."""
        b, h, w, c = c3.shape
        scale = self.image_size / h  # 8
        boxes = jnp.concatenate(rois, axis=1) / scale  # [B, 9, 4] feat coords
        # the reference truncates to ints when slicing (.long(),
        # get_roi_crop_feat APCNN.py:487-527)
        y0 = jnp.floor(boxes[..., 0].min(axis=1))
        x0 = jnp.floor(boxes[..., 1].min(axis=1))
        y1 = jnp.floor(boxes[..., 2].max(axis=1))
        x1 = jnp.floor(boxes[..., 3].max(axis=1))

        x_in = c3
        if train:
            rng = self.make_rng("dropout")
            k1, k2, k3 = jax.random.split(rng, 3)
            pro = jax.random.uniform(k1, (b,))
            # candidate drop boxes: one random roi3, one random roi4
            i3 = jax.random.randint(k2, (b,), 0, rois[0].shape[1])
            i4 = jax.random.randint(k3, (b,), 0, rois[1].shape[1])
            cand3 = jnp.take_along_axis(rois[0], i3[:, None, None].repeat(4, 2),
                                        1)[:, 0] / scale
            cand4 = jnp.take_along_axis(rois[1], i4[:, None, None].repeat(4, 2),
                                        1)[:, 0] / scale
            use3 = (pro < 0.3)[:, None]
            use4 = ((pro >= 0.3) & (pro < 0.6))[:, None]
            drop = jnp.where(use3, cand3, cand4)
            active = (use3 | use4)[:, 0]
            yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
            xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
            inside = ((yy >= drop[:, 0, None, None]) & (yy < drop[:, 2, None, None])
                      & (xx >= drop[:, 1, None, None]) & (xx < drop[:, 3, None, None]))
            mask = 1.0 - (inside & active[:, None, None]).astype(c3.dtype)
            x_in = c3 * mask[..., None]
            # renormalize by kept fraction inside the union crop
            uy = (yy >= y0[:, None, None]) & (yy < y1[:, None, None])
            ux = (xx >= x0[:, None, None]) & (xx < x1[:, None, None])
            union = (uy & ux).astype(jnp.float32)
            kept = (mask.astype(jnp.float32) * union).sum(axis=(1, 2))
            total = union.sum(axis=(1, 2))
            x_in = x_in * (total / jnp.maximum(kept, 1.0))[:, None, None, None]

        union_boxes = jnp.stack([y0, x0, y1 - y0, x1 - x0], axis=1)
        return crop_resize_bilinear(x_in, union_boxes, h, w)

    def _heads(self, f3, f4, f5, a3, a4, a5, train):
        att3, att4, att5 = a3, a4, a5
        out3 = self.cls3(att3.mean(axis=(1, 2)), train)
        out4 = self.cls4(att4.mean(axis=(1, 2)), train)
        out5 = self.cls5(att5.mean(axis=(1, 2)), train)
        concat = jnp.concatenate([
            f3.astype(jnp.float32).mean(axis=(1, 2)),
            f4.astype(jnp.float32).mean(axis=(1, 2)),
            f5.astype(jnp.float32).mean(axis=(1, 2))], axis=1)
        out_cat = self.cls_concate(concat, train)
        return out3, out4, out5, out_cat

    def __call__(self, x, train: bool = False):
        x = self.conv1(x.astype(self.dtype))
        x = nn.relu(self.bn1(x, use_running_average=not train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        c2 = self._run(self.layer1, x, train)
        c3 = self._run(self.layer2, c2, train)
        c4 = self._run(self.layer3, c3, train)
        c5 = self._run(self.layer4, c4, train)

        f3, f4, f5 = self._fpn(c3, c4, c5, train)
        (t3, t4, t5), (a3, a4, a5) = self._apn([f3, f4, f5])
        out3, out4, out5, out_cat = self._heads(f3, f4, f5, t3, t4, t5, train)

        border = 0.2 if self.num_classes == 200 else 0.1
        rois = [self._rois(a, lvl, border)
                for lvl, a in enumerate([a3, a4, a5])]

        c3_crop = self._roi_crop(c3, rois, train)
        c4_crop = self._run(self.layer3, c3_crop, train)
        c5_crop = self._run(self.layer4, c4_crop, train)
        g3, g4, g5 = self._fpn(c3_crop, c4_crop, c5_crop, train)
        (u3, u4, u5), _ = self._apn([g3, g4, g5])
        out3c, out4c, out5c, out_catc = self._heads(g3, g4, g5, u3, u4, u5,
                                                    train)

        all_logits = jnp.stack([out3, out4, out5, out_cat,
                                out3c, out4c, out5c, out_catc])
        return {
            "logits": all_logits.mean(axis=0),
            "all_logits": all_logits,
            "rois": jnp.concatenate(rois, axis=1),
        }


class _DeferredBottleneck(nn.Module):
    """Bottleneck taking ``train`` at call time (shared across both stages)."""

    filters: int
    stride: int
    downsample: bool
    dtype: Any

    @nn.compact
    def __call__(self, x, train):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        return Bottleneck(filters=self.filters, stride=self.stride,
                          downsample=self.downsample, norm=norm,
                          dtype=self.dtype, name="block")(x)


@MODEL.register(name="APCNN")
def build_apcnn(config):
    return APCNN(
        num_classes=int(config.num_classes),
        image_size=int(config.get("image_size", 448)),
    )
