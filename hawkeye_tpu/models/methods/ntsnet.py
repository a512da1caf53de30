"""NTS-Net: navigator-teacher-scrutinizer network.

Reference: ``model/methods/NTS_Net/`` — a ProposalNet conv pyramid scores a
fixed multi-scale anchor grid over c5 features (``NTSNet.py:63-82``,
``anchors.py:10-60``); per image, greedy NMS keeps the top-M anchors
(``anchors.py:63-96``, on HOST numpy in the reference), the M regions are
cropped from the zero-padded input, resized to 224² and re-run through the
backbone (``NTSNet.py:43-50``, a per-image Python loop in the reference);
the top-K part features concat with the global feature for the final
classifier; NTSLoss ranks proposal scores against part losses.

TPU design (SURVEY §2.6 items 5-6): anchors are STATIC → the NMS IoU
adjacency is a baked constant and suppression is a masked-argmax
``fori_loop`` on device; the M crops are ONE batched multi-box MXU resample
(``ops/resample.crop_resize_multibox``) — no host round trip, no Python
loops, one compiled program.

Fused part pass (``fused_part_pass``, OPT-IN, measured a LOSS at the
recipe shape — TPU A/B at 224²/bs4/M=6, v5e, round 4: sequential
254.6 img/s vs fused 164.6 img/s; phase A's extra B stop-gradient forward
costs more than the fill it buys): the reference runs the backbone twice
per step — global
batch B, then the B·M part crops (``NTSNet.py:43-57``). Since the part
crops are detached (``part_imgs.detach()``) and the proposal scores consume
a detached c5, the only live data dependency is the global FORWARD → crop
boxes. So: phase A runs one stop-gradient global forward just to derive the
boxes, and phase B runs ONE (B + B·M)-batch backbone call over
``[x, parts]`` — same weights, so a straight concat (no vmap). Exactness in
train mode comes from ``GroupedBatchNorm(group_sizes=(B, B·M))``: per-view
batch statistics + the sequential running-average fold, identical to the
reference's two-pass order; dropout draws keep the sequential path's call
order. Parity (logits / BN stats / grads) is pinned by
``tests/test_ntsnet_fused.py``.

Default OFF: the TPU A/B at the recipe shape (224², bs4, M=6) measured
254.6 img/s sequential vs 164.6 fused — the duplicated phase-A forward
(+B images of forward work) and the unequal-group BN reductions cost more
than the (B+B·M)-batch MXU-fill win pays back, unlike S3N's fused warp pass
where the views need no extra forward. Kept as a knob because the balance
shifts with B·M (larger part counts amortize phase A).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nms import anchor_adjacency, nms_fixed_anchors_batch
from ...ops.resample import crop_resize_multibox
from ...registry import BACKBONE, MODEL

# anchor pyramid: (stride, base size, scales, aspect ratios) per level — the
# published NTS-Net configuration (anchors.py:3-7)
ANCHOR_SETTING = (
    dict(stride=32, size=48, scales=[2 ** (1 / 3), 2 ** (2 / 3)],
         aspects=[0.667, 1, 1.5]),
    dict(stride=64, size=96, scales=[2 ** (1 / 3), 2 ** (2 / 3)],
         aspects=[0.667, 1, 1.5]),
    dict(stride=128, size=192, scales=[1, 2 ** (1 / 3), 2 ** (2 / 3)],
         aspects=[0.667, 1, 1.5]),
)


def generate_anchors(input_size: int):
    """Edge anchors [A, 4] (y0, x0, y1, x1), ordered to match ProposalNet's
    channel-major score flattening: per level, per (scale, aspect) pair, then
    row-major over the level's feature map."""
    edges = []
    for info in ANCHOR_SETTING:
        stride = info["stride"]
        fm = int(np.ceil(input_size / stride))
        start = stride / 2.0
        oy = start + stride * np.arange(fm, dtype=np.float32)
        ox = start + stride * np.arange(fm, dtype=np.float32)
        cy, cx = np.meshgrid(oy, ox, indexing="ij")
        for scale in info["scales"]:
            for aspect in info["aspects"]:
                h = info["size"] * scale / np.sqrt(aspect)
                w = info["size"] * scale * np.sqrt(aspect)
                e = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2],
                             axis=-1).reshape(-1, 4)
                edges.append(e.astype(np.float32))
    return np.concatenate(edges, axis=0)


class ProposalNet(nn.Module):
    """Conv pyramid scoring the anchor grid (reference NTSNet.py:63-82)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, dtype=self.dtype)
        d1 = nn.relu(conv(128, (3, 3), padding=[(1, 1), (1, 1)], name="down1")(x))
        d2 = nn.relu(conv(128, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                          name="down2")(d1))
        d3 = nn.relu(conv(128, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                          name="down3")(d2))
        t1 = conv(6, (1, 1), name="tidy1")(d1)
        t2 = conv(6, (1, 1), name="tidy2")(d2)
        t3 = conv(9, (1, 1), name="tidy3")(d3)

        def flat(t):  # NHWC → channel-major (c, h, w) flatten to match anchors
            b = t.shape[0]
            return jnp.transpose(t, (0, 3, 1, 2)).reshape(b, -1)

        return jnp.concatenate([flat(t1), flat(t2), flat(t3)],
                               axis=1).astype(jnp.float32)


class NTSNet(nn.Module):
    num_classes: int = 200
    proposal_num: int = 6  # M
    cat_num: int = 4  # K
    image_size: int = 448
    pad_side: int = 224
    part_size: int = 224
    iou_thresh: float = 0.25
    backbone_name: str = "resnet50"
    dtype: Any = jnp.bfloat16
    fused_part_pass: bool = False

    def setup(self):
        self.backbone = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, grouped_bn=True,
            name="backbone")
        self.fc = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")
        self.proposal_net = ProposalNet(dtype=self.dtype, name="proposal_net")
        self.concat_net = nn.Dense(self.num_classes, dtype=jnp.float32,
                                   name="concat_net")
        self.partcls_net = nn.Dense(self.num_classes, dtype=jnp.float32,
                                    name="partcls_net")
        self.drop = nn.Dropout(0.5)
        # integer padded coords, matching the reference's
        # ``(edge_anchors + 224).astype(np.int)`` (NTSNet.py:27)
        edge = np.trunc(generate_anchors(self.image_size) +
                        self.pad_side).astype(np.float32)
        self._edge_anchors = jnp.asarray(edge)
        self._adjacency = jnp.asarray(anchor_adjacency(edge, self.iou_thresh))

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (@nn.compact so _phase_a_c5 may construct its free functional
        # backbone clone; all parameterized submodules stay setup-defined)
        # the fused restructure needs the global and part views to share one
        # spatial shape; init always takes the sequential path (same
        # submodules, same param tree — GroupedBatchNorm(groups=1) params
        # are identical to BatchNorm's)
        if (self.fused_part_pass and self.image_size == self.part_size
                and not self.is_initializing()):
            return self._fused(x, train)
        return self._sequential(x, train)

    def _propose(self, x, c5):
        """ProposalNet scores → NMS top-M → batched MXU crop. Consumes a
        DETACHED c5 (reference NTSNet.py:37: proposal input detached);
        returns the differentiable score gather (navigator gradient) and the
        detached part crops."""
        rpn_scores = self.proposal_net(jax.lax.stop_gradient(c5))
        top_idx, _ = nms_fixed_anchors_batch(
            jax.lax.stop_gradient(rpn_scores), self._adjacency,
            self.proposal_num)  # [B, M]
        # differentiable gather of the selected scores (navigator gradient)
        top_prob = jnp.take_along_axis(rpn_scores, top_idx, axis=1)

        boxes = self._edge_anchors[top_idx]  # [B, M, 4] (y0, x0, y1, x1)
        byxhw = jnp.stack([
            boxes[..., 0], boxes[..., 1],
            boxes[..., 2] - boxes[..., 0], boxes[..., 3] - boxes[..., 1],
        ], axis=-1)
        pad = self.pad_side
        x_pad = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        # align_corners=True matches the reference part resize
        # (F.interpolate(..., align_corners=True), NTSNet.py:47-48)
        parts = crop_resize_multibox(x_pad, byxhw, self.part_size,
                                     self.part_size,
                                     align_corners=True)  # [B, M, s, s, 3]
        return top_prob, jax.lax.stop_gradient(parts)

    def _heads(self, feature, part_features, raw_logits, top_prob):
        b, m = part_features.shape[:2]
        cat_feat = part_features[:, :self.cat_num].reshape(b, -1)
        concat_logits = self.concat_net(
            jnp.concatenate([cat_feat, feature], axis=1))
        part_logits = self.partcls_net(part_features)  # [B, M, C]
        return {
            "logits": concat_logits,
            "raw_logits": raw_logits,
            "part_logits": part_logits,
            "top_prob": top_prob,
        }

    def _sequential(self, x, train):
        """The reference's two-pass formulation (NTSNet.py:30-57)."""
        stages = self.backbone(x, train=train)
        feature = self.drop(stages["pool"], deterministic=not train)
        raw_logits = self.fc(feature)

        top_prob, parts = self._propose(x, stages["c5"])
        b, m = parts.shape[:2]
        part_stages = self.backbone(
            parts.reshape(b * m, self.part_size, self.part_size, 3),
            train=train)
        part_features = self.drop(part_stages["pool"],
                                  deterministic=not train).reshape(b, m, -1)
        return self._heads(feature, part_features, raw_logits, top_prob)

    def _fused(self, x, train):
        """Phase A: one stop-gradient global forward → crop boxes. Phase B:
        ONE (B + B·M)-batch backbone call with per-view BN statistics
        (group_sizes) — recomputes the global forward bit-for-bit (same
        weights, same input, same per-view stats), so logits, gradients and
        BN statistic updates all match ``_sequential`` exactly."""
        b = x.shape[0]
        c5_a = self._phase_a_c5(x, train)
        top_prob, parts = self._propose(x, c5_a)
        m = parts.shape[1]
        fused_in = jnp.concatenate([
            x, parts.reshape(b * m, self.part_size, self.part_size, 3)], 0)
        stages = self.backbone(fused_in, train=train,
                               bn_groups=(b, b * m) if train else 1)
        pool = stages["pool"]
        # dropout draw order matches _sequential (global first, then parts)
        feature = self.drop(pool[:b], deterministic=not train)
        raw_logits = self.fc(feature)
        part_features = self.drop(pool[b:],
                                  deterministic=not train).reshape(b, m, -1)
        return self._heads(feature, part_features, raw_logits, top_prob)

    @nn.nowrap
    def _phase_a_c5(self, x, train):
        """Detached global forward through c5, for the crop boxes only.

        Runs the backbone functionally on its extracted variables; train-mode
        BN normalization (matching what the sequential global pass computes),
        mutated statistics DISCARDED — phase B recomputes the identical
        forward and owns the statistics update."""
        cols = {"params": jax.lax.stop_gradient(
            self.variables["params"]["backbone"])}
        if "batch_stats" in self.variables:
            cols["batch_stats"] = self.variables["batch_stats"]["backbone"]
        free = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, grouped_bn=True)
        if train:
            stages, _ = free.apply(cols, x, train=True,
                                   mutable=["batch_stats"])
        else:
            stages = free.apply(cols, x, train=False)
        return jax.lax.stop_gradient(stages["c5"])


@MODEL.register(name="NTSNet")
def build_ntsnet(config):
    return NTSNet(
        num_classes=int(config.get("num_classes", 200)),
        proposal_num=int(config.get("proposal_num", 6)),
        cat_num=int(config.get("cat_num", 4)),
        image_size=int(config.get("image_size", 448)),
        backbone_name=config.get("backbone", "resnet50"),
        fused_part_pass=bool(config.get("fused_part_pass", False)),
        # reference fixes both at 224 (NTSNet.py:26, :47); overridable for
        # small-shape tests and the multichip dryrun
        part_size=int(config.get("part_size", 224)),
        pad_side=int(config.get("pad_side", 224)),
    )
