"""CIN: channel interaction network.

Reference: ``model/methods/CIN.py`` — SCI module: self-channel bilinear
``softmax(−XXᵀ/HW)`` reweighting + 3×3 conv + residual; train-time CCI
module pairs each sample with its batch-half partner via learned scalar
gates and contrasts the interacted features (``:10-60``); avg-pooled linear
classifier. Trained with BalancedBatchSampler(4×5) and CINLoss.

TPU notes: the channel bilinear is a batched C×C matmul (MXU); the CCI
"swap halves" pairing is a static roll of the batch. The loss-side
projection ``h`` (reference keeps it inside the criterion) lives here as
``pair_head`` — see losses/cin.py for why.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BACKBONE, MODEL


class CIN(nn.Module):
    num_classes: int
    backbone_name: str = "resnet50"
    r_channel: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")(
                x, train=train)["c5"]  # [B, H, W, C]
        b, h, w, c = feats.shape
        conv = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv")
        gate_fc = nn.Dense(1, dtype=jnp.float32, name="gate_fc")
        classifier = nn.Dense(self.num_classes, dtype=jnp.float32,
                              use_bias=True, name="classifier")
        pair_head = nn.Dense(self.r_channel, dtype=jnp.float32,
                             name="pair_head")
        xf = feats.reshape(b, h * w, c).astype(jnp.float32)  # positions × C

        # SCI: W = softmax(-X Xᵀ / HW) over channels, Y = W X
        bilinear = jax.lax.dot_general(
            xf, xf, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / float(h * w)  # [B, C, C]
        w_sci = jax.nn.softmax(-bilinear, axis=2)
        y = jnp.einsum("bcd,bpd->bpc", w_sci, xf,
                       preferred_element_type=jnp.float32)  # [B, HW, C]
        y = conv(y.reshape(b, h, w, c)).astype(jnp.float32)
        z = y.reshape(b, h * w, c) + xf

        logits = classifier(z.mean(axis=1))
        out = {"logits": logits}
        if not train:
            return out

        # CCI: pair sample i with its batch-half partner (roll by B/2)
        yb = y.reshape(b, -1)
        partner = jnp.roll(jnp.arange(b), -(b // 2))
        y_a = jnp.concatenate([yb, yb[partner]], axis=1)
        # per-sample scalar gate η_ab from the (self, partner) concatenation;
        # equals the reference's cat(eta, gamma) construction exactly
        # (CIN.py:44-52; pinned by tests/test_reference_parity.py)
        weight = gate_fc(y_a)  # [B, 1]
        w_sci_partner = w_sci[partner]
        w_cci = jnp.abs(w_sci - weight[:, :, None] * w_sci_partner)
        y_cci = jnp.einsum("bcd,bpd->bpc", w_cci, xf,
                           preferred_element_type=jnp.float32)
        y_cci = conv(y_cci.reshape(b, h, w, c)).astype(jnp.float32)
        z_cci = y_cci.reshape(b, h * w, c) + xf
        out["pair_embed"] = pair_head(z_cci.reshape(b, -1))
        return out


@MODEL.register(name="CIN")
def build_cin(config):
    return CIN(
        num_classes=int(config.num_classes),
        backbone_name=config.get("backbone", "resnet50"),
        r_channel=int(config.get("r_channel", 512)),
    )
