"""API-Net: attentive pairwise interaction.

Reference: ``model/methods/APINet.py`` — in-batch pair mining (nearest
same-class and nearest different-class neighbor by feature distance,
``:76-113``, done in numpy on host), mutual vector → sigmoid gates → four
logit sets; train/val forward modes diverge (``:27-74``).

TPU design: the pair mining is pure device math — a masked argmin over the
pairwise distance matrix (the reference's host round-trip was only needed
because of numpy). Everything stays inside one jitted program.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BACKBONE, MODEL


def mine_pairs(embeddings, labels, valid=None):
    """Nearest same-class and different-class indices per sample.

    Matches ``APINet.get_pairs`` semantics: distances by squared L2; the
    diagonal excluded from the intra search; rows with no candidate fall
    back to index 0 (numpy argmin over all-inf does the same). ``valid``
    ([B] bool) excludes padding rows (duplicated real samples on device-
    multiple padding) from the candidate pool so they never skew mining.
    """
    sq = jnp.sum(embeddings**2, axis=1)
    dist = sq[:, None] + sq[None, :] - 2.0 * (embeddings @ embeddings.T)
    n = embeddings.shape[0]
    eye = jnp.eye(n, dtype=bool)
    same = labels[:, None] == labels[None, :]
    ok = jnp.ones((n,), bool) if valid is None else valid
    inf = jnp.asarray(jnp.inf, dist.dtype)
    intra_idx = jnp.argmin(
        jnp.where(same & ~eye & ok[None, :], dist, inf), axis=1)
    inter_idx = jnp.argmin(jnp.where((~same) & ok[None, :], dist, inf), axis=1)
    return intra_idx, inter_idx


class APINet(nn.Module):
    num_classes: int
    backbone_name: str = "resnet101"
    feature_dim: int = 2048
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")
        self.map1 = nn.Dense(512, dtype=jnp.float32, name="map1")
        self.map2 = nn.Dense(self.feature_dim, dtype=jnp.float32, name="map2")
        self.fc = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, train: bool = False, labels=None, weight=None):
        pool = self.backbone(x, train=train)["pool"]  # [B, 2048] f32
        logits_plain = self.fc(pool)
        out = {"logits": logits_plain}
        if not train or labels is None:
            return out

        valid = None if weight is None else weight > 0
        intra_idx, inter_idx = mine_pairs(
            jax.lax.stop_gradient(pool), labels, valid=valid)
        # anchors repeated for (intra, inter) pairs → 2B pairs
        f1 = jnp.concatenate([pool, pool], axis=0)
        f2 = jnp.concatenate([pool[intra_idx], pool[inter_idx]], axis=0)
        l1 = jnp.concatenate([labels, labels], axis=0)
        l2 = jnp.concatenate([labels[intra_idx], labels[inter_idx]], axis=0)

        mutual = self.map1(jnp.concatenate([f1, f2], axis=1))
        mutual = self.drop(mutual, deterministic=not train)
        mutual = self.map2(mutual)

        gate1 = nn.sigmoid(mutual * f1)
        gate2 = nn.sigmoid(mutual * f2)
        f1_self = gate1 * f1 + f1
        f1_other = gate2 * f1 + f1
        f2_self = gate2 * f2 + f2
        f2_other = gate1 * f2 + f2

        def head(f):
            return self.fc(self.drop(f, deterministic=not train))

        out["self_logits"] = jnp.concatenate([head(f1_self), head(f2_self)], axis=0)
        out["other_logits"] = jnp.concatenate([head(f1_other), head(f2_other)],
                                              axis=0)
        out["pair_labels"] = jnp.concatenate([l1, l2], axis=0)
        if weight is not None:
            # every pair row inherits the ANCHOR's validity: a pair mined
            # for a padding anchor is bogus even though its neighbor is real
            w1 = jnp.concatenate([weight, weight], axis=0)  # [2B] anchors
            out["pair_weight"] = jnp.concatenate([w1, w1], axis=0)  # [4B]
        return out


@MODEL.register(name="APINet")
def build_apinet(config):
    backbone = config.get("backbone", "resnet101")
    try:
        from ..backbones.resnet import feature_dim as _fd

        dim = _fd(backbone)
    except KeyError:
        dim = 2048
    return APINet(
        num_classes=int(config.num_classes),
        backbone_name=backbone,
        feature_dim=dim,
    )
