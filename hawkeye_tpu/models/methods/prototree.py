"""ProtoTree: neural prototype tree, tensorized.

Reference: ``model/methods/ProtoTree/`` — a soft complete binary tree
(height 9 → 511 branches / 512 leaves) whose decision probabilities are
prototype similarities: an L2Conv computes per-position distances between
1×1×D prototypes and the sigmoid-necked backbone features
(``l2conv.py:24-64``), global min-pool → similarity ``exp(−d)``; the
reference walks a RECURSIVE object graph of Branch/Leaf nodes
(``branch.py:22-80``, ``leaf.py:31-58``, ``prototree.py:97-202``) carrying
path probabilities in a dict. Leaves hold non-gradient class distributions
updated by a closed-form running-average rule every step
(``Examples/ProtoTreeNet.py:115-131``).

TPU redesign (SURVEY §7 step 8): the tree is three arrays — branch
similarities [B, 511], leaf path probabilities computed by log-free
level-wise doubling (h static steps of interleave-multiply), and leaf
distributions softmax([512, C]) stored in a NON-gradient 'tree_leaves'
variable collection. The forward is pure matmuls/elementwise; the recursive
walk is gone. Heap indexing: branch i's children are 2i+1, 2i+2 (0-based);
leaves are the last 2^h slots in level order.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BACKBONE, MODEL


def l2_distances(features, prototypes):
    """features: [B, H, W, D]; prototypes: [P, D] (the W1=H1=1 case the
    reference supports, configs/ProtoTreeNet.yaml) → [B, P] min distances."""
    b, h, w, d = features.shape
    x = features.reshape(b, h * w, d).astype(jnp.float32)
    x_sq = (x**2).sum(-1)[:, :, None]  # [B, HW, 1]
    p_sq = (prototypes**2).sum(-1)[None, None, :]  # [1, 1, P]
    xp = jnp.einsum("bnd,pd->bnp", x, prototypes,
                    preferred_element_type=jnp.float32)
    d2 = x_sq + p_sq - 2.0 * xp
    dist = jnp.sqrt(jnp.abs(d2) + 1e-14)  # [B, HW, P]
    return dist.min(axis=1)  # [B, P]


def leaf_path_probs(ps, height):
    """ps: [B, 2^h - 1] right-branch probabilities in level order →
    [B, 2^h] leaf path probabilities (level-wise doubling)."""
    b = ps.shape[0]
    pa = jnp.ones((b, 1), ps.dtype)
    offset = 0
    for level in range(height):
        n = 2**level
        p_right = ps[:, offset:offset + n]  # this level's branches
        left = pa * (1.0 - p_right)
        right = pa * p_right
        pa = jnp.stack([left, right], axis=-1).reshape(b, 2 * n)
        offset += n
    return pa  # [B, 2^height]


def all_node_path_probs(ps, height):
    """Path probability of arriving at every BRANCH node [B, 2^h - 1]
    (needed only for analysis; leaves come from ``leaf_path_probs``)."""
    b = ps.shape[0]
    pas = [jnp.ones((b, 1), ps.dtype)]
    offset = 0
    for level in range(height - 1):
        n = 2**level
        p_right = ps[:, offset:offset + n]
        pa = pas[-1] if level == 0 else pas[-1]
        left = pas[-1] * (1.0 - p_right)
        right = pas[-1] * p_right
        pas.append(jnp.stack([left, right], -1).reshape(b, 2 * n))
        offset += n
    return jnp.concatenate(pas, axis=1)


class ProtoTreeNet(nn.Module):
    num_classes: int
    height: int = 9
    num_features: int = 256
    backbone_name: str = "resnet50"
    dtype: Any = jnp.bfloat16
    # inference strategy when the caller doesn't pass `sampling` explicitly:
    # 'distributed' (soft path mixture), 'sample_max' (argmax-path leaf) or
    # 'greedy' (root-to-leaf argmax walk) — reference ProtoTree
    # --sampling_strategy (prototree.py:21,148-199); exposed as `model.sampling`
    eval_sampling: str = "distributed"

    @property
    def num_branches(self):
        return 2**self.height - 1

    @property
    def num_leaves(self):
        return 2**self.height

    @nn.compact
    def __call__(self, x, train: bool = False, sampling: str | None = None):
        if sampling is None:
            # training always uses the distributed mixture (the leaf update
            # needs pa_leaf-weighted targets); eval follows the config
            sampling = "distributed" if train else self.eval_sampling
        stages = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")(x, train=train)
        feats = nn.Conv(self.num_features, (1, 1), use_bias=False,
                        kernel_init=nn.initializers.xavier_normal(),
                        name="neck_conv")(stages["c5"].astype(jnp.float32))
        feats = nn.sigmoid(feats)

        prototypes = self.param(
            "prototypes",
            lambda key: 0.5 + 0.1 * jax.random.normal(
                key, (self.num_branches, self.num_features)))
        min_dist = l2_distances(feats, prototypes)  # [B, P]
        similarities = jnp.exp(-min_dist)  # decision probs in (0, 1]

        pa_leaf = leaf_path_probs(similarities, self.height)  # [B, L]

        # non-gradient leaf distributions (derivative-free update)
        leaf_params = self.variable(
            "tree_leaves", "dist_params",
            lambda: jnp.zeros((self.num_leaves, self.num_classes), jnp.float32))
        dist = jax.nn.softmax(
            leaf_params.value - leaf_params.value.max(axis=-1, keepdims=True),
            axis=-1)  # [L, C]

        pred = pa_leaf @ dist  # [B, C] proper probabilities
        if sampling == "sample_max":
            best = jnp.argmax(pa_leaf, axis=1)
            pred = dist[best]
        elif sampling == "greedy":
            # root-to-leaf greedy walk (reference prototree.py:173-199): at
            # each branch take the right child iff p_right > 0.5. The heap is
            # level-order, so child indices are 2i+1 / 2i+2 and the walked-to
            # leaf slot is node − (2^h − 1).
            node = jnp.zeros((pa_leaf.shape[0],), jnp.int32)
            for _ in range(self.height):
                p_right = jnp.take_along_axis(
                    similarities, node[:, None], axis=1)[:, 0]
                node = 2 * node + 1 + (p_right > 0.5).astype(jnp.int32)
            pred = dist[node - self.num_branches]
        elif sampling != "distributed":
            raise ValueError(f"unknown sampling strategy: {sampling!r}")

        log_pred = jnp.log(jnp.maximum(pred, 1e-12))
        return {
            "logits": log_pred,  # log-probabilities (argmax-compatible)
            "pred": pred,
            "pa_leaf": pa_leaf,
            "leaf_dist": dist,
        }


@MODEL.register(name="ProtoTreeNet")
def build_prototree(config):
    return ProtoTreeNet(
        num_classes=int(config.num_classes),
        height=int(config.get("height", 9)),
        num_features=int(config.get("num_features", 256)),
        backbone_name=(config.get("backbone", {}) or {}).get("name", "resnet50")
        if hasattr(config.get("backbone", None) or {}, "get") else "resnet50",
        dtype=(jnp.float32
               if str(config.get("dtype", "bfloat16")) in ("float32", "f32")
               else jnp.bfloat16),
        eval_sampling=str(config.get("sampling", "distributed")),
    )


# ----------------------------------------------------------------------
# self-contained tree export / import
# ----------------------------------------------------------------------
def save_tree(directory_path, model, variables):
    """Reference ``ProtoTree.save/save_state`` (``prototree.py:248-265``)
    pickles the whole tree module to a directory. The functional analogue is
    a self-contained directory holding the constructor config (JSON) plus
    every variable collection (params AND the non-gradient 'tree_leaves'
    distributions) so ``load_tree`` can rebuild the model without the
    original YAML config."""
    import json
    import os

    from flax import serialization

    os.makedirs(directory_path, exist_ok=True)
    meta = {
        "num_classes": model.num_classes,
        "height": model.height,
        "num_features": model.num_features,
        "backbone_name": model.backbone_name,
        "dtype": "float32" if model.dtype == jnp.float32 else "bfloat16",
        "eval_sampling": model.eval_sampling,
    }
    with open(os.path.join(directory_path, "tree.json"), "w") as f:
        json.dump(meta, f, indent=1)
    host = jax.tree_util.tree_map(lambda x: jax.device_get(x), variables)
    with open(os.path.join(directory_path, "tree.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(host))


def load_tree(directory_path):
    """Rebuild ``(model, variables)`` from a ``save_tree`` directory
    (reference ``ProtoTree.load``, ``prototree.py:267-269``)."""
    import json
    import os

    from flax import serialization

    with open(os.path.join(directory_path, "tree.json")) as f:
        meta = json.load(f)
    model = ProtoTreeNet(
        num_classes=int(meta["num_classes"]),
        height=int(meta["height"]),
        num_features=int(meta["num_features"]),
        backbone_name=meta["backbone_name"],
        dtype=jnp.float32 if meta["dtype"] == "float32" else jnp.bfloat16,
        eval_sampling=meta["eval_sampling"],
    )
    with open(os.path.join(directory_path, "tree.msgpack"), "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    return model, variables
