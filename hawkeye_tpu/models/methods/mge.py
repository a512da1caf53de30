"""MGE-CNN: mixture of granularity-specific experts.

Reference: ``model/methods/MGE_CNN/`` — three expert branches (full image →
GradCAM-guided bbox crop → nested crop), each a full ResNet-50 copy with a
conv6 part head and cat classifiers; a gating branch softmax-mixes the three
cat logits; 10 logit sets total, trained with summed CE
(``Examples/MGE_CNN.py:37-56``).

TPU redesign of the GradCAM-in-forward (``grad_cam.py:51-91``): the
reference's hook-based ``one_hot.backward(retain_graph=True)`` computes the
gradient of the target-class score w.r.t. the LAST conv5 block's output —
but that layer feeds straight into avg-pool + linear, so the gradient is
analytically ``W[y, c] / HW``: the per-sample CAM weights are simply the
relu'd classifier rows. No inner backward pass exists in this build; the
crop box comes from a thresholded CAM via static min/max index arithmetic
(``get_bbox``, ``MGE.py:48-72``, which the reference loops per image), and
the crop itself is the batched MXU resample.

Fused-expert dispatch (``fused_experts``, measured and default OFF): the
reference runs FOUR sequential ResNet passes per step (3 experts + gate,
``MGE.py:126-213``), each at the tiny recipe batch (bs4 @ 224²) — a few
percent MXU fill. The expert chain is data-dependent (expert ``i``'s CAM
crop feeds expert ``i+1``), so the passes can't be naively batched. The
exact restructure built here:

  phase A (stop-gradient): two narrow FORWARD-only passes — expert 0 on the
    image and expert 1 on its crop — just to derive the two CAM crop views.
    Everything consumed from phase A is detached in the reference too
    (``conv5.detach()`` in ``get_bbox``, ``input_box.detach()``).
  phase B (differentiable): ONE ``nn.vmap``-stacked pass of all four
    backbones (per-expert weights, leading axis 4) over the stacked views
    ``[x, crop1, crop2, x]`` — a single 4×-wide fwd+bwd dispatch. Phase B
    recomputes experts 0/1 forward bit-for-bit (same weights, same inputs,
    per-slice BatchNorm statistics via ``variable_axes``), so logits,
    gradients, and BN stats all match the sequential formulation exactly;
    parity is pinned by ``tests/test_mge_fused.py``.

TPU A/B at the recipe shape (bs4 @ 224², steps_per_dispatch=8, v5e):
sequential 205.5 img/s vs fused 163.7 img/s — the fused pass LOSES ~20%.
The vmap-over-weights convolutions lower to ``batch_group_count=4`` grouped
convs, which XLA:TPU executes barely (~8%/FLOP) more efficiently than four
narrow sequential convs, not enough to pay for phase A's two duplicated
forwards. Kept as an opt-in (``model.fused_experts: true``) with full parity
coverage; the sequential path is the default and the perf row of record.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import crop_resize_bilinear, resize_bilinear
from ...registry import BACKBONE, MODEL


def l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def cam_bbox(images, conv5, weights, rate, img_size):
    """Threshold the CAM and crop the enclosing box, batched & static-shape.

    images: [B, S, S, 3]; conv5: [B, h, w, C]; weights: [B, C] (relu'd
    classifier rows). Returns cropped+resized images [B, S, S, 3].
    """
    cam = jnp.einsum("bhwc,bc->bhw", jax.lax.stop_gradient(conv5), weights)
    # align_corners=True: reference get_bbox interpolation (MGE.py:54)
    cam = resize_bilinear(cam[..., None], img_size, img_size,
                          align_corners=True)[..., 0]
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    cam = (cam - lo) / jnp.maximum(hi - lo, 1e-8)
    mask = cam > rate  # [B, S, S]; max position is always 1.0 > rate

    rows = mask.any(axis=2)  # [B, S]
    cols = mask.any(axis=1)
    idx = jnp.arange(img_size, dtype=jnp.float32)

    def lohi(active):
        big = jnp.asarray(img_size, jnp.float32)
        lo = jnp.min(jnp.where(active, idx, big), axis=1)
        hi = jnp.max(jnp.where(active, idx, -1.0), axis=1)
        return lo, hi

    y1, y2 = lohi(rows)
    x1, x2 = lohi(cols)
    # degenerate (empty/single-pixel) boxes fall back to the full image
    bad = (y2 <= y1) | (x2 <= x1)
    y1 = jnp.where(bad, 0.0, y1)
    x1 = jnp.where(bad, 0.0, x1)
    y2 = jnp.where(bad, float(img_size), y2)
    x2 = jnp.where(bad, float(img_size), x2)
    boxes = jnp.stack([y1, x1, y2 - y1, x2 - x1], axis=1)
    crops = crop_resize_bilinear(images, boxes, img_size, img_size,
                                 align_corners=True)  # MGE.py:69-70
    return jax.lax.stop_gradient(crops)


class _ExpertHead(nn.Module):
    """Classifier + conv6 part head + cat classifier for one expert.

    The reference's conv6 is a 1x1 conv with PADDING 1 (MGE.py:106-108): the
    padded ring contributes relu(bias) to the max pool — replicate by
    zero-padding the input ring.
    """

    num_classes: int

    @nn.compact
    def __call__(self, pool, c4):
        logits = nn.Dense(self.num_classes, name="classifier")(pool)
        c4 = jnp.pad(jax.lax.stop_gradient(c4).astype(jnp.float32),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        part = nn.Conv(10 * self.num_classes, (1, 1), name="conv6")(c4)
        pool_part = nn.relu(part).max(axis=(1, 2))  # [B, 10C]
        logits_max = nn.Dense(self.num_classes, name="cls_part")(pool_part)
        cat = jnp.concatenate([
            10 * l2n(jax.lax.stop_gradient(pool)),
            10 * l2n(jax.lax.stop_gradient(pool_part))], axis=1)
        logits_cat = nn.Dense(self.num_classes, name="cls_cat")(cat)
        return logits, logits_max, logits_cat


class _Expert(nn.Module):
    """Sequential-mode expert: backbone + heads in one submodule.

    Returns (logits, logits_max, logits_cat, c5)."""

    num_classes: int
    backbone_name: str
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train):
        stages = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")(x, train=train)
        logits, logits_max, logits_cat = _ExpertHead(
            self.num_classes, name="head")(stages["pool"], stages["c4"])
        return logits, logits_max, logits_cat, stages["c5"]


class _BackboneSlice(nn.Module):
    """One stackable backbone; ``nn.vmap`` maps it over the expert axis."""

    backbone_name: str
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train):
        return BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="backbone")(x, train=train)


def _stacked_backbones(axis_size):
    """nn.vmap'd backbone stack: per-slice params AND per-slice BatchNorm
    batch statistics (``variable_axes`` leading axis), so slice ``i`` is
    numerically identical to a standalone backbone call."""
    return nn.vmap(
        _BackboneSlice,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        in_axes=(0, None),
        out_axes=0,
        axis_size=axis_size,
    )


def _stacked_heads(axis_size):
    return nn.vmap(
        _ExpertHead,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=(0, 0),
        out_axes=0,
        axis_size=axis_size,
    )


class MGECNN(nn.Module):
    num_classes: int
    image_size: int = 448
    box_thred: float = 0.2
    backbone_name: str = "resnet50"
    dtype: Any = jnp.bfloat16
    fused_experts: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, labels=None):
        if self.fused_experts:
            return self._fused(x, train, labels)
        return self._sequential(x, train, labels)

    # ------------------------------------------------------------------
    # fused path: phase A (2 narrow stop-grad forwards) + phase B (one
    # 4-wide vmapped fwd+bwd). See module docstring for the exactness
    # argument.
    # ------------------------------------------------------------------
    def _fused(self, x, train, labels):
        E = 4  # experts 0..2 + gate backbone
        stack = _stacked_backbones(E)(self.backbone_name, self.dtype,
                                      name="backbones")
        heads = _stacked_heads(3)(self.num_classes, name="heads")

        if self.is_initializing():
            views = jnp.stack([x] * E)  # shapes only; crops come later
        else:
            views = jnp.stack(self._phase_a_views(x, train, labels))

        feats = stack(views, train)  # stage dict, each [E, B, ...]
        logits_s, logits_max_s, logits_cat_s = heads(
            feats["pool"][:3], feats["c4"][:3])  # each [3, B, C]

        g = nn.Dense(512, name="cls_gate_0")(feats["pool"][3])
        g = nn.Dense(3, name="cls_gate_1")(g)
        pr_gate = nn.softmax(g, axis=-1)  # [B, 3]
        cats = jax.lax.stop_gradient(logits_cat_s)  # [3, B, C]
        gate_logits = jnp.einsum("ebc,be->bc", cats, pr_gate)

        all_logits = []
        for i in range(3):
            all_logits += [logits_s[i], logits_max_s[i], logits_cat_s[i]]
        all_logits.append(gate_logits)
        return {
            "logits": gate_logits,
            "all_logits": jnp.stack(all_logits),  # [10, B, C]
            "pr_gate": pr_gate,
        }

    def _phase_a_views(self, x, train, labels):
        """Derive the two CAM crop views with narrow forward-only passes.

        Runs backbone slice ``i`` standalone by index-slicing the stacked
        params/stats (leading expert axis). Train-mode BN normalization is
        used when training (matching the sequential forward); the mutated
        stats are DISCARDED — phase B recomputes the identical forward and
        owns the stats update.
        """
        params = self.variables["params"]["backbones"]
        stats = None
        if "batch_stats" in self.variables:
            stats = self.variables["batch_stats"].get("backbones")
        head_params = self.variables["params"]["heads"]
        slice_mod = _BackboneSlice(self.backbone_name, self.dtype)

        def run_slice(i, v):
            cols = {"params": jax.tree.map(lambda a: a[i], params)}
            if stats is not None:
                cols["batch_stats"] = jax.tree.map(lambda a: a[i], stats)
            if train:
                out, _ = slice_mod.apply(cols, v, train,
                                         mutable=["batch_stats"])
            else:
                out = slice_mod.apply(cols, v, train)
            return out

        def cam_weights(i, pool):
            w = jax.lax.stop_gradient(head_params["classifier"]["kernel"][i])
            if labels is not None:
                y = labels
            else:
                b = jax.lax.stop_gradient(head_params["classifier"]["bias"][i])
                y = jnp.argmax(jax.lax.stop_gradient(pool) @ w + b, -1)
            return nn.relu(w[:, y].T)  # [B, feat]

        views = [x]
        v = x
        for i in range(2):
            stages = run_slice(i, v)
            v = cam_bbox(v, stages["c5"], cam_weights(i, stages["pool"]),
                         self.box_thred, self.image_size)
            views.append(v)
        views.append(x)  # gate backbone sees the full image (MGE.py:207)
        return views

    # ------------------------------------------------------------------
    # sequential path: the reference's 4-pass formulation (parity oracle)
    # ------------------------------------------------------------------
    def _sequential(self, x, train, labels):
        experts = [
            _Expert(self.num_classes, self.backbone_name, self.dtype,
                    name=f"expert_{i}") for i in range(3)
        ]

        def cam_weights(expert_idx, logits, pick_labels):
            """relu'd classifier rows = the analytic GradCAM weights."""
            w = self.variables["params"][f"expert_{expert_idx}"]["head"][
                "classifier"]["kernel"]  # [2048, C]
            y = pick_labels if pick_labels is not None else jnp.argmax(
                jax.lax.stop_gradient(logits), -1)
            return nn.relu(jax.lax.stop_gradient(w)[:, y].T)  # [B, 2048]

        all_logits = []
        cats = []
        view = x
        for i, expert in enumerate(experts):
            logits, logits_max, logits_cat, c5 = expert(view, train)
            all_logits += [logits, logits_max, logits_cat]
            cats.append(logits_cat)
            if i < 2:
                weights = cam_weights(i, logits, labels)
                view = cam_bbox(view, c5, weights, self.box_thred,
                                self.image_size)

        gate_stages = BACKBONE.get(self.backbone_name)(
            num_classes=0, dtype=self.dtype, name="gate_backbone")(x, train=train)
        g = nn.Dense(512, name="cls_gate_0")(gate_stages["pool"])
        g = nn.Dense(3, name="cls_gate_1")(g)
        pr_gate = nn.softmax(g, axis=-1)  # [B, 3]
        gate_logits = sum(
            jax.lax.stop_gradient(cats[i]) * pr_gate[:, i:i + 1]
            for i in range(3))
        all_logits.append(gate_logits)

        return {
            "logits": gate_logits,
            "all_logits": jnp.stack(all_logits),  # [10, B, C]
            "pr_gate": pr_gate,
        }


def stack_expert_variables(seq_vars):
    """Convert sequential-layout MGE variables to the fused stacked layout.

    Backbones: ``expert_i/backbone/**`` (i=0..2) + ``gate_backbone/**`` →
    ``backbones/backbone/**`` with leading expert axis 4. Heads:
    ``expert_i/head/**`` → ``heads/**`` with leading axis 3. Gate classifier
    heads keep their names. Works for both ``params`` and ``batch_stats``
    collections; used by the fused↔sequential parity tests and by
    checkpoint migration.
    """
    out = {}
    for col, tree in seq_vars.items():
        new = {k: v for k, v in tree.items()
               if not (k.startswith("expert_") or k == "gate_backbone")}
        bbs = [tree[f"expert_{i}"]["backbone"] for i in range(3)]
        bbs.append(tree["gate_backbone"])
        new["backbones"] = {"backbone": jax.tree.map(
            lambda *xs: jnp.stack(xs), *bbs)}
        if col == "params":
            hds = [tree[f"expert_{i}"]["head"] for i in range(3)]
            new["heads"] = jax.tree.map(lambda *xs: jnp.stack(xs), *hds)
        out[col] = new
    return out


@MODEL.register(name="MGE_CNN")
def build_mge(config):
    return MGECNN(
        num_classes=int(config.num_classes),
        image_size=int(config.get("image_size", 448)),
        box_thred=float(config.get("box_thred", 0.2)),
        backbone_name=config.get("backbone", "resnet50"),
        fused_experts=bool(config.get("fused_experts", False)),
    )
