"""Fixed-shape on-device non-maximum suppression.

The reference runs greedy NMS per image on host numpy
(``model/methods/NTS_Net/anchors.py:63-96``, ``model/methods/nms.py:4-93``),
forcing a device→host→device round trip inside every forward (SURVEY §3.2).
Here NMS is a jitted fixed-shape program:

- ``iou_matrix`` / ``nms_general``: greedy top-N with IoU suppression for
  runtime boxes (APCNN's attention ROIs).
- ``nms_fixed_anchors``: when the box set is STATIC (NTS-Net's anchor grid),
  the IoU adjacency is precomputed once on host and baked as a constant —
  the device loop is just masked argmax + adjacency row lookups, no box
  math at all.

Both return indices padded to exactly ``topn`` (greedy order); if fewer than
topn survive, remaining slots repeat the best-scoring box (harmless for the
downstream gather semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def iou_matrix(boxes_a, boxes_b):
    """IoU between two box sets [N,4] and [M,4], boxes (y0, x0, y1, x1)."""
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    y0 = jnp.maximum(a[..., 0], b[..., 0])
    x0 = jnp.maximum(a[..., 1], b[..., 1])
    y1 = jnp.minimum(a[..., 2], b[..., 2])
    x1 = jnp.minimum(a[..., 3], b[..., 3])
    ih = jnp.maximum(y1 - y0, 0.0)
    iw = jnp.maximum(x1 - x0, 0.0)
    inter = ih * iw
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


def anchor_adjacency(edge_anchors: np.ndarray, iou_thresh: float) -> np.ndarray:
    """Host-side precomputation: [A, A] bool, True where IoU >= thresh."""
    a = edge_anchors.astype(np.float64)
    y0 = np.maximum(a[:, None, 0], a[None, :, 0])
    x0 = np.maximum(a[:, None, 1], a[None, :, 1])
    y1 = np.minimum(a[:, None, 2], a[None, :, 2])
    x1 = np.minimum(a[:, None, 3], a[None, :, 3])
    inter = np.clip(y1 - y0, 0, None) * np.clip(x1 - x0, 0, None)
    area = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    iou = inter / np.maximum(area[:, None] + area[None, :] - inter, 1e-9)
    return iou >= iou_thresh


def nms_fixed_anchors(scores, adjacency, topn: int):
    """Greedy NMS over a static anchor set for ONE score row.

    scores: [A]; adjacency: [A, A] bool (IoU >= thresh, includes diagonal).
    Returns ([topn] indices, [topn] scores), greedy order.
    """
    a = scores.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def body(i, carry):
        mask, idxs, vals = carry
        masked = jnp.where(mask, scores, neg_inf)
        j = jnp.argmax(masked)
        idxs = idxs.at[i].set(j)
        vals = vals.at[i].set(masked[j])
        mask = mask & ~adjacency[j]
        return mask, idxs, vals

    mask0 = jnp.ones((a,), bool)
    idxs0 = jnp.zeros((topn,), jnp.int32)
    vals0 = jnp.zeros((topn,), scores.dtype)
    _, idxs, vals = jax.lax.fori_loop(0, topn, body, (mask0, idxs0, vals0))
    # exhausted slots (-inf) fall back to the global best box
    best = jnp.argmax(scores)
    exhausted = ~jnp.isfinite(vals)
    idxs = jnp.where(exhausted, best, idxs)
    vals = jnp.where(exhausted, scores[best], vals)
    return idxs, vals


def nms_fixed_anchors_batch(scores, adjacency, topn: int):
    """vmapped ``nms_fixed_anchors``: scores [B, A] → ([B, topn], [B, topn])."""
    return jax.vmap(lambda s: nms_fixed_anchors(s, adjacency, topn))(scores)


def nms_general(scores, boxes, topn: int, iou_thresh: float):
    """Greedy NMS with runtime boxes for ONE image.

    scores: [N]; boxes: [N, 4]. Returns ([topn] idx, [topn] scores,
    [topn] valid mask) — unlike the anchor variant, exhausted slots are
    reported via the mask (APCNN keeps variable-count ROIs).
    """
    n = scores.shape[0]
    iou = iou_matrix(boxes, boxes)
    adj = iou >= iou_thresh
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def body(i, carry):
        mask, idxs, vals = carry
        masked = jnp.where(mask, scores, neg_inf)
        j = jnp.argmax(masked)
        idxs = idxs.at[i].set(j)
        vals = vals.at[i].set(masked[j])
        mask = mask & ~adj[j]
        return mask, idxs, vals

    mask0 = jnp.ones((n,), bool)
    _, idxs, vals = jax.lax.fori_loop(
        0, topn, body,
        (mask0, jnp.zeros((topn,), jnp.int32), jnp.zeros((topn,), scores.dtype)))
    valid = jnp.isfinite(vals)
    return idxs, jnp.where(valid, vals, 0.0), valid
