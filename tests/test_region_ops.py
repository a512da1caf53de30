"""NMS / peak-finding kernels vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from hawkeye_tpu.ops.nms import (
    anchor_adjacency,
    iou_matrix,
    nms_fixed_anchors,
    nms_general,
)
from hawkeye_tpu.ops.peaks import peak_mask, peak_stimulation


def _np_greedy_nms(scores, boxes, topn, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) == topn:
            break
        for j in order:
            if suppressed[j] or j == i:
                continue
            # iou
            y0 = max(boxes[i, 0], boxes[j, 0])
            x0 = max(boxes[i, 1], boxes[j, 1])
            y1 = min(boxes[i, 2], boxes[j, 2])
            x1 = min(boxes[i, 3], boxes[j, 3])
            inter = max(y1 - y0, 0) * max(x1 - x0, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter) >= thresh:
                suppressed[j] = True
    return keep


def test_nms_fixed_anchors_matches_oracle():
    rng = np.random.RandomState(0)
    n = 40
    centers = rng.rand(n, 2) * 100
    sizes = 10 + rng.rand(n, 2) * 30
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(
        np.float32)
    scores = rng.rand(n).astype(np.float32)
    adj = anchor_adjacency(boxes, 0.3)
    idx, vals = nms_fixed_anchors(jnp.asarray(scores), jnp.asarray(adj), 5)
    want = _np_greedy_nms(scores, boxes, 5, 0.3)
    np.testing.assert_array_equal(np.asarray(idx)[: len(want)], want)


def test_nms_general_matches_fixed():
    rng = np.random.RandomState(1)
    n = 30
    boxes = np.sort(rng.rand(n, 4) * 50, axis=-1)[:, [0, 1, 2, 3]].astype(np.float32)
    boxes = np.concatenate([boxes[:, :2], boxes[:, :2] + 5 + boxes[:, 2:] / 5], 1)
    scores = rng.rand(n).astype(np.float32)
    adj = anchor_adjacency(boxes, 0.25)
    i1, _ = nms_fixed_anchors(jnp.asarray(scores), jnp.asarray(adj), 4)
    i2, _, valid = nms_general(jnp.asarray(scores), jnp.asarray(boxes), 4, 0.25)
    np.testing.assert_array_equal(np.asarray(i1)[np.asarray(valid)],
                                  np.asarray(i2)[np.asarray(valid)])


def test_iou_matrix_identity():
    boxes = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    iou = np.asarray(iou_matrix(boxes, boxes))
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-5)
    want = 25.0 / (100 + 100 - 25)
    np.testing.assert_allclose(iou[0, 1], want, rtol=1e-5)


def test_nms_exhaustion_fallback():
    # one cluster of heavily-overlapping boxes: slots beyond the first
    # survivor fall back to the best box
    boxes = np.array([[0, 0, 10, 10]] * 5, np.float32)
    scores = np.array([0.1, 0.9, 0.3, 0.2, 0.5], np.float32)
    adj = anchor_adjacency(boxes, 0.25)
    idx, vals = nms_fixed_anchors(jnp.asarray(scores), jnp.asarray(adj), 3)
    assert np.asarray(idx).tolist() == [1, 1, 1]


def test_peak_mask_oracle():
    x = np.zeros((1, 1, 5, 5), np.float32)
    x[0, 0, 2, 2] = 1.0
    x[0, 0, 0, 0] = 0.8
    mask = np.asarray(peak_mask(jnp.asarray(x), 3))
    assert mask[0, 0, 2, 2]
    assert mask[0, 0, 0, 0]  # corner local max above mean
    assert mask.sum() == 2


def test_peak_stimulation_gradient_routing():
    """Aggregation gradient spreads uniformly over peaks (the reference's
    hand-written backward, S3N.py:91-98)."""
    x = np.zeros((1, 1, 5, 5), np.float32)
    x[0, 0, 2, 2] = 1.0
    x[0, 0, 0, 0] = 0.9

    def agg_sum(x):
        _, agg = peak_stimulation(x, 3)
        return agg.sum()

    g = np.asarray(jax.grad(agg_sum)(jnp.asarray(x)))
    assert abs(g[0, 0, 2, 2] - 0.5) < 1e-5
    assert abs(g[0, 0, 0, 0] - 0.5) < 1e-5
    assert abs(g.sum() - 1.0) < 1e-5
