"""Shape/semantics tests: Interp-Parts, MGE-CNN, APCNN, ProtoTree."""

import jax
import jax.numpy as jnp
import numpy as np

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.losses import build_criterion
from hawkeye_tpu.registry import MODEL


def crit(name, **kw):
    return build_criterion(ConfigNode({"name": name, **kw}))


def test_interp_parts_forward_and_loss():
    model = MODEL.get("IP_ResNet50")(ConfigNode({"num_classes": 4,
                                                 "num_parts": 3}))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    out, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
    assert out["logits"].shape == (2, 4)
    assert out["att"].shape == (2, 3)
    np.testing.assert_allclose(np.asarray(out["att"].sum(-1)), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["assign"].sum(-1)), 1.0,
                               atol=1e-5)
    loss = crit("InterpPartsLoss", radius=2, std=0.4, alpha=1, beta=0.001,
                coeff=0.5)(out, {"label": jnp.array([0, 1])})
    assert np.isfinite(float(loss))


def test_mge_forward_and_loss():
    model = MODEL.get("MGE_CNN")(ConfigNode({
        "num_classes": 4, "image_size": 64, "box_thred": 0.2,
        "backbone": "resnet18"}))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 1])
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=True,
                   labels=labels)
    out, _ = model.apply(v, x, train=True, labels=labels,
                         mutable=["batch_stats"])
    assert out["all_logits"].shape == (10, 2, 4)
    np.testing.assert_allclose(np.asarray(out["pr_gate"].sum(-1)), 1.0,
                               rtol=1e-5)
    loss = crit("MGELoss")(out, {"label": labels})
    assert np.isfinite(float(loss))
    # eval mode works without labels (CAM target = prediction)
    out_e = model.apply(v, x, train=False)
    assert out_e["logits"].shape == (2, 4)


def test_mge_cam_bbox_degenerate_falls_back():
    from hawkeye_tpu.models.methods.mge import cam_bbox

    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3), jnp.float32)
    conv5 = jnp.ones((1, 2, 2, 8))
    weights = jnp.zeros((1, 8))  # zero CAM -> degenerate -> full image
    crops = cam_bbox(imgs, conv5, weights, rate=0.5, img_size=16)
    np.testing.assert_allclose(np.asarray(crops), np.asarray(imgs), atol=1e-3)


def test_apcnn_forward_and_loss():
    model = MODEL.get("APCNN")(ConfigNode({"num_classes": 4, "image_size": 64}))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=True)
    out, _ = model.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["all_logits"].shape == (8, 2, 4)
    assert out["rois"].shape == (2, 9, 4)
    # rois inside image bounds
    rois = np.asarray(out["rois"])
    assert (rois[..., 0] >= 0).all() and (rois[..., 2] <= 64).all()
    loss = crit("APCNNLoss")(out, {"label": jnp.array([0, 1])})
    assert np.isfinite(float(loss))


def test_prototree_path_probs_sum_to_one():
    from hawkeye_tpu.models.methods.prototree import leaf_path_probs

    ps = jnp.asarray(np.random.RandomState(0).rand(3, 7), jnp.float32)  # h=3
    pa = leaf_path_probs(ps, 3)
    assert pa.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(pa.sum(-1)), 1.0, rtol=1e-5)


def test_prototree_forward_and_leaf_update():
    model = MODEL.get("ProtoTreeNet")(ConfigNode({
        "num_classes": 4, "height": 3, "num_features": 16,
        "backbone": {"name": "resnet18"}}))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    assert "tree_leaves" in v
    assert v["tree_leaves"]["dist_params"].shape == (8, 4)
    out, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out["pred"].sum(-1)), 1.0, rtol=1e-4)

    from hawkeye_tpu.losses.prototree import leaf_update

    labels = jnp.array([0, 1])
    new = leaf_update(v["tree_leaves"]["dist_params"],
                      jnp.zeros((8, 4)), out["pa_leaf"], out["leaf_dist"],
                      out["pred"], labels, 4)
    new = np.asarray(new)
    assert (new >= 0).all()
    # mass concentrates on observed classes 0/1
    assert new[:, :2].sum() > new[:, 2:].sum()

    loss = crit("ProtoTreeLoss")(out, {"label": labels})
    assert np.isfinite(float(loss))


def test_prototree_sampling_strategies():
    """All three inference strategies (reference prototree.py:21) run under
    jit; greedy/sample_max return a single leaf's distribution."""
    model = MODEL.get("ProtoTreeNet")(ConfigNode({
        "num_classes": 4, "height": 3, "num_features": 16,
        "backbone": {"name": "resnet18"}}))
    x = jnp.asarray(np.random.RandomState(1).rand(3, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    # non-trivial leaf distributions so strategies can differ
    v = dict(v)
    v["tree_leaves"] = {"dist_params": jnp.asarray(
        np.random.RandomState(2).randn(8, 4), jnp.float32)}
    outs = {s: jax.jit(lambda v, x, s=s: model.apply(v, x, train=False,
                                                     sampling=s))(v, x)
            for s in ("distributed", "sample_max", "greedy")}
    leaf_dist = np.asarray(outs["greedy"]["leaf_dist"])
    for s in ("sample_max", "greedy"):
        pred = np.asarray(outs[s]["pred"])
        np.testing.assert_allclose(pred.sum(-1), 1.0, rtol=1e-5)
        # each row must be exactly one leaf's distribution
        for row in pred:
            assert np.abs(leaf_dist - row).sum(-1).min() < 1e-6
    np.testing.assert_allclose(
        np.asarray(outs["distributed"]["pred"].sum(-1)), 1.0, rtol=1e-4)
