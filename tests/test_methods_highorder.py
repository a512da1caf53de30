"""Shape/jit/gradient tests for BCNN/CBCNN/MPN (SURVEY §4 item (b))."""

import jax
import jax.numpy as jnp
import numpy as np

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.registry import MODEL


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    if train:
        out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    else:
        out = model.apply(variables, x, train=False)
    return variables, out


def test_bcnn_forward():
    cfg = ConfigNode({"num_classes": 7, "stage": 2})
    model = MODEL.get("BCNN")(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    _, out = _init_and_apply(model, x)
    assert out["logits"].shape == (2, 7)
    assert out["features"].shape == (2, 512 * 512)
    # descriptor is L2-normalized
    norms = np.asarray(jnp.linalg.norm(out["features"], axis=-1))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_bcnn_stage1_freezes_backbone():
    cfg = ConfigNode({"num_classes": 3, "stage": 1})
    model = MODEL.get("BCNN")(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        out = model.apply({"params": params}, x, train=False)
        return out["logits"].sum()

    g = jax.grad(loss)(variables["params"])
    backbone_norm = sum(
        float(jnp.abs(v).sum())
        for v in jax.tree.leaves(g["backbone"])
    )
    fc_norm = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g["fc"]))
    assert backbone_norm == 0.0, "stage 1 must stop gradients into backbone"
    assert fc_norm > 0.0


def test_cbcnn_forward():
    cfg = ConfigNode({"num_classes": 5, "stage": 2, "input_channel": 512,
                      "output_channel": 256})
    model = MODEL.get("CBCNN")(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    _, out = _init_and_apply(model, x)
    assert out["logits"].shape == (2, 5)
    assert out["features"].shape == (2, 256)


def test_mpn_forward_and_train_mode():
    cfg = ConfigNode({"num_classes": 6, "dimension_reduction": 32,
                      "iter_num": 3})
    model = MODEL.get("MPN")(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    variables, out = _init_and_apply(model, x)
    assert out["logits"].shape == (2, 6)
    assert out["features"].shape == (2, 32 * 33 // 2)
    # train mode mutates batch stats and grads are finite
    out2, mutated = model.apply(variables, x, train=True,
                                mutable=["batch_stats"])
    assert "batch_stats" in mutated

    def loss(params):
        o = model.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        x, train=False)
        return o["logits"].sum()

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))


def test_mpn_param_groups_label():
    from hawkeye_tpu.engine.optim import build_optimizer, make_prefix_labeler

    cfg = ConfigNode({"num_classes": 4, "dimension_reduction": 16})
    model = MODEL.get("MPN")(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    labeler = make_prefix_labeler({"backbone": "backbone"})
    labels = labeler(variables["params"])
    assert labels["backbone"]["conv1"]["kernel"] == "backbone"
    assert labels["fc"]["kernel"] == "head"

    opt_cfg = ConfigNode({"name": "SGD", "lr": 0.1, "momentum": 0.9})
    tx, _ = build_optimizer(opt_cfg, labeler, {"backbone": 0.2, "head": 1.0})
    opt_state = tx.init(variables["params"])
    grads = jax.tree.map(jnp.ones_like, variables["params"])
    updates, _ = tx.update(grads, opt_state, variables["params"])
    up_backbone = float(updates["backbone"]["conv1"]["kernel"].reshape(-1)[0])
    up_head = float(updates["fc"]["kernel"].reshape(-1)[0])
    assert abs(up_backbone / up_head - 0.2) < 1e-5
