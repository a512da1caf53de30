"""Shape/semantics tests: OSME+MAMC, APINet, CIN, PairConfusion, CrossX, DCL."""

import jax
import jax.numpy as jnp
import numpy as np

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.losses import build_criterion
from hawkeye_tpu.registry import MODEL


def crit(name, **kw):
    return build_criterion(ConfigNode({"name": name, **kw}))


def batch_of(labels, extra=None):
    b = {"label": jnp.asarray(labels)}
    if extra:
        b.update(extra)
    return b


def test_osme_forward_and_mamc():
    model = MODEL.get("OSMENet")(ConfigNode({"num_classes": 6, "num_attention": 2,
                                             "backbone": "resnet18"}))
    x = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["logits"].shape == (4, 6)
    assert out["parts"].shape == (4, 2, 1024)
    loss = crit("MAMCLoss", lambda_a=0.5)(out, batch_of([0, 0, 1, 1]))
    assert np.isfinite(float(loss))
    # n-pairs adds on top of CE
    ce_only = crit("MAMCLoss", use_mamc=False)(out, batch_of([0, 0, 1, 1]))
    assert float(loss) > float(ce_only)


def test_mamc_npairs_oracle():
    """Vectorized n-pairs == direct anchor-loop oracle on a tiny case."""
    from hawkeye_tpu.losses.mamc import npairs_mamc

    rng = np.random.RandomState(0)
    parts = rng.rand(4, 2, 8).astype(np.float32)
    labels = np.array([0, 0, 1, 1])
    got = float(npairs_mamc(jnp.asarray(parts), jnp.asarray(labels)))

    # oracle
    b, p, d = parts.shape
    n = b * p
    x = parts.reshape(n, d)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    sim = x @ x.T
    lab = np.repeat(labels, p)
    prt = np.tile(np.arange(p), b)
    sc = lab[:, None] == lab[None, :]
    sp = prt[:, None] == prt[None, :]
    quads = {
        "sasc": sc & sp, "sadc": (~sc) & sp, "dasc": sc & ~sp, "dadc": (~sc) & ~sp,
    }
    total = 0.0
    for pos_name, neg_names in [("sasc", ["sadc", "dasc", "dadc"]),
                                ("sadc", ["dadc"]), ("dasc", ["dadc"])]:
        pos_mask = quads[pos_name]
        neg_mask = np.zeros_like(pos_mask)
        for nm in neg_names:
            neg_mask |= quads[nm]
        for i in range(n):
            pos = sim[i][pos_mask[i]]
            neg = sim[i][neg_mask[i]]
            for pv in pos:
                total += np.log1p(np.exp(neg - pv).sum())
    want = total / n
    assert abs(got - want) < 1e-4, (got, want)


def test_apinet_train_val_modes():
    model = MODEL.get("APINet")(ConfigNode({"num_classes": 5,
                                            "backbone": "resnet18"}))
    x = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 0, 1, 1])
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=True,
                   labels=labels)
    out_val = model.apply(v, x, train=False)
    assert set(out_val) == {"logits"}
    out_tr, _ = model.apply(v, x, train=True, labels=labels,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
    # 2B pairs, each contributing anchor- and partner-side logits -> 4B rows
    assert out_tr["self_logits"].shape == (16, 5)
    assert out_tr["other_logits"].shape == (16, 5)
    assert out_tr["pair_labels"].shape == (16,)
    loss = crit("APINetLoss")(out_tr, batch_of(labels))
    assert np.isfinite(float(loss))


def test_apinet_pair_mining():
    from hawkeye_tpu.models.methods.apinet import mine_pairs

    emb = jnp.asarray([[0.0, 0], [0.1, 0], [5.0, 0], [5.2, 0]])
    labels = jnp.asarray([0, 0, 1, 1])
    intra, inter = mine_pairs(emb, labels)
    np.testing.assert_array_equal(np.asarray(intra), [1, 0, 3, 2])
    np.testing.assert_array_equal(np.asarray(inter), [2, 2, 1, 1])


def test_cin_forward_and_loss():
    model = MODEL.get("CIN")(ConfigNode({"num_classes": 4,
                                         "backbone": "resnet18",
                                         "r_channel": 16}))
    x = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    out_val = model.apply(v, x, train=False)
    assert "pair_embed" not in out_val
    out_tr, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
    assert out_tr["pair_embed"].shape == (4, 16)
    loss = crit("CINLoss", alpha=2.0, beta=0.5)(out_tr, batch_of([0, 1, 0, 1]))
    assert np.isfinite(float(loss))


def test_pair_confusion_loss():
    logits = jnp.asarray(np.random.RandomState(0).rand(4, 5), jnp.float32)
    c = crit("PairwiseConfusionLoss", lambda_a=10.0)
    # same labels across halves -> no confusion term
    l_same = c({"logits": logits}, batch_of([0, 1, 0, 1]))
    l_diff = c({"logits": logits}, batch_of([0, 1, 2, 3]))
    assert float(l_diff) > float(l_same)


def test_crossx_forward_and_loss():
    model = MODEL.get("CrossX")(ConfigNode({"num_classes": 5, "num_parts": 2}))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["logits"].shape == (2, 5)
    assert out["ulti_parts"].shape == (2, 2, 2048)
    assert out["plty_parts"].shape == (2, 2, 1024)
    loss = crit("CrossXLoss", num_parts=2, gamma=[0.5, 0.25, 0.5])(
        out, batch_of([0, 1]))
    assert np.isfinite(float(loss))


def test_dcl_forward_and_loss():
    model = MODEL.get("DCL")(ConfigNode({"num_classes": 4, "cls_2": True,
                                         "backbone": "resnet18"}))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 112, 112, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["logits"].shape == (2, 4)
    assert out["swap_logits"].shape == (2, 2)
    # 112/32 = c5 4x4 -> 2x2 mask = 4 dims... grid depends on input size
    assert out["mask"].shape[0] == 2
    grid_sq = out["mask"].shape[1]
    batch = batch_of([0, 1], {
        "label_swap": jnp.asarray([1, 0]),
        "swap_law": jnp.zeros((2, grid_sq)),
    })
    loss = crit("DCLLoss", alpha=1, beta=1, gamma=1)(out, batch)
    assert np.isfinite(float(loss))
