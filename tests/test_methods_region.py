"""Shape/jit tests for NTS-Net, S3N, PeerLearning."""

import jax
import jax.numpy as jnp
import numpy as np

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.losses import build_criterion
from hawkeye_tpu.registry import MODEL


def test_nts_anchor_count_matches_proposal_net():
    """The anchor ordering contract: #anchors == ProposalNet output width."""
    from hawkeye_tpu.models.methods.ntsnet import ProposalNet, generate_anchors

    for size in (224, 448):
        anchors = generate_anchors(size)
        pn = ProposalNet()
        c5 = jnp.zeros((1, size // 32, size // 32, 64))
        v = pn.init(jax.random.PRNGKey(0), c5)
        scores = pn.apply(v, c5)
        assert scores.shape == (1, anchors.shape[0]), (
            size, scores.shape, anchors.shape)


def test_ntsnet_end_to_end_loss():
    cfg = ConfigNode({"num_classes": 5, "proposal_num": 4, "cat_num": 2,
                      "image_size": 64, "backbone": "resnet18"})
    model = MODEL.get("NTSNet")(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=True)
    out, _ = model.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["logits"].shape == (2, 5)
    assert out["part_logits"].shape == (2, 4, 5)
    assert out["top_prob"].shape == (2, 4)
    crit = build_criterion(ConfigNode({"name": "NTSLoss"}))
    loss = float(crit(out, {"label": jnp.array([0, 1])}))
    assert np.isfinite(loss)


def test_nts_ranking_hinge():
    from hawkeye_tpu.losses.nts import ranking_hinge

    # proposal 0 scores lower but has lower loss -> hinge penalty
    scores = jnp.asarray([[0.0, 1.0]])
    losses = jnp.asarray([[0.1, 5.0]])  # proposal 1 is worse
    val = float(ranking_hinge(scores, losses))
    assert abs(val - 2.0) < 1e-5  # relu(1 - 0 + 1) = 2 (i=0 pivot, j=1 worse)
    # correctly ordered scores: no penalty beyond margin
    scores = jnp.asarray([[5.0, 1.0]])
    assert float(ranking_hinge(scores, losses)) == 0.0


def test_s3n_fused_warp_pass_equivalence():
    """fused_warp_pass concatenates the zoom+inverse views into one backbone
    call. Same params, eval mode (BN running stats): outputs must be
    identical to the two-pass form; train mode must stay finite."""
    cfg = ConfigNode({"num_classes": 4, "image_size": 64,
                      "backbone": "resnet18", "fused_warp_pass": False})
    base = MODEL.get("S3N")(cfg)
    fused = MODEL.get("S3N")(ConfigNode({**cfg.to_dict(),
                                         "fused_warp_pass": True}))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    v = base.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, x, train=True, p=0)
    out_a = base.apply(v, x, train=False, p=2)
    out_b = fused.apply(v, x, train=False, p=2)
    for k in out_a:
        np.testing.assert_allclose(np.asarray(out_a[k], np.float32),
                                   np.asarray(out_b[k], np.float32),
                                   rtol=0, atol=1e-5, err_msg=k)
    out_t, _ = fused.apply(v, x, train=True, p=1, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out_t["logits"], np.float32)).all()


def test_s3n_fused_warp_pass_train_mode_exact():
    """TRAIN-mode parity of the fused pass (round-4: GroupedBatchNorm makes
    per-view BN statistics exact inside the single 2B-batch call, restoring
    the reference's separate-pass semantics, S3N.py:292-315). Outputs AND
    the updated running statistics must match the two-pass path."""
    from hawkeye_tpu.models.methods.s3n import S3N

    kw = dict(num_classes=4, image_size=64, backbone_name="resnet18",
              dtype=jnp.float32)
    base = S3N(fused_warp_pass=False, **kw)
    fused = S3N(fused_warp_pass=True, **kw)
    x = jnp.asarray(np.random.RandomState(3).rand(4, 64, 64, 3), jnp.float32)
    v = base.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, x, train=True, p=0)
    out_a, mut_a = base.apply(v, x, train=True, p=0,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(2)})
    out_b, mut_b = fused.apply(v, x, train=True, p=0,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(2)})
    for k in out_a:
        np.testing.assert_allclose(np.asarray(out_a[k], np.float32),
                                   np.asarray(out_b[k], np.float32),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    flat_a = jax.tree_util.tree_leaves_with_path(mut_a["batch_stats"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(mut_b["batch_stats"]))
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]),
            rtol=1e-5, atol=1e-6, err_msg=str(path))


def test_s3n_phases_and_loss():
    cfg = ConfigNode({"num_classes": 4, "image_size": 64,
                      "backbone": "resnet18"})
    model = MODEL.get("S3N")(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=True, p=0)
    crit = build_criterion(ConfigNode({"name": "MultiSmoothLoss",
                                       "smooth_ratio": 0.85}))
    for p in (0, 1, 2):
        out, _ = model.apply(v, x, train=True, p=p, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
        assert out["logits"].shape == (2, 4)
        assert np.isfinite(float(crit(out, {"label": jnp.array([0, 1])})))


def test_peer_learning_exchange_semantics():
    from hawkeye_tpu.losses.peer_learning import peer_learning_losses

    # crafted: peers agree on all; drop_rate 0.5 keeps the 2 lowest-loss
    # (per the PEER's ranking) of 4 agreeing samples
    logits = np.full((4, 3), -5.0, np.float32)
    for i, c in enumerate([0, 0, 0, 0]):
        logits[i, c] = 5.0
    l1 = jnp.asarray(logits)
    labels = jnp.asarray([0, 0, 1, 2])  # samples 2,3 are "noisy"
    loss1, loss2 = peer_learning_losses(l1, l1, labels, 0.5)
    # kept samples are the correct-label ones -> low loss
    assert float(loss1) < 0.1 and float(loss2) < 0.1
    # drop_rate 0 keeps everything -> high loss from noisy labels
    loss1_all, _ = peer_learning_losses(l1, l1, labels, 0.0)
    assert float(loss1_all) > 1.0


def test_peer_learning_net_outputs():
    cfg = ConfigNode({"num_classes": 3, "base_model": {
        "name": "ResNet18", "num_classes": 3}})
    model = MODEL.get("PeerLearningNet")(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    out = model.apply(v, x, train=False)
    assert set(out) == {"logits", "logits1", "logits2"}
    # peers are independently initialized
    assert not np.allclose(np.asarray(out["logits1"]),
                           np.asarray(out["logits2"]))
