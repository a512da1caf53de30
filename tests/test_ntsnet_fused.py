"""NTS-Net fused part pass: exact parity vs the sequential formulation.

The fused path (ntsnet.py::NTSNet._fused) replaces the reference's two
sequential backbone passes (global batch B, then the B*M detached part
crops — ``/root/reference/model/methods/NTS_Net/NTSNet.py:30-57``) with one
stop-gradient global forward (boxes only) + ONE (B + B*M)-batch call whose
BatchNorm statistics are computed per view (``GroupedBatchNorm
group_sizes=(B, B*M)``) and folded in the reference's global-then-parts
order. These tests pin that the restructure is numerically exact in train
mode: identical outputs, identical BatchNorm statistic updates, identical
gradients for every parameter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.models.methods.ntsnet import NTSNet


@pytest.fixture(scope="module")
def pair():
    kw = dict(num_classes=5, proposal_num=4, cat_num=3, image_size=64,
              pad_side=64, part_size=64, backbone_name="resnet18",
              dtype=jnp.float32)
    seq = NTSNet(fused_part_pass=False, **kw)
    fused = NTSNet(fused_part_pass=True, **kw)
    x = jnp.asarray(np.random.RandomState(0).rand(3, 64, 64, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = seq.init(rngs, x, train=True)
    # the fused model's init takes the sequential path too — identical tree
    fvars = fused.init(rngs, x, train=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), variables, fvars)
    return seq, fused, variables, x


def _apply(model, variables, x, train):
    if train:
        return model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(7)},
                           mutable=["batch_stats"])
    return model.apply(variables, x, train=False), None


def test_train_outputs_and_stats_match(pair):
    seq, fused, variables, x = pair
    s_out, s_mut = _apply(seq, variables, x, True)
    f_out, f_mut = _apply(fused, variables, x, True)
    for k in ("logits", "raw_logits", "part_logits", "top_prob"):
        np.testing.assert_allclose(np.asarray(f_out[k]),
                                   np.asarray(s_out[k]),
                                   rtol=1e-5, atol=1e-4, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
        s_mut["batch_stats"], f_mut["batch_stats"])


def test_eval_outputs_match(pair):
    seq, fused, variables, x = pair
    s_out, _ = _apply(seq, variables, x, False)
    f_out, _ = _apply(fused, variables, x, False)
    for k in ("logits", "raw_logits", "part_logits", "top_prob"):
        np.testing.assert_allclose(np.asarray(f_out[k]),
                                   np.asarray(s_out[k]),
                                   rtol=1e-5, atol=1e-4, err_msg=k)


def test_gradients_match(pair):
    seq, fused, variables, x = pair
    labels = jnp.array([0, 2, 4])

    def grads_of(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": jax.random.PRNGKey(7)},
                mutable=["batch_stats"])
            # touch every output head incl. the navigator score gather
            logp = jax.nn.log_softmax(out["logits"])
            lr = jax.nn.log_softmax(out["raw_logits"])
            lp = jax.nn.log_softmax(out["part_logits"], axis=-1)
            return (-jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
                    - jnp.mean(jnp.take_along_axis(lr, labels[:, None], 1))
                    - jnp.mean(lp[..., 0]) + jnp.mean(out["top_prob"] ** 2))
        return jax.grad(f)(variables["params"])

    s_grads = grads_of(seq)
    f_grads = grads_of(fused)
    flat_s = jax.tree_util.tree_flatten_with_path(s_grads)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(f_grads)[0])
    assert flat_s and len(flat_s) == len(flat_f)
    for path, val in flat_s:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(val), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
