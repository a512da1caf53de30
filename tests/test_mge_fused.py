"""MGE fused-expert dispatch: exact parity vs the sequential formulation.

The fused path (mge.py::MGECNN._fused) replaces the reference's four
sequential backbone passes (``/root/reference/model/methods/MGE_CNN/
MGE.py:126-213``) with two stop-gradient forwards + ONE 4-wide vmapped
fwd+bwd. These tests pin that the restructure is numerically exact in train
mode: identical logits, identical BatchNorm statistic updates (per expert
slice), identical gradients for every expert's parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.models.methods.mge import MGECNN, stack_expert_variables


@pytest.fixture(scope="module")
def pair():
    kw = dict(num_classes=4, image_size=64, box_thred=0.2,
              backbone_name="resnet18", dtype=jnp.float32)
    seq = MGECNN(fused_experts=False, **kw)
    fused = MGECNN(fused_experts=True, **kw)
    x = jnp.asarray(np.random.RandomState(0).rand(3, 64, 64, 3), jnp.float32)
    labels = jnp.array([0, 1, 3])
    seq_vars = seq.init({"params": jax.random.PRNGKey(0)}, x, train=True,
                        labels=labels)
    fused_vars = stack_expert_variables(seq_vars)
    return seq, fused, seq_vars, fused_vars, x, labels


def test_train_outputs_match(pair):
    seq, fused, seq_vars, fused_vars, x, labels = pair
    s_out, s_mut = seq.apply(seq_vars, x, train=True, labels=labels,
                             mutable=["batch_stats"])
    f_out, f_mut = fused.apply(fused_vars, x, train=True, labels=labels,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(f_out["all_logits"]),
                               np.asarray(s_out["all_logits"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_out["pr_gate"]),
                               np.asarray(s_out["pr_gate"]),
                               rtol=1e-5, atol=1e-5)
    # BN stats: fused stacks them [4, ...]; phase B owns the update and must
    # match the sequential per-expert stats exactly
    stacked = stack_expert_variables({"batch_stats": s_mut["batch_stats"]})
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
        stacked["batch_stats"], f_mut["batch_stats"])


def test_eval_outputs_match(pair):
    seq, fused, seq_vars, fused_vars, x, _ = pair
    s_out = seq.apply(seq_vars, x, train=False)
    f_out = fused.apply(fused_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(f_out["all_logits"]),
                               np.asarray(s_out["all_logits"]),
                               rtol=1e-5, atol=1e-4)


def test_gradients_match(pair):
    seq, fused, seq_vars, fused_vars, x, labels = pair

    def loss_of(model, variables):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, labels=labels, mutable=["batch_stats"])
            logp = jax.nn.log_softmax(out["all_logits"], axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                logp, labels[None, :, None].repeat(10, 0), axis=-1))
        return jax.grad(f)(variables["params"])

    s_grads = stack_expert_variables({"params": loss_of(seq, seq_vars)})
    f_grads = loss_of(fused, fused_vars)
    flat_s = jax.tree_util.tree_flatten_with_path(s_grads["params"])[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(f_grads)[0])
    assert flat_f, "no fused grads"
    for path, val in flat_s:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(val), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
