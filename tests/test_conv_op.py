"""conv3x3_same_fast_dgrad: values equal lax.conv; the forward-form dgrad
and XLA-path wgrad match autodiff of the plain conv. The VGG fast_dgrad
path is drop-in equivalent (params, values, gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from hawkeye_tpu.ops.conv import conv3x3_same_fast_dgrad

_DN = ("NHWC", "HWIO", "NHWC")


def plain(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=_DN)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fast_dgrad_matches_autodiff(dtype):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 10, 12, 5), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 5, 5), dtype) * 0.2
    np.testing.assert_array_equal(
        np.asarray(conv3x3_same_fast_dgrad(x, w)), np.asarray(plain(x, w)))

    dy = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 12, 5), dtype)
    dx_f, dw_f = jax.vjp(conv3x3_same_fast_dgrad, x, w)[1](dy)
    dx_r, dw_r = jax.vjp(plain, x, w)[1](dy)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(dx_f, np.float32),
                               np.asarray(dx_r, np.float32),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(dw_f, np.float32),
                               np.asarray(dw_r, np.float32),
                               rtol=tol, atol=tol)


def test_vgg_fast_dgrad_equivalent():
    from hawkeye_tpu.models.backbones.vgg import VGG, _VGG_CFGS

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)

    def build(fast):
        return VGG(cfg=_VGG_CFGS["D"], num_classes=0, dtype=jnp.float32,
                   fast_dgrad=fast)

    va = build(False).init(jax.random.PRNGKey(1), x, train=False)
    vb = build(True).init(jax.random.PRNGKey(1), x, train=False)
    pa = jax.tree_util.tree_leaves_with_path(va)
    pb = jax.tree_util.tree_leaves_with_path(vb)
    assert [str(k) for k, _ in pa] == [str(k) for k, _ in pb]
    for (_, a), (_, b) in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(model, v):
        out = model.apply(v, x, train=False)
        return (out["pooled_features"].astype(jnp.float32) ** 2).mean()

    la, ga = jax.value_and_grad(lambda v: loss(build(False), v))(va)
    lb, gb = jax.value_and_grad(lambda v: loss(build(True), v))(vb)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for (_, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(ga),
                              jax.tree_util.tree_leaves_with_path(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
