"""relu_maxpool2x2: values + gradients match the naive relu→max_pool pair,
and the VGG fast paths (efficient_pool / remat_first) are drop-in equivalent
in values, gradients, and parameter naming."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hawkeye_tpu.ops import pool
from hawkeye_tpu.ops.pool import relu_maxpool2x2


def naive(x):
    import flax.linen as nn

    return nn.max_pool(nn.relu(x), (2, 2), strides=(2, 2))


# force_argmax=True pins the argmax-index custom-VJP formulation (the path
# the TPU Pallas kernels implement); False takes the default dispatch, which
# off-TPU is plain relu→max_pool. Both must agree bit-for-bit. NOTE: on CPU
# the "dispatch" param lowers to the same relu+reduce_window as naive(), so
# its equality asserts are near-tautological there — it's a dispatch smoke
# test; only "argmax" exercises the custom-VJP formulation off-TPU.
@pytest.fixture(params=[False, True], ids=["dispatch", "argmax"])
def force_argmax(request, monkeypatch):
    monkeypatch.setattr(pool, "FORCE_LAX", request.param)
    return request.param


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_relu_maxpool_forward_backward(dtype, force_argmax):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 8, 12, 5), dtype)

    np.testing.assert_array_equal(np.asarray(relu_maxpool2x2(x)),
                                  np.asarray(naive(x)))

    dp = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 6, 5), dtype)
    g_fast = jax.vjp(relu_maxpool2x2, x)[1](dp)[0]
    g_ref = jax.vjp(naive, x)[1](dp)[0]
    np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_ref))


def test_relu_maxpool_tie_break_matches_select_and_scatter(force_argmax):
    # constant windows: all four candidates tie — first (row-major) must win
    x = jnp.ones((1, 4, 4, 2), jnp.float32)
    dp = jnp.arange(8, dtype=jnp.float32).reshape(1, 2, 2, 2)
    g_fast = jax.vjp(relu_maxpool2x2, x)[1](dp)[0]
    g_ref = jax.vjp(naive, x)[1](dp)[0]
    np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_ref))


def test_relu_maxpool_negative_windows_zero_grad(force_argmax):
    x = -jnp.ones((1, 4, 4, 1), jnp.float32)
    dp = jnp.ones((1, 2, 2, 1), jnp.float32)
    g = jax.vjp(relu_maxpool2x2, x)[1](dp)[0]
    assert float(jnp.abs(g).sum()) == 0.0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_pool_kernels_match_lax(dtype):
    """Interpret-mode run of the TPU kernels vs the lax reference impl."""
    from hawkeye_tpu.ops import pallas_pool
    from hawkeye_tpu.ops.pool import _pool_fwd_impl

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (64, 8, 8, 64), dtype)
    assert pallas_pool.supports(x.shape, dtype)
    # tiny-minor-dim shapes (e.g. a batch-2 init trace) are intentionally
    # unsupported: the post-transpose minor dim pads 64x on the lane axis
    assert not pallas_pool.supports((2, 8, 8, 64), dtype)
    p_ref, i_ref = _pool_fwd_impl(x)
    p, idx = pallas_pool.pool_fwd(x)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(p_ref))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(i_ref))

    dp = jax.random.normal(jax.random.PRNGKey(3), p.shape, dtype)
    dx = pallas_pool.pool_bwd(dp, idx, p)
    g_ref = jax.vjp(naive, x)[1](dp)[0]
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(g_ref))


def test_pallas_pool_shards_without_gathers(monkeypatch):
    """Under GSPMD batch sharding the pool custom call must partition along
    the batch axis — no all-gather in the compiled module, sharded output,
    values equal to the single-device reference. (Run in interpret mode on
    the virtual CPU mesh; the sharding decision happens at the GSPMD level,
    before backend lowering.)"""
    import flax.linen as fnn
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hawkeye_tpu.ops import pallas_pool, pool

    monkeypatch.setattr(
        pool, "_use_pallas",
        lambda x: pallas_pool.supports(x.shape, x.dtype))

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    x_host = np.random.RandomState(0).randn(16, 8, 8, 64).astype(np.float32)
    x = jax.device_put(x_host, NamedSharding(mesh, P("data")))

    def f(x):
        return pool.relu_maxpool2x2(x).sum()

    compiled = jax.jit(jax.grad(f)).lower(x).compile()
    assert "all-gather" not in compiled.as_text()
    out = jax.jit(jax.grad(f))(x)
    assert out.sharding.spec == P("data")

    ref = jax.grad(lambda x: naive(x).sum())(jnp.asarray(x_host))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def _vgg(efficient_pool, remat_first):
    from hawkeye_tpu.models.backbones.vgg import VGG, _VGG_CFGS

    return VGG(cfg=_VGG_CFGS["D"], num_classes=0, dtype=jnp.float32,
               efficient_pool=efficient_pool, remat_first=remat_first)


def test_vgg_fast_paths_equivalent():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    slow = _vgg(False, False)
    fast = _vgg(True, True)
    v_slow = slow.init(jax.random.PRNGKey(1), x, train=False)
    v_fast = fast.init(jax.random.PRNGKey(1), x, train=False)

    # identical parameter trees (names AND values: same init streams)
    ps, pf = jax.tree_util.tree_leaves_with_path(v_slow), \
        jax.tree_util.tree_leaves_with_path(v_fast)
    assert [str(k) for k, _ in ps] == [str(k) for k, _ in pf]
    for (_, a), (_, b) in zip(ps, pf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(model, variables):
        out = model.apply(variables, x, train=False)
        return (out["pooled_features"].astype(jnp.float32) ** 2).mean(), out

    (l_s, out_s), g_s = jax.value_and_grad(
        lambda v: loss(slow, v), has_aux=True)(v_slow)
    (l_f, out_f), g_f = jax.value_and_grad(
        lambda v: loss(fast, v), has_aux=True)(v_fast)

    np.testing.assert_allclose(float(l_s), float(l_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_s["features"]),
                               np.asarray(out_f["features"]), atol=1e-5)
    for (_, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_s),
                              jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_bcnn_fast_flags_preserve_param_tree():
    """Checkpoint compatibility: BCNN params identical with flags on/off."""
    from hawkeye_tpu.config import ConfigNode
    from hawkeye_tpu.registry import MODEL
    import hawkeye_tpu.models  # noqa: F401

    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    trees = []
    for flags in ({"efficient_pool": True, "remat_first": True},
                  {"efficient_pool": False, "remat_first": False}):
        m = MODEL.get("BCNN")(ConfigNode({"num_classes": 4,
                                          "backbone": "vgg11", **flags}))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        trees.append([str(k) for k, _ in
                      jax.tree_util.tree_leaves_with_path(v)])
    assert trees[0] == trees[1]
