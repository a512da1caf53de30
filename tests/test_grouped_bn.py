"""GroupedBatchNorm parity (round-4: exact fused multi-view passes).

1. groups=1 must match flax.linen.BatchNorm exactly (train + eval outputs,
   updated running stats) — it replaces nn.BatchNorm inside backbones that
   opt into ``grouped_bn``, so the raw/unfused paths must be unchanged.
2. groups=G on a stacked batch must match G SEQUENTIAL BatchNorm passes
   (per-view outputs AND the view-order running-stats fold) — the exactness
   claim that lets S3N's fused_warp_pass default on (reference semantics:
   ``model/methods/S3N.py:292-315`` runs separate passes).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from hawkeye_tpu.models.backbones.norm import GroupedBatchNorm


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_groups1_matches_flax_batchnorm(dtype):
    x = jnp.asarray(np.random.RandomState(0).randn(6, 5, 5, 7) * 2 + 1,
                    dtype)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=dtype)
    got = GroupedBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, dtype=dtype, groups=1)
    vref = ref.init(jax.random.PRNGKey(0), x)
    vgot = got.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(vref) == jax.tree.structure(vgot)
    # non-trivial params/stats (running var must stay positive)
    rs = np.random.RandomState(1)
    vars_ = jax.tree.map(
        lambda a: jnp.asarray(rs.randn(*a.shape), a.dtype), vref)
    vars_ = {**vars_, "batch_stats": {
        "mean": vars_["batch_stats"]["mean"],
        "var": jnp.abs(vars_["batch_stats"]["var"]) + 0.5}}
    yr, mr = ref.apply(vars_, x, mutable=["batch_stats"])
    yg, mg = got.apply(vars_, x, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(yg))
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mr["batch_stats"][k]), np.asarray(mg["batch_stats"][k]),
            rtol=1e-6, atol=1e-7)
    # eval mode
    ref_e = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=dtype)
    got_e = GroupedBatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=dtype, groups=1)
    yr = ref_e.apply(vars_, x)
    yg = got_e.apply(vars_, x)
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(yg))


def test_grouped_matches_sequential_passes():
    G, B = 3, 4
    rs = np.random.RandomState(2)
    views = [jnp.asarray(rs.randn(B, 3, 3, 5) * (i + 1), jnp.float32)
             for i in range(G)]
    stacked = jnp.concatenate(views, axis=0)

    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    grp = GroupedBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, groups=G)
    vars_ = ref.init(jax.random.PRNGKey(0), views[0])
    vars_ = jax.tree.map(
        lambda a: jnp.asarray(rs.randn(*a.shape), a.dtype), vars_)

    # sequential reference: G separate passes, stats threaded through
    seq_out, state = [], vars_
    for v in views:
        y, mut = ref.apply({"params": vars_["params"],
                            "batch_stats": state["batch_stats"]},
                           v, mutable=["batch_stats"])
        seq_out.append(y)
        state = {"params": vars_["params"],
                 "batch_stats": mut["batch_stats"]}

    yg, mg = grp.apply(vars_, stacked, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(jnp.concatenate(seq_out, 0)),
                               np.asarray(yg), rtol=1e-6, atol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(state["batch_stats"][k]),
            np.asarray(mg["batch_stats"][k]), rtol=1e-6, atol=1e-7)
