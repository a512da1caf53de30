"""save_tree/load_tree: the functional analogue of the reference's
ProtoTree.save/save_state/load directory pickle (``prototree.py:248-269``)
round-trips the model config and every variable collection."""

import numpy as np

import jax
import jax.numpy as jnp

from hawkeye_tpu.models.methods.prototree import (ProtoTreeNet, load_tree,
                                                  save_tree)


def test_save_tree_roundtrip(tmp_path):
    model = ProtoTreeNet(num_classes=5, height=3, num_features=8,
                         backbone_name="resnet18", dtype=jnp.float32,
                         eval_sampling="sample_max")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)

    save_tree(str(tmp_path / "tree"), model, variables)
    model2, variables2 = load_tree(str(tmp_path / "tree"))

    assert model2.num_classes == 5
    assert model2.height == 3
    assert model2.eval_sampling == "sample_max"

    # every collection survives (params AND the non-gradient leaves)
    flat1 = jax.tree_util.tree_leaves_with_path(variables)
    flat2 = jax.tree_util.tree_leaves_with_path(variables2)
    assert [str(k) for k, _ in flat1] == [str(k) for k, _ in flat2]
    for (_, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out1 = model.apply(variables, x, train=False)
    out2 = model2.apply(variables2, x, train=False)
    np.testing.assert_allclose(np.asarray(out1["logits"]),
                               np.asarray(out2["logits"]), rtol=1e-6)
