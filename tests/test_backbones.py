import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hawkeye_tpu.models  # noqa: F401  (registers backbones/methods)
from hawkeye_tpu.registry import BACKBONE, MODEL


@pytest.fixture(scope="module")
def x32():
    return jnp.zeros((2, 64, 64, 3), jnp.float32)


def test_resnet50_shapes(x32):
    model = BACKBONE.get("resnet50")(num_classes=10)
    variables = model.init(jax.random.PRNGKey(0), x32, train=False)
    out = model.apply(variables, x32, train=False)
    assert out["c2"].shape == (2, 16, 16, 256)
    assert out["c5"].shape == (2, 2, 2, 2048)
    assert out["pool"].shape == (2, 2048)
    assert out["logits"].shape == (2, 10)
    assert out["logits"].dtype == jnp.float32


def test_resnet18_and_next_shapes(x32):
    m18 = BACKBONE.get("resnet18")(num_classes=0)
    v = m18.init(jax.random.PRNGKey(0), x32)
    out = m18.apply(v, x32)
    assert out["c5"].shape == (2, 2, 2, 512)

    mx = BACKBONE.get("resnext50_32x4d")(num_classes=0)
    v = mx.init(jax.random.PRNGKey(0), x32)
    out = mx.apply(v, x32)
    assert out["c5"].shape == (2, 2, 2, 2048)


def test_resnet_train_updates_batch_stats(x32):
    model = BACKBONE.get("resnet18")(num_classes=5)
    variables = model.init(jax.random.PRNGKey(0), x32, train=True)
    before = variables["batch_stats"]["bn1"]["mean"]
    x = jnp.ones_like(x32)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_vgg16_shapes():
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    model = BACKBONE.get("vgg16")(num_classes=7)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["features"].shape == (2, 14, 14, 512)  # relu5_3, pre-pool5 (28x28 at 448)
    assert out["pooled_features"].shape == (2, 7, 7, 512)
    assert out["logits"].shape == (2, 7)


def test_vgg16bn_has_batchstats():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    model = BACKBONE.get("vgg16_bn")(num_classes=0)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables


def test_baseline_model_registry(x32):
    model = MODEL.get("ResNet50")(type("C", (), {"num_classes": 11})())
    variables = model.init(jax.random.PRNGKey(0), x32, train=False)
    out = model.apply(variables, x32, train=False)
    assert out["logits"].shape == (2, 11)


def test_resnet_jits(x32):
    model = BACKBONE.get("resnet18")(num_classes=4)
    variables = model.init(jax.random.PRNGKey(0), x32, train=False)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)["logits"]

    out = fwd(variables, x32)
    assert out.shape == (2, 4)


def test_space_to_depth_stem_matches_standard_stem():
    """The s2d stem is the same math as Conv(64, 7x7, /2, pad 3).

    Same param tree (conv1/kernel, (7,7,3,64)) so checkpoints interchange;
    outputs agree to float32 rounding on a shared parameter set.
    """
    import numpy as np

    f = BACKBONE.get("resnet18")
    m_std = f(num_classes=0, dtype=jnp.float32)
    m_s2d = f(num_classes=0, dtype=jnp.float32, stem_space_to_depth=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    v = m_std.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m_s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    y1 = m_std.apply(v, x, train=False)
    y2 = m_s2d.apply(v, x, train=False)
    assert float(jnp.abs(y1["stem"] - y2["stem"]).max()) < 1e-5
    assert float(jnp.abs(y1["pool"] - y2["pool"]).max()) < 1e-5
