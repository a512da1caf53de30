import jax
import jax.numpy as jnp
import numpy as np

from hawkeye_tpu.data.mixup import mixup_cutmix
from hawkeye_tpu.data.transforms_device import (
    hflip,
    make_eval_transform,
    make_train_augment,
    normalize,
    random_erase,
    sample_rrc_boxes,
)


def test_train_augment_shapes_and_stats():
    aug = make_train_augment(image_size=32, erase_prob=0.5)
    batch = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (4, 48, 48, 3), np.uint8)
    )
    out = aug(jax.random.PRNGKey(0), batch)
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    # normalized: roughly zero-mean-ish for uniform noise input
    assert abs(float(out.mean())) < 2.0
    # different keys -> different outputs
    out2 = aug(jax.random.PRNGKey(1), batch)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_eval_transform_center_crop():
    prep = make_eval_transform(image_size=24)
    batch = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (2, 32, 32, 3), np.uint8)
    )
    out = prep(batch)
    assert out.shape == (2, 24, 24, 3)
    # deterministic
    out2 = prep(batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_hflip_mask():
    imgs = jnp.arange(2 * 1 * 4 * 1, dtype=jnp.float32).reshape(2, 1, 4, 1)
    flipped = hflip(jax.random.PRNGKey(0), imgs, prob=1.0)
    np.testing.assert_allclose(np.asarray(flipped), np.asarray(imgs[:, :, ::-1, :]))
    same = hflip(jax.random.PRNGKey(0), imgs, prob=0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(imgs))


def test_random_erase_zeroes_rectangle():
    imgs = jnp.ones((4, 16, 16, 3))
    out = random_erase(jax.random.PRNGKey(3), imgs, prob=1.0, value=0.0)
    out = np.asarray(out)
    for b in range(4):
        assert (out[b] == 0).any(), "each image should have an erased region"
    out_none = np.asarray(random_erase(jax.random.PRNGKey(3), imgs, prob=0.0))
    assert (out_none == 1).all()


def test_rrc_boxes_within_bounds():
    boxes = sample_rrc_boxes(jax.random.PRNGKey(0), 64, 48, 48)
    boxes = np.asarray(boxes)
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 1] >= 0).all()
    assert (boxes[:, 0] + boxes[:, 2] <= 48 + 1e-3).all()
    assert (boxes[:, 1] + boxes[:, 3] <= 48 + 1e-3).all()


def test_mixup_cutmix_soft_labels():
    imgs = jnp.ones((4, 8, 8, 3))
    labels = jnp.array([0, 1, 2, 3])
    out_img, out_lab = mixup_cutmix(
        jax.random.PRNGKey(0), imgs, labels, num_classes=5, p=1.0
    )
    assert out_img.shape == imgs.shape
    assert out_lab.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(out_lab.sum(-1)), 1.0, rtol=1e-5)
    # p=0 -> hard one-hot
    _, lab0 = mixup_cutmix(jax.random.PRNGKey(0), imgs, labels, num_classes=5, p=0.0)
    assert (np.asarray(lab0).max(-1) == 1.0).all()
