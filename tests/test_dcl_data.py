import numpy as np

from hawkeye_tpu.data.dcl import (
    DCLCommonAug,
    DCLTrainCollate,
    DCLValCollate,
    apply_jigsaw,
    identity_law,
    neighborhood_permutation,
    subsample_per_class,
    swap_law,
)


def test_neighborhood_permutation_locality():
    rng = np.random.RandomState(0)
    for _ in range(10):
        perm = neighborhood_permutation(rng, grid=7, ran=2)
        assert sorted(perm.tolist()) == list(range(49))
        # locality: each patch moves at most ~2 cells in row and col (the
        # argsort construction bounds displacement by 2*ran)
        src_r, src_c = perm // 7, perm % 7
        dst = np.arange(49)
        dst_r, dst_c = dst // 7, dst % 7
        assert np.abs(src_r - dst_r).max() <= 4
        assert np.abs(src_c - dst_c).max() <= 4


def test_apply_jigsaw_roundtrip():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (28, 28, 3), np.uint8)
    perm = neighborhood_permutation(rng, grid=7)
    swapped = apply_jigsaw(img, perm, grid=7)
    # applying the inverse permutation restores the image
    inv = np.argsort(perm)
    restored = apply_jigsaw(swapped, inv, grid=7)
    np.testing.assert_array_equal(restored, img)
    # identity permutation is a no-op
    np.testing.assert_array_equal(apply_jigsaw(img, np.arange(49)), img)


def test_swap_law_values():
    law = identity_law(7)
    assert law[24] == 0.0
    assert abs(law[0] - (-24 / 49)) < 1e-6
    perm = np.arange(49)[::-1].copy()
    law2 = swap_law(perm, 7)
    assert law2[0] == (48 - 24) / 49


def test_train_collate_layout():
    rng = np.random.RandomState(0)
    items = [{"img": rng.randint(0, 255, (28, 28, 3), np.uint8), "label": i}
             for i in range(3)]
    collate = DCLTrainCollate(grid=7, cls_2=True, seed=0)
    batch = collate(items)
    assert batch["img"].shape == (6, 28, 28, 3)
    assert batch["label"].tolist() == [0, 1, 2, 0, 1, 2]
    assert batch["label_swap"].tolist() == [1, 1, 1, 0, 0, 0]
    assert batch["swap_law"].shape == (6, 49)
    # unswapped laws are identity
    np.testing.assert_allclose(batch["swap_law"][0], identity_law(7))


def test_val_collate():
    rng = np.random.RandomState(0)
    items = [{"img": rng.randint(0, 255, (28, 28, 3), np.uint8), "label": 5}]
    batch = DCLValCollate(grid=7, cls_2=True)(items)
    assert batch["img"].shape == (1, 28, 28, 3)
    assert batch["label_swap"].tolist() == [1]


def test_common_aug_shapes():
    from PIL import Image

    img = Image.fromarray(np.zeros((100, 80, 3), np.uint8))
    out = DCLCommonAug(resize_size=64, crop_size=56, train=True)(img)
    assert out.shape == (56, 56, 3) and out.dtype == np.uint8
    out = DCLCommonAug(resize_size=64, crop_size=56, train=False)(img)
    assert out.shape == (56, 56, 3)


def test_subsample_per_class():
    labels = np.repeat(np.arange(5), 20)
    keep = subsample_per_class(labels, fraction=0.1, seed=0)
    assert len(keep) == 10  # 2 per class
    kept_labels = labels[keep]
    assert (np.bincount(kept_labels, minlength=5) == 2).all()
