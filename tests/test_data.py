import numpy as np
import pytest
from PIL import Image

from hawkeye_tpu.data import (
    BalancedBatchSampler,
    DataLoader,
    FGDataset,
    RandomBatchSampler,
    SyntheticDataset,
    build_transforms,
    parse_metadata,
)
from hawkeye_tpu.config import ConfigNode


@pytest.fixture
def image_tree(tmp_path):
    root = tmp_path / "images"
    meta = tmp_path / "meta"
    meta.mkdir()
    lines = []
    rng = np.random.RandomState(0)
    for c in range(3):
        d = root / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.randint(0, 255, (37 + c, 41 + i, 3), np.uint8)
            p = d / f"img_{i}.jpg"
            Image.fromarray(arr).save(p)
            lines.append(f"{c} class_{c}/img_{i}.jpg")
    (meta / "train.txt").write_text("\n".join(lines) + "\n")
    return str(root), str(meta / "train.txt")


def test_parse_metadata_space_and_comma(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text("0 a/b.jpg\n2 c d.jpg\n")
    labels, paths = parse_metadata(str(p))
    assert labels.tolist() == [0, 2]
    assert paths == ["a/b.jpg", "c d.jpg"]
    p2 = tmp_path / "m2.txt"
    p2.write_text("1,x.jpg\n")
    labels, paths = parse_metadata(str(p2))
    assert labels.tolist() == [1] and paths == ["x.jpg"]


def test_fgdataset_host_transform(image_tree):
    root, meta = image_tree
    cfg = ConfigNode({"image_size": 32, "resize_size": 36})
    train_t, eval_t = build_transforms(cfg)
    ds = FGDataset(root, meta, transform=train_t)
    assert len(ds) == 12
    assert ds.num_classes == 3
    item = ds[0]
    assert item["img"].shape == (32, 32, 3)
    assert item["img"].dtype == np.float32
    ds_eval = FGDataset(root, meta, transform=eval_t, return_id=True)
    item = ds_eval[5]
    assert item["img"].shape == (32, 32, 3)
    assert item["id"] == 5


def test_fgdataset_decode_mode(image_tree):
    root, meta = image_tree
    ds = FGDataset(root, meta, decode_size=40)
    item = ds[3]
    assert item["img"].shape == (40, 40, 3)
    assert item["img"].dtype == np.uint8


def test_dataloader_prefetch(image_tree):
    root, meta = image_tree
    ds = FGDataset(root, meta, decode_size=24)
    sampler = RandomBatchSampler(len(ds), batch_size=4, drop_last=True, seed=1)
    loader = DataLoader(ds, sampler, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3 == len(loader)
    assert batches[0]["img"].shape == (4, 24, 24, 3)
    assert batches[0]["label"].shape == (4,)
    # epochs reshuffle
    loader.set_epoch(0)
    first = [b["label"].tolist() for b in loader]
    loader.set_epoch(1)
    second = [b["label"].tolist() for b in loader]
    assert first != second


def test_balanced_batch_sampler():
    labels = np.repeat(np.arange(10), 20)  # 10 classes x 20 samples
    sampler = BalancedBatchSampler(labels, n_classes=5, n_samples=2, seed=0)
    assert len(sampler) == 200 // 10
    for batch in sampler:
        assert len(batch) == 10
        classes, counts = np.unique(labels[batch], return_counts=True)
        assert len(classes) == 5
        assert (counts == 2).all()


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset(length=8, num_classes=4, image_size=16)
    a, b = ds[3], ds[3]
    assert np.array_equal(a["img"], b["img"])
    assert a["label"] == b["label"]
    assert ds[0]["img"].shape == (16, 16, 3)
