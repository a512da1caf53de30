import numpy as np

from hawkeye_tpu.data.sampler import RandomBatchSampler
from hawkeye_tpu.parallel.multihost import ProcessShardedBatchSampler


def test_process_shards_partition_the_batch():
    inner = RandomBatchSampler(64, batch_size=16, seed=0)
    shards = [
        list(ProcessShardedBatchSampler(inner, process_index=i, process_count=4))
        for i in range(4)
    ]
    inner.set_epoch(0)
    full = list(inner)
    for b, batch in enumerate(full):
        got = np.concatenate([shards[i][b] for i in range(4)])
        np.testing.assert_array_equal(got, batch)
        assert all(len(shards[i][b]) == 4 for i in range(4))


def test_epoch_consistency_across_processes():
    inner_a = RandomBatchSampler(32, batch_size=8, seed=1)
    inner_b = RandomBatchSampler(32, batch_size=8, seed=1)
    sa = ProcessShardedBatchSampler(inner_a, 0, 2)
    sb = ProcessShardedBatchSampler(inner_b, 1, 2)
    sa.set_epoch(3)
    sb.set_epoch(3)
    a = list(sa)
    b = list(sb)
    for x, y in zip(a, b):
        assert set(x.tolist()).isdisjoint(y.tolist())


def test_val_tail_padded_not_truncated():
    """A drop_last=False tail smaller than / not divisible by the process
    count is padded with weight-0 rows, never silently dropped (ADVICE r1)."""
    from hawkeye_tpu.data.sampler import SequentialBatchSampler
    from hawkeye_tpu.parallel.multihost import PaddingAwareDataset

    inner = SequentialBatchSampler(10, batch_size=4, drop_last=False)  # tail=2
    shards = [
        list(ProcessShardedBatchSampler(inner, process_index=i, process_count=4))
        for i in range(4)
    ]
    seen = []
    for b in range(len(shards[0])):
        for i in range(4):
            seen.extend(shards[i][b].tolist())
    decoded = [(-1 - s) if s < 0 else s for s in seen]
    real = [s for s in seen if s >= 0]
    # every dataset index appears exactly once as a REAL (non-pad) index
    assert sorted(real) == list(range(10))
    # pads decode to valid indices
    assert all(0 <= d < 10 for d in decoded)

    class _DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"label": np.int64(i)}

    ds = PaddingAwareDataset(_DS())
    item_real = ds[3]
    item_pad = ds[-1 - 3]
    assert item_real["weight"] == 1.0 and item_real["label"] == 3
    assert item_pad["weight"] == 0.0 and item_pad["label"] == 3


def test_trainer_simulated_two_processes(tmp_path):
    """Logic-level multi-host wiring: two Trainer instances configured as
    process 0/1 of 2 together cover every sample exactly once per epoch."""
    import hawkeye_tpu.models  # noqa: F401
    from hawkeye_tpu.config import ConfigNode
    from hawkeye_tpu.engine import Trainer

    def cfg(i):
        c = ConfigNode({
            "experiment": {"name": f"mh{i}", "log_dir": str(tmp_path / f"mh{i}"),
                           "seed": 0, "debug": True},
            "dataset": {"name": "synthetic", "length": 20, "batch_size": 8,
                        "num_workers": 0, "num_processes": 2,
                        "process_index": i,
                        "transformer": {"image_size": 32, "resize_size": 36}},
            "model": {"name": "ResNet18", "num_classes": 4},
            "train": {"epoch": 1,
                      "optimizer": {"name": "SGD", "lr": 0.01},
                      "scheduler": {"name": "CosineAnnealingLR", "T_max": 1},
                      "criterion": {"name": "CrossEntropyLoss"}},
        })
        c.freeze()
        return c

    t0, t1 = Trainer(cfg(0)), Trainer(cfg(1))
    # synthetic val split is length//4 = 5 samples, drop_last=False → one
    # global batch of 5, padded to 6 → 3 rows per process, one weight-0 pad
    counts = []
    for t in (t0, t1):
        n = 0.0
        for batch in t.dataloaders["val"]:
            db = t.prepare_batch(batch, train=False)
            n += float(np.asarray(db["weight"]).sum())
        counts.append(n)
    assert sum(counts) == 5.0, counts
    # and one train step runs end-to-end on the local slice
    m0 = t0.validate()
    assert "acc" in m0


def test_pad_target_is_per_process():
    """Eval pad target is the per-process share of the batch (padding each
    local slice to the GLOBAL batch size would inflate the assembled batch
    by process_count x), rounded to the LOCAL device multiple."""
    from hawkeye_tpu.engine.trainer import pad_target

    # single host: unchanged semantics
    assert pad_target(5, train=True, batch_size=32, n_devices=8) == 8
    assert pad_target(3, train=False, batch_size=32, n_devices=8) == 32
    # 16 hosts x 1 chip, global bs 256: local eval slice pads to 16, not 256
    assert pad_target(16, train=False, batch_size=256, n_devices=16,
                      process_count=16) == 16
    assert pad_target(7, train=False, batch_size=256, n_devices=16,
                      process_count=16) == 16
    # 4 hosts x 8 chips, global bs 64: local 16 rows already an 8-multiple —
    # no padding (the old global-devices rounding would have padded to 32,
    # duplicating rows into BatchNorm statistics)
    assert pad_target(16, train=True, batch_size=64, n_devices=32,
                      process_count=4) == 16
    # tail rounding still goes to the local device multiple
    assert pad_target(13, train=True, batch_size=64, n_devices=32,
                      process_count=4) == 16


def test_dcl_collates_preserve_padding_weights():
    """DCL collates must carry PaddingAwareDataset's weight-0 marks through
    (a padded val-tail row must not count twice in accuracy)."""
    import numpy as np

    from hawkeye_tpu.data.dcl import (DCLBackboneCollate, DCLTestCollate,
                                      DCLTrainCollate, DCLValCollate)

    items = [
        {"img": np.zeros((56, 56, 3), np.uint8), "label": 1,
         "weight": np.float32(1.0)},
        {"img": np.zeros((56, 56, 3), np.uint8), "label": 1,
         "weight": np.float32(0.0)},  # multi-host padding row
    ]
    train = DCLTrainCollate(grid=7)(items)
    np.testing.assert_array_equal(train["weight"], [1, 0, 1, 0])  # 2x batch
    for collate in (DCLValCollate(grid=7), DCLBackboneCollate(),
                    DCLTestCollate()):
        out = collate(items)
        np.testing.assert_array_equal(out["weight"], [1, 0])
    # items without the key default to weight 1
    plain = [{"img": np.zeros((56, 56, 3), np.uint8), "label": 0}]
    np.testing.assert_array_equal(DCLValCollate(grid=7)(plain)["weight"], [1])
