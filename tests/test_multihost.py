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
