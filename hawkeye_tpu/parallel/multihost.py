"""Multi-host data parallelism helpers.

Single-host DP covers the reference's capability surface (its only
parallelism is one-process DataParallel, SURVEY §2.7); these helpers extend
the same SPMD design across hosts: every process loads its slice of each
global batch (host data loading sharded per process, DCN only carries
gradients via the usual all-reduce).

Untestable on this single-host image beyond logic tests; the pattern follows
the standard `jax.make_array_from_process_local_data` recipe.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


class ProcessShardedBatchSampler:
    """Wrap a batch sampler so each process yields only its slice.

    The inner sampler must be deterministic given ``set_epoch`` (our
    RandomBatchSampler/BalancedBatchSampler are) so all processes agree on
    the global order.
    """

    def __init__(self, inner, process_index=None, process_count=None):
        self.inner = inner
        self.process_index = (jax.process_index()
                              if process_index is None else process_index)
        self.process_count = (jax.process_count()
                              if process_count is None else process_count)

    def set_epoch(self, epoch):
        if hasattr(self.inner, "set_epoch"):
            self.inner.set_epoch(epoch)

    def __iter__(self):
        n = self.process_count
        i = self.process_index
        for batch in self.inner:
            per = len(batch) // n
            assert per > 0, "global batch smaller than process count"
            yield np.asarray(batch[i * per:(i + 1) * per])

    def __len__(self):
        return len(self.inner)


def global_batch_from_local(mesh, local_batch: dict, axis_name="data") -> dict:
    """Assemble a globally-sharded batch from per-process local arrays."""
    out = {}
    for k, v in local_batch.items():
        arr = np.asarray(v)
        spec = P(axis_name) if arr.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out
