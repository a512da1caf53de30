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
            batch = np.asarray(batch, dtype=np.int64)
            rem = (-len(batch)) % n
            if rem:
                # Pad the GLOBAL batch to a process multiple instead of
                # truncating (a drop_last=False val tail must still be
                # evaluated exactly once on some host). Padding indices are
                # encoded as -1 - idx; PaddingAwareDataset decodes them and
                # marks the row weight 0 so it never counts.
                pad = np.full((rem,), -1 - int(batch[-1]), dtype=np.int64)
                batch = np.concatenate([batch, pad])
            per = len(batch) // n
            yield batch[i * per:(i + 1) * per]

    def __len__(self):
        return len(self.inner)


class PaddingAwareDataset:
    """Decodes ProcessShardedBatchSampler's encoded padding indices.

    Real index i → item + weight 1; encoded pad (-1 - i) → a copy of item i
    with weight 0, so the padded row flows through collate/prepare_batch and
    is masked out of every loss/metric."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        idx = int(idx)
        pad = idx < 0
        if pad:
            idx = -1 - idx
        item = dict(self.dataset[idx])
        item["weight"] = np.float32(0.0 if pad else 1.0)
        return item


def global_batch_from_local(mesh, local_batch: dict, axis_name="data") -> dict:
    """Assemble a globally-sharded batch from per-process local arrays."""
    out = {}
    for k, v in local_batch.items():
        arr = np.asarray(v)
        spec = P(axis_name) if arr.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out
