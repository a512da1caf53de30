from .mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
    shard_stacked_batch,
)
from .multihost import (
    PaddingAwareDataset,
    ProcessShardedBatchSampler,
    global_batch_from_local,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_stacked_batch",
    "replicate_tree",
    "PaddingAwareDataset",
    "ProcessShardedBatchSampler",
    "global_batch_from_local",
]
