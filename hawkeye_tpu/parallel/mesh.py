"""Device mesh and data-parallel sharding.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
over listed GPUs (``train.py:220-228``). The TPU-native equivalent (SURVEY
§2.7) is SPMD data parallelism over a 1-D ``jax.sharding.Mesh``: the batch is
sharded over the ``data`` axis, parameters are replicated, and XLA inserts
the gradient all-reduce over ICI automatically when the jitted train step
reduces over the (sharded) batch axis.

One deliberate improvement over the reference: because the train step is a
single logical SPMD program, BatchNorm statistics are computed over the
GLOBAL batch (sync-BN) rather than per-replica. This is noted in SURVEY §7's
parity list as the documented choice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name="data") -> NamedSharding:
    """Leading-axis sharding for input batches."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis_name="data") -> dict:
    """Put a host batch dict onto the mesh, sharded along the batch axis.

    Requires the global batch size to divide the device count (the samplers
    produce fixed-size batches; configs must choose batch_size accordingly).
    """
    n = mesh.devices.size
    sharding = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] % n == 0:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.device_put(v, rep)
    return out


def shard_stacked_batch(mesh: Mesh, batch: dict, axis_name="data") -> dict:
    """Put a K-step stacked batch dict [K, B, ...] onto the mesh, sharded
    along the PER-STEP batch axis (axis 1); the leading scan axis stays
    unsharded. Used by the multi-step-per-dispatch train block."""
    n = mesh.devices.size
    sharding = NamedSharding(mesh, P(None, axis_name))
    rep = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 2 and v.shape[1] % n == 0:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.device_put(v, rep)
    return out


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params/optimizer state) across the mesh."""
    rep = replicated(mesh)
    return jax.device_put(tree, rep)
