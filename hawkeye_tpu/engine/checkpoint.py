"""Checkpoint save/load.

Reference semantics to preserve (``train.py:369-395``, SURVEY §5):
- ``save_model``: weights only (``model_epoch_N`` / ``best_model``), loadable
  into a *fresh* model via ``config.model.load`` — used by two-stage recipes
  (``configs/BCNN_S2.yaml`` loads stage-1 best).
- ``save_checkpoint``: full state {epoch, model, optimizer, scheduler} for
  ``experiment.resume``.
- ``emergency_save``: on crash/interrupt, write the full checkpoint.

Format: flax msgpack bytes (``flax.serialization``), extension ``.msgpack``.
``load_weights_into`` also accepts torchvision ``.pth`` files (converted via
``models/weights.py``) so ImageNet-pretrained backbones can be injected.
"""

from __future__ import annotations

import json
import os
import queue
import threading

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


# -- async writes -----------------------------------------------------------
# The device->host transfer is always synchronous (the arrays are immutable
# snapshots once on host); only serialization + disk IO move off-thread.
# A single worker thread draining a FIFO queue guarantees that two saves to
# the same path land in submission order (a plain lock per write would not:
# Python lock wakeup order is unspecified, so a newer best_model write could
# be overtaken by an older one still queued).
_tasks: queue.Queue = queue.Queue()
_worker_guard = threading.Lock()
_worker: threading.Thread | None = None


def _worker_loop():
    while True:
        fn = _tasks.get()
        try:
            fn()
        except Exception:
            import traceback

            traceback.print_exc()
        finally:
            _tasks.task_done()


def _write_async(fn):
    global _worker
    with _worker_guard:
        if _worker is None or not _worker.is_alive():
            _worker = threading.Thread(target=_worker_loop, daemon=True)
            _worker.start()
    _tasks.put(fn)


def wait_for_pending_writes():
    """Block until every async checkpoint write has hit disk (call before
    reading a just-saved file, at teardown, and on the emergency-save path —
    the worker is a daemon thread, so process exit without this call can
    drop queued writes)."""
    _tasks.join()


def save_model(path, variables, async_write=False):
    """Weights-only save: ALL variable collections, msgpack.

    Saving every collection (not just params/batch_stats) matters for
    methods with non-gradient state — e.g. ProtoTree's learned leaf
    distributions live in the 'tree_leaves' collection
    (``models/methods/prototree.py:115-117``); dropping them would reload
    uniform leaves (chance-level predictions).

    ``async_write=True`` snapshots to host synchronously and moves
    serialization + disk IO to a background thread (large models; see
    ``wait_for_pending_writes``).

    Collections named ``*_cache`` are derived constants (e.g. CBCNN's
    precomputed inverse-rDFT matrices, ~72 MB) — deterministic functions of
    the model config, re-created at init. They are skipped on save;
    ``load_model``'s partial merge keeps the freshly-initialized value."""
    host = _to_host({k: v for k, v in dict(variables).items()
                     if not str(k).endswith("_cache")})

    def write():
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(host))
        os.replace(tmp, path)

    if async_write:
        _write_async(write)
    else:
        write()


def load_model(path, target_variables, logger=None, strict=False):
    """Shape-checked partial load of a weights-only file into variables.

    Mirrors the reference's partial ``load_state_dict`` semantics
    (``model/utils.py:28-33``): tensors whose path+shape match are copied,
    everything else is kept and reported.
    """
    from ..models.weights import merge_into

    if path.endswith((".pth", ".pt")):
        raise ValueError(
            "raw torch checkpoints must be converted per-backbone; use "
            "models.weights.convert_torchvision_* + merge_into")
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    flat_params = {
        "/".join(k): v for k, v in flatten_dict(raw.get("params", {})).items()
    }
    flat_stats = {
        "/".join(k): v for k, v in flatten_dict(raw.get("batch_stats", {})).items()
    }
    # extra (non-gradient) collections, e.g. ProtoTree 'tree_leaves'
    flat_other = {
        col: {"/".join(k): v for k, v in flatten_dict(raw[col]).items()}
        for col in raw
        if col not in ("params", "batch_stats")
    }
    merged, report = merge_into(target_variables, flat_params, flat_stats,
                                flat_other=flat_other, logger=logger)
    if strict and (report["skipped_missing"] or report["skipped_shape"]):
        raise ValueError(f"strict load failed: {report}")
    return merged


def save_checkpoint(path, *, epoch, variables, opt_state, scheduler_state=None,
                    extra=None, async_write=False):
    """Full training state (model + optimizer + scheduler + counters)."""
    payload = {
        "epoch": np.asarray(epoch),
        # *_cache collections are derived constants — see save_model;
        # load_checkpoint keeps the target's init value for absent ones
        "variables": _to_host({k: v for k, v in dict(variables).items()
                               if not str(k).endswith("_cache")}),
        "opt_state": _to_host(serialization.to_state_dict(opt_state)),
    }
    meta = {"scheduler": scheduler_state or {}, "extra": extra or {}}

    def write():
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(payload))
        os.replace(tmp, path)
        # meta is replaced atomically too: a crash can pair a new payload
        # with the previous meta (benign: epoch lives in the payload), but
        # never with a truncated/partial JSON
        meta_tmp = path + ".meta.json.tmp"
        with open(meta_tmp, "w") as f:
            json.dump(meta, f)
        os.replace(meta_tmp, path + ".meta.json")

    if async_write:
        _write_async(write)
    else:
        write()


def load_checkpoint(path, *, variables_like, opt_state_like):
    """Restore a checkpoint written by ``save_checkpoint``.

    Returns (epoch, variables, opt_state, scheduler_state, extra).
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    epoch = int(raw["epoch"])
    # restore every collection the checkpoint carries; collections present
    # only in the target (older checkpoints) keep their init values
    saved = raw["variables"]
    variables = dict(variables_like)
    for col in variables_like:
        if col in saved:
            variables[col] = serialization.from_state_dict(
                variables_like[col], saved[col])
    opt_state = serialization.from_state_dict(opt_state_like, raw["opt_state"])
    meta_path = path + ".meta.json"
    scheduler_state, extra = {}, {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        scheduler_state = meta.get("scheduler", {})
        extra = meta.get("extra", {})
    return epoch, variables, opt_state, scheduler_state, extra
