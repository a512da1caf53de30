"""Pin the driver contract (__graft_entry__).

The round-2 regression shipped because nothing in tests/ drove
``dryrun_multichip``: ProtoTree's step inputs were only initialized in
``on_start_epoch``, which the driver path never called. These tests execute
the exact driver entry points so the contract cannot silently regress.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import __graft_entry__ as graft


def test_entry_lowers_and_compiles():
    import jax

    fn, args = graft.entry()
    # the driver compile-checks single-chip; executing 448² ResNet-50 on the
    # CPU test host is wasteful — lower+compile is the same contract
    jax.jit(fn).lower(*args).compile()


def test_dryrun_multichip_full_matrix():
    """Run the driver's dryrun exactly as the driver does (all cases)."""
    graft.dryrun_multichip(2)


def test_prototree_direct_train_epoch_without_hook():
    """The round-2 failure mode: drive train_epoch() directly, skipping
    on_start_epoch. ProtoTree must lazily initialize its step inputs."""
    import importlib
    import tempfile

    import jax

    log_root = tempfile.mkdtemp(prefix="hawkeye_dryrun_direct_")
    module_name, cls_name, cfg, *_ = graft._cases(2, log_root)["prototree"]
    trainer_cls = getattr(importlib.import_module(module_name), cls_name)
    trainer = trainer_cls(cfg)
    trainer.epoch = 0
    metrics = trainer.train_epoch(0.01)  # no on_start_epoch on purpose
    jax.block_until_ready(trainer.state.params)
    assert np.isfinite(metrics["loss"])
