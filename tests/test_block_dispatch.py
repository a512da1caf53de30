"""steps_per_dispatch (K-step scan block) equivalence tests.

The block path must compute EXACTLY the same training trajectory as
single-step dispatch: the per-step RNG derives from state.step, the LR
stream from batch_lr, and the scan body is the same pure step function.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode


def _cfg(tmp, name, k, *, length=48, batch=8, model=None, criterion=None):
    cfg = ConfigNode({
        "experiment": {"name": name, "log_dir": os.path.join(tmp, name),
                       "seed": 3, "debug": True},
        "dataset": {
            "name": "synthetic", "length": length, "batch_size": batch,
            "num_workers": 0,
            "transformer": {"image_size": 32, "resize_size": 36},
        },
        # f32: the scan-compiled and straight-line programs round identically
        # only when one bf16 ulp (~0.4%) isn't in play
        "model": model or {"name": "ResNet18", "num_classes": 4,
                           "dtype": "float32"},
        "train": {
            "epoch": 1,
            "steps_per_dispatch": k,
            "optimizer": {"name": "SGD", "lr": 0.01, "momentum": 0.9},
            "scheduler": {"name": "CosineAnnealingLR", "T_max": 1},
            "criterion": criterion or {"name": "CrossEntropyLoss"},
        },
    })
    cfg.freeze()
    return cfg


def _run(trainer):
    trainer.epoch = 0
    trainer.on_start_epoch()
    metrics = trainer.train_epoch(0.01)
    jax.block_until_ready(trainer.state.params)
    return metrics


def test_block_matches_single_step(tmp_path):
    """Per-step losses of one scan block == 3 single-step dispatches from
    the same fresh state. (Tolerances: the scan-compiled program may round
    differently from the straight-line one; from identical params the
    per-step difference is ~1e-7 relative, amplifying chaotically with
    steps — so compare early steps tightly, the trajectory loosely.)"""
    import jax.numpy as jnp

    from Examples.Baseline import BaselineTrainer

    t1 = BaselineTrainer(_cfg(str(tmp_path), "k1", 1))
    t1.epoch = 0
    losses1 = []
    loader = t1.dataloaders["train"]
    loader.set_epoch(0)
    for batch in loader:
        db = t1.prepare_batch(batch, train=True)
        t1.state, m = t1.train_step_call(db, jnp.asarray(0.01, jnp.float32))
        losses1.append(float(m["loss"]))

    # 48/8 = 6 batches, K=3 -> exactly 2 blocks, no tail
    t3 = BaselineTrainer(_cfg(str(tmp_path), "k3", 3))
    assert t3.steps_per_dispatch == 3 and t3._train_block is not None
    m3 = _run(t3)
    assert m3["count"] == 48
    assert int(t3.state.step) == 6

    losses3 = []
    t3b = BaselineTrainer(_cfg(str(tmp_path), "k3b", 3))
    t3b.epoch = 0
    loader = t3b.dataloaders["train"]
    loader.set_epoch(0)
    buf = []
    for batch in loader:
        buf.append(t3b.pad_batch(batch, train=True))
        if len(buf) == 3:
            m = t3b._dispatch_block(buf, 0.01)
            losses3.extend(np.asarray(m["loss"]).tolist())
            buf = []
    assert len(losses3) == len(losses1) == 6
    # step 0 starts from bit-identical state: near-exact
    np.testing.assert_allclose(losses1[0], losses3[0], rtol=1e-6)
    np.testing.assert_allclose(losses1[:3], losses3[:3], rtol=1e-3)
    np.testing.assert_allclose(losses1, losses3, rtol=2e-2)


def test_block_tail_dispatches_single_steps(tmp_path):
    from Examples.Baseline import BaselineTrainer

    # 40/8 = 5 batches, K=4 -> one block of 4 + a 1-step tail
    t = BaselineTrainer(_cfg(str(tmp_path), "tail", 4, length=40))
    m = _run(t)
    assert m["count"] == 40
    assert int(t.state.step) == 5


def test_block_with_step_extras_prototree(tmp_path):
    """ProtoTree threads loop-invariant extras (leaf snapshot, freeze gate)
    through the scan; the derivative-free leaf update must run per step."""
    from Examples.ProtoTreeNet import ProtoTreeTrainer

    model = {"name": "ProtoTreeNet", "num_classes": 4, "height": 3,
             "num_features": 16, "dtype": "float32",
             "backbone": {"name": "resnet18"}}
    crit = {"name": "ProtoTreeLoss"}
    t1 = ProtoTreeTrainer(_cfg(str(tmp_path), "pt1", 1, length=16, batch=8,
                               model=model, criterion=crit))
    m1 = _run(t1)
    t2 = ProtoTreeTrainer(_cfg(str(tmp_path), "pt2", 2, length=16, batch=8,
                               model=model, criterion=crit))
    m2 = _run(t2)
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-2)
    l1 = np.asarray(t1.state.extra_vars["tree_leaves"]["dist_params"])
    l2 = np.asarray(t2.state.extra_vars["tree_leaves"]["dist_params"])
    # the derivative-free update ran per scan step (non-zero mass moved)
    assert l1.sum() > 0 and l2.sum() > 0
    np.testing.assert_allclose(l1, l2, rtol=1e-2, atol=1e-3)
