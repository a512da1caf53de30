"""Failure-recovery subsystem: crash mid-epoch → emergency checkpoint
(reference train.py:17-34 semantics)."""

import glob
import os

import pytest

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.engine import Trainer


class ExplodingTrainer(Trainer):
    def on_end_batch(self, metrics):
        raise RuntimeError("injected failure")


def _cfg(tmp_path):
    cfg = ConfigNode({
        "experiment": {"name": "boom", "log_dir": str(tmp_path), "seed": 0,
                       "debug": True},
        "dataset": {"name": "synthetic", "length": 16, "batch_size": 8,
                    "num_workers": 0,
                    "transformer": {"image_size": 32, "resize_size": 36}},
        "model": {"name": "ResNet18", "num_classes": 4},
        "train": {"epoch": 2,
                  "optimizer": {"name": "SGD", "lr": 0.01},
                  "scheduler": {"name": "CosineAnnealingLR", "T_max": 2},
                  "criterion": {"name": "CrossEntropyLoss"}},
    })
    cfg.freeze()
    return cfg


def test_crash_writes_emergency_checkpoint(tmp_path):
    trainer = ExplodingTrainer(_cfg(tmp_path))
    with pytest.raises(RuntimeError, match="injected failure"):
        trainer.train()
    ckpts = glob.glob(os.path.join(trainer.log_root, "checkpoint_*.msgpack"))
    assert ckpts, "emergency checkpoint missing after crash"

    # and the checkpoint is resumable
    cfg2 = _cfg(tmp_path).clone().defrost()
    cfg2.experiment.name = "boom_resume"
    cfg2.experiment.resume = ckpts[0]
    cfg2.freeze()
    t2 = Trainer(cfg2)
    t2.train()  # completes


def test_emergency_save_is_synchronous_under_async_checkpoint(tmp_path):
    """With train.async_checkpoint: true a crash must still leave a complete
    checkpoint on disk: the emergency path forces a sync write + drains the
    queue (a daemon writer thread dies with the process)."""
    raw = _cfg(tmp_path).to_dict()
    raw["train"]["async_checkpoint"] = True
    cfg = ConfigNode(raw)
    cfg.freeze()
    trainer = ExplodingTrainer(cfg)
    with pytest.raises(RuntimeError, match="injected failure"):
        trainer.train()
    # no join here on purpose: the file must already be fully on disk
    ckpts = glob.glob(os.path.join(trainer.log_root, "checkpoint_epoch_*.msgpack"))
    ckpts = [c for c in ckpts if not c.endswith(".tmp")]
    assert ckpts, "emergency checkpoint missing"
    from hawkeye_tpu.engine import checkpoint as ckpt

    epoch, variables, _, _, _ = ckpt.load_checkpoint(
        ckpts[0], variables_like=trainer.model_variables(),
        opt_state_like=trainer.state.opt_state)
    assert variables["params"]
