"""End-to-end Trainer/Tester tests on a virtual multi-device CPU mesh with
synthetic data (SURVEY §4 recommended strategy, items (c)/(d))."""

import glob
import os

import numpy as np
import pytest

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.engine import Tester, Trainer


def make_config(tmp_path, name="t", epochs=2, **overrides):
    cfg = ConfigNode({
        "experiment": {"name": name, "log_dir": str(tmp_path / "logs"), "seed": 0},
        "dataset": {
            "name": "synthetic",
            "length": 32,
            "batch_size": 8,
            "num_workers": 0,
            "transformer": {"image_size": 32, "resize_size": 36},
        },
        "model": {"name": "ResNet18", "num_classes": 4},
        "train": {
            "epoch": epochs,
            "save_frequence": epochs,
            "optimizer": {"name": "SGD", "lr": 0.01, "momentum": 0.9,
                          "weight_decay": 0.0001},
            "scheduler": {"name": "CosineAnnealingLR", "T_max": epochs},
            "criterion": {"name": "CrossEntropyLoss"},
        },
    })
    for k, v in overrides.items():
        node = cfg
        *parents, leaf = k.split(".")
        for p in parents:
            node = node[p]
        node[leaf] = v
    cfg.freeze()
    return cfg


def test_multidevice_mesh_available():
    import jax

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


def test_trainer_end_to_end(tmp_path):
    cfg = make_config(tmp_path, "e2e")
    trainer = Trainer(cfg)
    assert trainer.n_devices == 8
    trainer.train()
    # meters recorded both epochs
    assert len(trainer.performance_meters["val"]["acc"].values) == 2
    # artifacts: snapshot, report, model saves, checkpoint
    log_root = trainer.log_root
    assert os.path.exists(os.path.join(log_root, "train_config.yaml"))
    assert os.path.exists(os.path.join(log_root, "report.log"))
    assert glob.glob(os.path.join(log_root, "model_epoch_*.msgpack"))
    assert glob.glob(os.path.join(log_root, "checkpoint_epoch_*.msgpack"))
    assert glob.glob(os.path.join(log_root, "best_model.msgpack"))


def test_trainer_loss_decreases(tmp_path):
    cfg = make_config(tmp_path, "learn", epochs=4,
                      **{"dataset.length": 16, "model.num_classes": 2,
                         "train.optimizer.lr": 0.05})
    trainer = Trainer(cfg)
    trainer.train()
    losses = trainer.performance_meters["train"]["loss"].values
    assert losses[-1] < losses[0], f"training did not reduce loss: {losses}"


def test_remat_conv_matches_baseline_step(tmp_path):
    """train.remat: conv is a pure memory/compute trade — in f32 the step
    outputs match the non-remat step tightly on the same batch. (In bf16 the
    checkpoint regions change XLA's fusion boundaries, so agreement is only
    to bf16 rounding — same as any recompilation.)"""
    import jax
    import numpy as np

    res = {}
    for tag, remat in (("off", False), ("conv", "conv")):
        cfg = make_config(tmp_path, f"remat_{tag}", epochs=1,
                          **{"train.remat": remat, "model.dtype": "float32"})
        trainer = Trainer(cfg)
        batch = next(iter(trainer.dataloaders["train"]))
        dev = trainer.prepare_batch(batch, train=True)
        st, m = trainer._train_step(trainer.state, dev, 0.01,
                                    *trainer.step_extras())
        res[tag] = (float(np.sum(m["loss"])),
                    np.asarray(jax.tree.leaves(st.params)[0], np.float64))
    assert res["off"][0] == pytest.approx(res["conv"][0], rel=1e-5)
    np.testing.assert_allclose(res["off"][1], res["conv"][1],
                               rtol=1e-4, atol=1e-7)


def test_remat_conv_trains(tmp_path):
    """The remat path must train end-to-end (loss decreases over epochs)."""
    cfg = make_config(tmp_path, "remat_learn", epochs=4,
                      **{"dataset.length": 16, "model.num_classes": 2,
                         "train.optimizer.lr": 0.05, "train.remat": "conv"})
    trainer = Trainer(cfg)
    trainer.train()
    losses = trainer.performance_meters["train"]["loss"].values
    assert losses[-1] < losses[0], losses


def test_resume_roundtrip(tmp_path):
    cfg = make_config(tmp_path, "resume_a", epochs=2)
    t1 = Trainer(cfg)
    t1.train()
    ckpt_path = sorted(glob.glob(os.path.join(t1.log_root, "checkpoint_*.msgpack")))[-1]

    cfg2 = make_config(tmp_path, "resume_b", epochs=3,
                       **{"experiment.resume": ckpt_path})
    cfg2.defrost()
    cfg2.experiment.resume = ckpt_path
    cfg2.freeze()
    t2 = Trainer(cfg2)
    assert t2.start_epoch == 2
    # params actually restored (not re-initialized)
    p1 = np.asarray(t1.state.params["backbone"]["conv1"]["kernel"])
    p2 = np.asarray(t2.state.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(p1, p2)
    t2.train()  # continues for 1 more epoch without error


def test_log_dir_collision_asserts(tmp_path):
    cfg = make_config(tmp_path, "dup")
    Trainer(cfg)
    with pytest.raises(AssertionError):
        Trainer(make_config(tmp_path, "dup"))


def test_tester_with_trained_model(tmp_path):
    cfg = make_config(tmp_path, "fortest")
    trainer = Trainer(cfg)
    trainer.train()
    best = os.path.join(trainer.log_root, "best_model.msgpack")

    test_cfg = ConfigNode({
        "experiment": {"name": "test"},
        "dataset": {
            "name": "synthetic",
            "length": 16,
            "batch_size": 8,
            "num_workers": 0,
            "num_classes": 4,
            "transformer": {"image_size": 32, "resize_size": 36},
        },
        "model": {"name": "ResNet18", "num_classes": 4, "load": best},
    })
    test_cfg.freeze()
    tester = Tester(test_cfg)
    acc = tester.test()
    assert 0.0 <= acc <= 100.0


def test_tester_requires_load(tmp_path):
    test_cfg = ConfigNode({
        "experiment": {"name": "test"},
        "dataset": {
            "name": "synthetic", "length": 8, "batch_size": 4, "num_workers": 0,
            "num_classes": 4,
            "transformer": {"image_size": 32},
        },
        "model": {"name": "ResNet18", "num_classes": 4},
    })
    test_cfg.freeze()
    with pytest.raises(AssertionError):
        Tester(test_cfg)


def test_interp_parts_batch_lr_resume_continuity(tmp_path):
    """A resumed Interp-Parts run continues the per-batch cosine where it
    stopped instead of replaying from the top (VERDICT r1 item 10)."""
    import importlib

    module = importlib.import_module("Examples.InterpPartsNet")
    ip_model = {"name": "IP_ResNet50", "num_classes": 4, "num_parts": 2}
    ip_crit = {"name": "InterpPartsLoss", "radius": 1, "std": 0.4,
               "alpha": 1, "beta": 0.001, "coeff": 0.5}
    cfg = make_config(tmp_path, "iplr_a", epochs=2,
                      **{"model": ip_model, "train.criterion": ip_crit,
                         "train.save_frequence": 1})
    t1 = module.InterpPartsTrainer(cfg)
    t1.train()
    steps_per_epoch = len(t1.dataloaders["train"])
    ckpt = sorted(glob.glob(os.path.join(t1.log_root, "checkpoint_*.msgpack")))[-1]

    cfg2 = make_config(tmp_path, "iplr_b", epochs=3,
                       **{"model": ip_model, "train.criterion": ip_crit})
    cfg2.defrost()
    cfg2.experiment.resume = ckpt
    cfg2.freeze()
    t2 = module.InterpPartsTrainer(cfg2)
    assert t2.start_epoch == 2
    # the first post-resume batch LR equals what a fresh run would use at the
    # same global step (2 epochs in), NOT the schedule's step-0 value
    expected_step = 2 * steps_per_epoch
    total = max(steps_per_epoch * 3, 1)
    import math as _math
    base = 0.01
    want = 0.5 * base * (1.0 + _math.cos(_math.pi * min(expected_step / total, 1.0)))
    got = t2.batch_lr(base)
    assert abs(got - want) < 1e-9
