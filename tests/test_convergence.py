"""Per-method synthetic-convergence matrix (VERDICT r1 item 8; SURVEY §4 (c)).

Each method overfits a 32-image synthetic set: train accuracy must clear a
bar far above the 25% chance level within a small epoch budget. This catches
dead-gradient wiring — gradients that die inside NMS gathers, peak masks,
pair mining, jigsaw gathers, or leaf updates — that shape-only tests miss.

Bars are per-method: most clear 90%; methods whose loss actively fights
memorization on random pixels (pairwise confusion, peer-learning sample
dropping, APINet's mixed-pair scores) get a documented lower bar that still
sits well above chance.

Uses the smoke matrix's tiny configs (``test_examples_smoke.CASES``).
"""

import copy
import importlib

import pytest

import hawkeye_tpu.models  # noqa: F401

from test_examples_smoke import CASES, tiny_config

# (epochs budget, train-acc bar %); default is (25, 90)
BUDGETS = {
    # pair-mining score head sees mixed pairs; self-score CE still memorizes
    "APINet": (25, 70),
    # the confusion regularizer penalizes confident memorization by design
    "PairConfusion": (25, 70),
    # peer nets drop the highest-loss fraction of every batch (noise defense)
    "PeerLearning": (25, 70),
    # frozen backbone for 30 epochs by design; prototypes + leaves must still
    # separate 4 classes of random images well above chance
    "ProtoTreeNet": (30, 60),
    # two heads at different grains; average logits converge slower
    "MGE_CNN": (35, 70),
}


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_method_overfits_synthetic(case, tmp_path):
    name, module_name, cls_name, model, criterion, kw = case
    epochs, bar = BUDGETS.get(name, (25, 90))

    module = importlib.import_module(module_name)
    trainer_cls = getattr(module, cls_name)
    kw = copy.deepcopy(kw)
    kw.setdefault("length", 32)
    kw.setdefault("batch_size", 8)
    # a fixed healthy LR for the overfit probe (recipes' own LRs are tuned
    # for real data scales); keep per-case optimizers that carry extra keys
    opt = kw.get("optimizer") or {"name": "SGD", "lr": 0.01, "momentum": 0.9}
    opt = {**opt, "lr": max(float(opt.get("lr", 0.01)), 0.01)}
    kw["optimizer"] = opt
    cfg = tiny_config(tmp_path, name, model, criterion, **kw)
    cfg.defrost()
    cfg.train.epoch = epochs
    if "T_max" in cfg.train.scheduler:
        cfg.train.scheduler.T_max = epochs
    cfg.freeze()

    trainer = trainer_cls(cfg)
    best = 0.0
    for epoch in range(epochs):
        trainer.epoch = epoch
        metrics = trainer.train_epoch(trainer.scheduler.epoch_lr(epoch))
        best = max(best, metrics["acc"])
        if best >= bar:
            break
    assert best >= bar, (
        f"{name}: best train acc {best:.1f}% < {bar}% after {epochs} epochs "
        f"— dead gradient path?"
    )
