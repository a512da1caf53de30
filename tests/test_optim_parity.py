"""Optimizer/scheduler parity against torch.optim — the accuracies in
results.csv depend on these minutiae (SURVEY §7 risks)."""

import numpy as np
import pytest

from hawkeye_tpu.config import ConfigNode
from hawkeye_tpu.engine.optim import (
    CosineAnnealingLR,
    MultiStepLR,
    ReduceLROnPlateau,
    StepLR,
    build_optimizer,
    build_scheduler,
)


def _run_optax(opt_cfg, grads_seq, x0):
    import jax.numpy as jnp

    tx, _ = build_optimizer(ConfigNode(opt_cfg))
    params = {"w": jnp.asarray(x0)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    return np.asarray(params["w"])


def _run_torch(torch_opt_fn, grads_seq, x0):
    import torch

    w = torch.nn.Parameter(torch.tensor(x0))
    opt = torch_opt_fn([w])
    for g in grads_seq:
        opt.zero_grad()
        w.grad = torch.tensor(g)
        opt.step()
    return w.detach().numpy()


GRADS = [np.array([0.1, -0.2, 0.3], np.float32) * (i + 1) for i in range(5)]
X0 = np.array([1.0, 2.0, -3.0], np.float32)


def test_sgd_momentum_wd_matches_torch():
    import torch

    got = _run_optax({"name": "SGD", "lr": 0.1, "momentum": 0.9,
                      "weight_decay": 0.01}, GRADS, X0)
    want = _run_torch(
        lambda p: torch.optim.SGD(p, lr=0.1, momentum=0.9, weight_decay=0.01),
        GRADS, X0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_adam_matches_torch():
    import torch

    got = _run_optax({"name": "Adam", "lr": 0.001, "weight_decay": 0.01},
                     GRADS, X0)
    want = _run_torch(
        lambda p: torch.optim.Adam(p, lr=0.001, weight_decay=0.01), GRADS, X0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_adamw_matches_torch():
    import torch

    got = _run_optax({"name": "AdamW", "lr": 0.001, "weight_decay": 0.05},
                     GRADS, X0)
    want = _run_torch(
        lambda p: torch.optim.AdamW(p, lr=0.001, weight_decay=0.05), GRADS, X0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_cosine_matches_torch_schedule():
    import torch

    base = 0.1
    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=base)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10,
                                                       eta_min=0.001)
    ours = CosineAnnealingLR(base, T_max=10, eta_min=0.001)
    for epoch in range(10):
        torch_lr = opt.param_groups[0]["lr"]
        assert abs(ours.epoch_lr(epoch) - torch_lr) < 1e-8, epoch
        sched.step()


def test_step_multistep():
    s = StepLR(1.0, step_size=3, gamma=0.1)
    assert [round(s.epoch_lr(e), 6) for e in range(7)] == [
        1.0, 1.0, 1.0, 0.1, 0.1, 0.1, 0.01]
    m = MultiStepLR(1.0, milestones=[2, 5], gamma=0.5)
    assert [m.epoch_lr(e) for e in range(6)] == [1.0, 1.0, 0.5, 0.5, 0.5, 0.25]


def test_plateau_reduces_after_patience():
    p = ReduceLROnPlateau(1.0, mode="max", factor=0.1, patience=2)
    for acc in [50.0, 51.0, 51.0, 51.0, 51.0]:
        p.step_metric(acc)
    # epochs 3,4,5 were "bad"; patience 2 exceeded at the 3rd bad epoch
    assert abs(p.epoch_lr(5) - 0.1) < 1e-9
    # improvement resets
    p.step_metric(60.0)
    p.step_metric(59.0)
    assert abs(p.epoch_lr(7) - 0.1) < 1e-9


def test_warmup_decay_matches_torch_linearlr():
    import torch

    base = 1.0
    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=base)
    warm = torch.optim.lr_scheduler.LinearLR(opt, start_factor=0.01,
                                             total_iters=4)
    ours = CosineAnnealingLR(base, T_max=20, warmup_epochs=4, warmup_decay=0.01)
    for epoch in range(4):
        torch_lr = opt.param_groups[0]["lr"]
        assert abs(ours.epoch_lr(epoch) - torch_lr) < 1e-7, (epoch, torch_lr)
        warm.step()
