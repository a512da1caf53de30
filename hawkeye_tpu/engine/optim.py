"""Optimizers and LR schedules.

The reference builds torch optimizers from ``config.train.optimizer``
(``train.py:185-198``) — SGD/Adam(W) with momentum/weight_decay — plus
per-Example parameter groups with different LRs (e.g. ``Examples/MPN.py:13-18``
backbone 0.2x, ``Examples/DCL.py:74-89`` 4 groups), and torch schedulers from
``config.train.scheduler`` (CosineAnnealingLR / StepLR / MultiStepLR /
ReduceLROnPlateau; e.g. ``Examples/BCNN.py:42-48``).

TPU design: one optax transformation whose learning rate is INJECTED as a
dynamic hyperparameter — the trainer's Python-side ``LRScheduler`` computes a
scalar per epoch (or per step) and writes it into the optimizer state, so LR
changes never retrigger XLA compilation. Parameter groups are expressed as a
label function over the param tree plus static per-group LR multipliers
(matching how every reference Example actually uses groups: constant ratios
of the base LR).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import optax


# --------------------------------------------------------------------------
# optimizer factory
# --------------------------------------------------------------------------
def _base_transform(name, cfg):
    """The gradient scaler chain WITHOUT the lr scale, torch semantics."""
    wd = float(cfg.get("weight_decay", 0.0))
    momentum = float(cfg.get("momentum", 0.0))
    name = name.lower()
    if name == "sgd":
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # torch: L2 into grad
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=bool(cfg.get("nesterov", False))))
        return optax.chain(*parts) if parts else optax.identity()
    if name == "adam":
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # torch Adam: coupled L2
        parts.append(optax.scale_by_adam(
            b1=float(cfg.get("beta1", 0.9)), b2=float(cfg.get("beta2", 0.999)),
            eps=float(cfg.get("eps", 1e-8))))
        return optax.chain(*parts)
    if name == "adamw":
        return optax.chain(
            optax.scale_by_adam(
                b1=float(cfg.get("beta1", 0.9)), b2=float(cfg.get("beta2", 0.999)),
                eps=float(cfg.get("eps", 1e-8))),
            optax.add_decayed_weights(wd),  # decoupled
        )
    raise ValueError(f"unknown optimizer {name!r}")


def build_optimizer(opt_config, param_labels=None, group_multipliers=None):
    """Build the optax transformation.

    Args:
      opt_config: config node with ``name``, ``lr`` and optional
        momentum/weight_decay/betas.
      param_labels: None, or a pytree-prefix/callable mapping params → group
        label (optax.multi_transform contract).
      group_multipliers: {label: lr multiplier} (static floats).

    Returns (tx, base_lr). ``tx`` has an injected ``learning_rate``
    hyperparameter; update it via ``set_learning_rate``.
    """
    base_lr = float(opt_config.lr)
    name = opt_config.name

    def factory(learning_rate):
        def one_group(mult):
            return optax.chain(
                _base_transform(name, opt_config),
                optax.scale(-learning_rate * mult),
            )

        if param_labels is None:
            return one_group(1.0)
        txs = {label: one_group(mult) for label, mult in group_multipliers.items()}
        return optax.multi_transform(txs, param_labels)

    tx = optax.inject_hyperparams(factory)(learning_rate=base_lr)
    return tx, base_lr


def make_prefix_labeler(rules, default="head"):
    """Build a param-labels fn for optax.multi_transform: params whose path
    starts with a key of ``rules`` get that rule's label, others ``default``.

    Rules keys match any dot-joined path PREFIX (e.g. 'backbone' or
    'backbone.layer4_0')."""

    import jax

    def labeler(params):
        def label_of(path):
            joined = ".".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            for prefix, label in rules.items():
                if joined == prefix or joined.startswith(prefix + "."):
                    return label
            return default

        return jax.tree_util.tree_map_with_path(
            lambda path, _: label_of(path), params)

    return labeler


def set_learning_rate(opt_state, lr):
    """Write a new base LR into an inject_hyperparams state (host-side)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def current_learning_rate(opt_state):
    return float(opt_state.hyperparams["learning_rate"])


# --------------------------------------------------------------------------
# schedulers (host-side, epoch-granular unless noted)
# --------------------------------------------------------------------------
class LRScheduler:
    """Base: constant LR."""

    def __init__(self, base_lr):
        self.base_lr = float(base_lr)
        self.current_lr = float(base_lr)

    def epoch_lr(self, epoch: int) -> float:
        return self.current_lr

    def step_metric(self, metric: float):
        """Called once per epoch with the validation metric (plateau only)."""

    def state_dict(self):
        return {"current_lr": self.current_lr}

    def load_state_dict(self, d):
        self.current_lr = d.get("current_lr", self.base_lr)


class CosineAnnealingLR(LRScheduler):
    """Cosine annealing with optional linear warmup (the reference composes
    LinearLR(start_factor=lr_warmup_decay) + CosineAnnealingLR via
    SequentialLR, ``Examples/MPN.py:22-31``)."""

    def __init__(self, base_lr, T_max, eta_min=0.0, warmup_epochs=0,
                 warmup_decay=0.01):
        super().__init__(base_lr)
        self.T_max = int(T_max)
        self.eta_min = float(eta_min)
        self.warmup_epochs = int(warmup_epochs)
        self.warmup_decay = float(warmup_decay)

    def epoch_lr(self, epoch):
        if self.warmup_epochs and epoch < self.warmup_epochs:
            # torch LinearLR: factor goes start_factor -> 1 over total_iters
            f = self.warmup_decay + (1.0 - self.warmup_decay) * (
                epoch / self.warmup_epochs)
            self.current_lr = self.base_lr * f
        else:
            e = min(epoch - self.warmup_epochs, self.T_max)
            t = max(self.T_max - self.warmup_epochs, 1)
            self.current_lr = self.eta_min + 0.5 * (self.base_lr - self.eta_min) * (
                1 + math.cos(math.pi * e / t))
        return self.current_lr


class StepLR(LRScheduler):
    def __init__(self, base_lr, step_size, gamma=0.1):
        super().__init__(base_lr)
        self.step_size = int(step_size)
        self.gamma = float(gamma)

    def epoch_lr(self, epoch):
        self.current_lr = self.base_lr * self.gamma ** (epoch // self.step_size)
        return self.current_lr


class MultiStepLR(LRScheduler):
    def __init__(self, base_lr, milestones, gamma=0.1):
        super().__init__(base_lr)
        self.milestones = sorted(int(m) for m in milestones)
        self.gamma = float(gamma)

    def epoch_lr(self, epoch):
        k = sum(1 for m in self.milestones if epoch >= m)
        self.current_lr = self.base_lr * self.gamma ** k
        return self.current_lr


class ReduceLROnPlateau(LRScheduler):
    """torch semantics (mode='max' on val accuracy, reference BCNN usage)."""

    def __init__(self, base_lr, mode="max", factor=0.1, patience=10,
                 threshold=1e-4, min_lr=0.0):
        super().__init__(base_lr)
        self.mode = mode
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.min_lr = float(min_lr)
        self.best = None
        self.num_bad = 0

    def _is_better(self, metric):
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best * (1 + self.threshold)
        return metric < self.best * (1 - self.threshold)

    def step_metric(self, metric):
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.current_lr = max(self.current_lr * self.factor, self.min_lr)
                self.num_bad = 0

    def state_dict(self):
        return {"current_lr": self.current_lr, "best": self.best,
                "num_bad": self.num_bad}

    def load_state_dict(self, d):
        super().load_state_dict(d)
        self.best = d.get("best")
        self.num_bad = d.get("num_bad", 0)


def build_scheduler(sched_config, base_lr) -> LRScheduler:
    """Config → scheduler (reference scheduler names, ``train.py:200-218``)."""
    if sched_config is None:
        return LRScheduler(base_lr)
    name = sched_config.get("name")
    if name in (None, "", "None", "none", "Constant"):
        # several reference recipes omit the scheduler name but provide
        # T_max/warmup fields and build warmup+cosine in their Example
        # (e.g. CBCNN_S2, Examples/MPN.py:20-31)
        if "T_max" in sched_config:
            name = "WarmupCosine"
        else:
            return LRScheduler(base_lr)
    if name in ("CosineAnnealingLR", "WarmupCosine"):
        return CosineAnnealingLR(
            base_lr, T_max=sched_config.get("T_max", 30),
            eta_min=sched_config.get("eta_min", 0.0),
            warmup_epochs=sched_config.get("warmup_epochs", 0),
            warmup_decay=sched_config.get("lr_warmup_decay", 0.01))
    if name == "StepLR":
        return StepLR(base_lr, sched_config.step_size,
                      sched_config.get("gamma", 0.1))
    if name == "MultiStepLR":
        return MultiStepLR(base_lr, sched_config.milestones,
                           sched_config.get("gamma", 0.1))
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(
            base_lr, mode=sched_config.get("mode", "max"),
            factor=sched_config.get("factor", 0.1),
            patience=sched_config.get("patience", 10),
            min_lr=sched_config.get("min_lr", 0.0))
    raise ValueError(f"unknown scheduler {name!r}")
