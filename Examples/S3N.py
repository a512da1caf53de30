#!/usr/bin/env python
"""S3N training (reference Examples/S3N.py): phase schedule p=0→1→2 by epoch
(train: 0 before epoch 20 else 1; val: 1 before epoch 20 else 2), and the
4-way LR split (classifiers 1x, radius/filter 1e-5x, everything else 0.1x,
reference ``Examples/S3N.py:35-55``)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer
from hawkeye_tpu.engine.optim import make_prefix_labeler


class S3NTrainer(Trainer):
    def __init__(self, config=None):
        self._phase = 0
        super().__init__(config)
        # Trainer.__init__ built the jitted steps at epoch 0's phase; record
        # it so the first on_start_epoch doesn't rebuild them identically
        self._compiled_phase = (self.train_phase(), self.eval_phase())

    def get_param_groups(self):
        rules = {
            "raw_classifier": "cls", "sampler_classifier": "cls",
            "sampler_classifier1": "cls", "con_classifier": "cls",
            "radius": "slow", "radius_inv": "slow", "blur_kernel": "slow",
        }
        return make_prefix_labeler(rules, default="base"), {
            "cls": 1.0, "slow": 1e-5, "base": 0.1}

    def train_phase(self):
        return 0 if self.epoch < 20 else 1

    def eval_phase(self):
        return 1 if self.epoch < 20 else 2

    def apply_model(self, variables, batch, train, rng, mutable):
        import jax

        kwargs = {"p": self.train_phase() if train else self.eval_phase()}
        # p=1 draws stochastic peak assignments even at eval; give eval a
        # fixed key so validation stays deterministic
        kwargs["rngs"] = {"dropout": rng if rng is not None
                          else jax.random.PRNGKey(0)}
        if mutable:
            out, mut = self.model.apply(variables, batch["img"], train=train,
                                        mutable=mutable, **kwargs)
            return out, mut
        return self.model.apply(variables, batch["img"], train=train,
                                **kwargs), {}

    def on_start_epoch(self):
        # phase changes alter the traced program: rebuild the jitted steps at
        # the single p transition (epoch 20). Two compilations per run total.
        phase = (self.train_phase(), self.eval_phase())
        if getattr(self, "_compiled_phase", None) != phase:
            self.rebuild_jitted_steps()
            self._compiled_phase = phase


if __name__ == "__main__":
    S3NTrainer().train()
