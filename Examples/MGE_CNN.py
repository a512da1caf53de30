#!/usr/bin/env python
"""MGE-CNN training (reference Examples/MGE_CNN.py): labels feed the GradCAM
target in train; classifier 1× / extractor 0.1× LR split; warmup+cosine."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer
from hawkeye_tpu.engine.optim import make_prefix_labeler


class MGETrainer(Trainer):
    def init_model_kwargs(self):
        import jax.numpy as jnp

        return {"labels": jnp.zeros((2,), jnp.int32)}

    def get_param_groups(self):
        lr_rate = float(self.config.train.optimizer.get("lr_rate", 0.1))
        # extractor prefixes for both layouts: fused (stacked "backbones")
        # and sequential ("expert_i/backbone" + "gate_backbone")
        rules = {f"expert_{i}.backbone": "extractor" for i in range(3)}
        rules["gate_backbone"] = "extractor"
        rules["backbones"] = "extractor"
        return make_prefix_labeler(rules, default="classifier"), {
            "extractor": lr_rate, "classifier": 1.0}

    def apply_model(self, variables, batch, train, rng, mutable):
        kwargs = {}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if train:
            kwargs["labels"] = batch["label"]
        if mutable:
            out, mut = self.model.apply(variables, batch["img"], train=train,
                                        mutable=mutable, **kwargs)
            return out, mut
        return self.model.apply(variables, batch["img"], train=train,
                                **kwargs), {}


if __name__ == "__main__":
    MGETrainer().train()
