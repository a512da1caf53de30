#!/usr/bin/env python
"""API-Net (reference Examples/APINet.py): balanced sampler + labels fed into
the train forward for in-batch pair mining; epoch-0 conv freeze hook
(reference ``Examples/APINet.py:86-95``)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from Examples.OSMENet import BalancedSamplerTrainer


class APINetTrainer(BalancedSamplerTrainer):
    """Epoch-0 conv freeze (reference Examples/APINet.py:86-95 zeroes the
    backbone param group's LR for the first epoch): implemented as an
    in-graph gradient gate so the compiled step never changes."""

    def prepare_batch(self, batch, train):
        device_batch = super().prepare_batch(batch, train)
        if train:
            device_batch["backbone_on"] = 0.0 if self.epoch == 0 else 1.0
        return device_batch

    def transform_grads(self, grads, batch):
        import jax

        gate = batch.get("backbone_on")
        if gate is None or "backbone" not in grads:
            return grads
        grads = dict(grads)
        grads["backbone"] = jax.tree.map(lambda g: g * gate, grads["backbone"])
        return grads

    def init_model_kwargs(self):
        import jax.numpy as jnp

        return {"labels": jnp.zeros((2,), jnp.int32)}

    def apply_model(self, variables, batch, train, rng, mutable):
        kwargs = {}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if train:
            kwargs["labels"] = batch["label"]
            if "weight" in batch:
                kwargs["weight"] = batch["weight"]
        if mutable:
            out, mut = self.model.apply(variables, batch["img"], train=train,
                                        mutable=mutable, **kwargs)
            return out, mut
        return self.model.apply(variables, batch["img"], train=train, **kwargs), {}


if __name__ == "__main__":
    APINetTrainer().train()
