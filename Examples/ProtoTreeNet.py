#!/usr/bin/env python
"""ProtoTree training (reference Examples/ProtoTreeNet.py): gradient step on
backbone/neck/prototypes + derivative-free leaf update each batch, backbone
frozen for the first 30 epochs (grad gating), warmup+cosine schedule."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.engine import Trainer
from hawkeye_tpu.losses.prototree import leaf_update


class ProtoTreeTrainer(Trainer):
    FREEZE_EPOCHS = 30

    def train_step_body(self):
        import jax

        base_key = jax.random.PRNGKey(self.seed)
        num_classes = int(self.config.model.num_classes)

        def train_step(state, batch, lr, old_leaf_over_batches, backbone_on):
            rng = jax.random.fold_in(base_key, state.step)
            if self.pipeline == "device":
                batch = self.device_prepare_train(
                    jax.random.fold_in(rng, 1), batch)

            def loss_fn(params):
                loss, outputs, mutated = self.forward_train(params, state,
                                                            batch, rng)
                return loss, (outputs, mutated)

            (loss, (outputs, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # freeze gate: zero backbone grads for the first 30 epochs
            grads = dict(grads)
            grads["backbone"] = jax.tree.map(
                lambda g: g * backbone_on, grads["backbone"])

            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt_state = self.tx.update(grads, opt_state,
                                                    state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

            # derivative-free leaf update (no_grad in the reference)
            leaves = state.extra_vars["tree_leaves"]["dist_params"]
            new_leaves = leaf_update(
                leaves, old_leaf_over_batches,
                jax.lax.stop_gradient(outputs["pa_leaf"]),
                jax.lax.stop_gradient(outputs["leaf_dist"]),
                jax.lax.stop_gradient(outputs["pred"]),
                batch["label"], num_classes)

            new_state = state.replace(
                params=new_params,
                batch_stats=mutated.get("batch_stats", state.batch_stats),
                extra_vars={**state.extra_vars,
                            "tree_leaves": {"dist_params": new_leaves}},
                opt_state=new_opt_state,
                step=state.step + 1,
            )
            metrics = {"loss": loss, **self.compute_metrics(outputs, batch)}
            return new_state, metrics

        return train_step

    def _refresh_step_inputs(self):
        """Snapshot leaf params for the running-average replacement and set
        the backbone-freeze gate for the current epoch."""
        import jax.numpy as jnp
        import numpy as np

        old = np.asarray(self.state.extra_vars["tree_leaves"]["dist_params"])
        num_batches = max(len(self.dataloaders["train"]), 1)
        self._old_leaf_over_batches = jnp.asarray(old / num_batches)
        self._backbone_on = jnp.asarray(
            0.0 if self.epoch < self.FREEZE_EPOCHS else 1.0, jnp.float32)
        self._step_inputs_epoch = self.epoch

    def on_start_epoch(self):
        super().on_start_epoch()
        self._refresh_step_inputs()

    def step_extras(self):
        # self-enforcing contract: callers that drive train_epoch()/steps
        # directly without the epoch-start hook (round-2 regression:
        # __graft_entry__.dryrun_multichip) still get valid step inputs
        if getattr(self, "_step_inputs_epoch", None) != self.epoch:
            self._refresh_step_inputs()
        return (self._old_leaf_over_batches, self._backbone_on)


if __name__ == "__main__":
    ProtoTreeTrainer().train()
