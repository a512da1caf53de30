"""Eval-only runtime.

Reference: ``test.py:14-147`` — mandatory ``model.load`` weights, center-crop
eval transform, val split only, top-1 accuracy report.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import setup_config
from ..data import (
    DataLoader,
    FGDataset,
    SequentialBatchSampler,
    SyntheticDataset,
)
from ..data.transforms_host import EvalPreset
from ..losses import build_criterion
from ..parallel import make_mesh, replicate_tree, shard_batch
from ..registry import MODEL
from ..utils import Timer, get_logger
from . import checkpoint as ckpt


class Tester:
    __test__ = False  # keep pytest from collecting this as a test class

    def __init__(self, config=None):
        self.config = config if config is not None else setup_config()
        self.logger = get_logger("hawkeye.test")
        self.mesh = make_mesh()
        self.n_devices = self.mesh.devices.size

        tcfg = self.config.dataset.transformer
        image_size = int(tcfg.image_size)
        resize_size = int(tcfg.get("resize_size", image_size * 8 // 7))
        # pipeline mode mirrors the Trainer: 'host' = PIL EvalPreset,
        # 'device' = host decodes fixed uint8, center-crop + normalize run
        # inside the jitted eval step
        self.pipeline = self.config.dataset.get("pipeline", "host")
        self._decode_size = resize_size if self.pipeline == "device" else None
        if self.pipeline == "device":
            from ..data.transforms_device import make_eval_transform

            self.device_eval_prep = make_eval_transform(image_size=image_size)
        self.transformer = self.get_transformer(image_size, resize_size)

        self.dataset = self.get_dataset(self.config.dataset)
        bs = int(self.config.dataset.batch_size)
        self.dataloader = DataLoader(
            self.dataset,
            SequentialBatchSampler(len(self.dataset), bs, drop_last=False),
            num_workers=int(self.config.dataset.get("num_workers", 4)),
        )

        self.model = self.get_model(self.config.model)
        size = image_size
        rng = jax.random.PRNGKey(0)
        self.variables = self.model.init(
            {"params": rng, "dropout": rng}, jnp.zeros((2, size, size, 3)), train=False
        )
        assert "load" in self.config.model and self.config.model.load, (
            "Tester requires config.model.load (reference test.py:71-75)"
        )
        self.variables = ckpt.load_model(
            self.config.model.load, self.variables, logger=self.logger
        )
        self.variables = replicate_tree(self.mesh, self.variables)
        self.criterion = build_criterion(
            self.config.train.criterion if "train" in self.config else None
        )
        self._eval_step = self.build_eval_step()
        self.timer = Timer()

    def get_transformer(self, image_size, resize_size):
        if self.pipeline == "device":
            return None  # host side only decodes
        return EvalPreset(image_size, resize_size)

    def get_dataset(self, ds_config):
        if ds_config.get("name") == "synthetic":
            return SyntheticDataset(
                ds_config.get("length", 64),
                ds_config.get("num_classes", self.config.model.num_classes),
                ds_config.transformer.image_size,
                transform=self.transformer,
                decode_size=self._decode_size,
            )
        return FGDataset(
            ds_config.root_dir,
            os.path.join(ds_config.meta_dir, "val.txt"),
            transform=self.transformer,
            decode_size=self._decode_size,
        )

    def get_model(self, model_config):
        return MODEL.get(model_config.name)(model_config)

    def forward(self, batch):
        return self.model.apply(self.variables, batch["img"], train=False)

    def build_eval_step(self):
        @jax.jit
        def eval_step(variables, batch):
            if self.pipeline == "device":
                batch = dict(batch)
                batch["img"] = self.device_eval_prep(batch["img"])
            outputs = self.model.apply(variables, batch["img"], train=False)
            logits = outputs["logits"] if isinstance(outputs, dict) else outputs
            pred = jnp.argmax(logits, -1)
            w = batch["weight"].astype(jnp.float32)
            correct = ((pred == batch["label"]).astype(jnp.float32) * w).sum()
            return {"correct": correct, "count": w.sum()}

        return eval_step

    def prepare_batch(self, batch):
        n = batch["label"].shape[0]
        bs = int(self.config.dataset.batch_size)
        target = -((-max(bs, n)) // self.n_devices) * self.n_devices
        pad = target - n
        weight = np.ones((n,), np.float32)
        if pad:
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                if getattr(v, "ndim", 0) >= 1
                else v
                for k, v in batch.items()
            }
            weight = np.concatenate([weight, np.zeros((pad,), np.float32)])
        batch = dict(batch)
        batch["weight"] = weight
        return shard_batch(self.mesh, batch)

    def test(self):
        self.timer.tick()
        correct = count = 0.0
        for batch in self.dataloader:
            metrics = self._eval_step(self.variables, self.prepare_batch(batch))
            correct += float(metrics["correct"])
            count += float(metrics["count"])
        elapsed = self.timer.tick()
        acc = 100.0 * correct / max(count, 1.0)
        self.logger.info(
            f"Test top-1 accuracy: {acc:.2f}% ({int(count)} images, "
            f"{elapsed:.1f}s, {count / max(elapsed, 1e-9):.1f} img/s)"
        )
        return acc
