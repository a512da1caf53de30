#!/usr/bin/env python
"""DCL training (reference Examples/DCL.py): DCL common augmentation, jigsaw
destruction collate producing the 2× [unswapped; swapped] batch, 10%
per-class val subsample, and classifier/convmask LR ratio param groups
(reference ``Examples/DCL.py:74-89``)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.data.dcl import (
    DCLCommonAug,
    DCLTrainCollate,
    DCLValCollate,
    subsample_per_class,
)
from hawkeye_tpu.engine import Trainer
from hawkeye_tpu.engine.optim import make_prefix_labeler


class DCLTrainer(Trainer):
    """With ``dataset.pipeline: device`` the host only decodes 512² uint8 and
    the whole DCL pipeline (rotate/crop/flip + jigsaw + 2x batch assembly)
    runs inside the jitted train step (``data/dcl.py::make_dcl_device_augment``)."""

    def _dcl_params(self):
        mcfg = self.config.model
        tcfg = self.config.dataset.transformer
        return {
            "grid": int(tcfg.get("swap_num", [7, 7])[0]),
            "cls_2": bool(mcfg.get("cls_2", True)),
            "num_classes": int(mcfg.num_classes),
        }

    def get_transformers(self, transformer_config):
        if self.pipeline == "device":
            return super().get_transformers(transformer_config)
        resize = int(transformer_config.get("resize_size", 512))
        crop = int(transformer_config.get("image_size", 448))
        # optional knobs (defaults = reference common_aug): rotate degrees,
        # and rrc: false for deterministic eval-style geometry (used by the
        # synthetic overfit probe; jigsaw destruction still applies)
        rotate = float(transformer_config.get("rotate", 15))
        stochastic = bool(transformer_config.get("rrc", True))
        return {
            "train": DCLCommonAug(resize, crop, rotate=rotate,
                                  train=stochastic),
            "val": DCLCommonAug(resize, crop, train=False),
        }

    def get_collate_fn(self):
        if self.pipeline == "device":
            return super().get_collate_fn()
        p = self._dcl_params()
        return {
            "train": DCLTrainCollate(grid=p["grid"], cls_2=p["cls_2"],
                                     num_classes=p["num_classes"],
                                     seed=self.seed),
            "val": DCLValCollate(grid=p["grid"], cls_2=p["cls_2"]),
        }

    def device_prepare_train(self, rng, batch):
        from hawkeye_tpu.data.dcl import make_dcl_device_augment

        p = self._dcl_params()
        tcfg = self.config.dataset.transformer
        size = int(tcfg.image_size)
        augment = make_dcl_device_augment(
            size, rotate=float(tcfg.get("rotate", 15)),
            grid=p["grid"], ran=int(tcfg.get("swap_range", 2)),
            cls_2=p["cls_2"], num_classes=p["num_classes"])
        return augment(rng, batch)

    def device_prepare_eval(self, batch):
        from hawkeye_tpu.data.dcl import make_dcl_device_eval

        p = self._dcl_params()
        size = int(self.config.dataset.transformer.image_size)
        return make_dcl_device_eval(size, grid=p["grid"],
                                    cls_2=p["cls_2"])(batch)

    def get_dataset(self, ds_config):
        datasets = super().get_dataset(ds_config)
        if hasattr(datasets["val"], "paths"):  # real metadata-backed dataset
            val = datasets["val"]
            keep = subsample_per_class(val.labels, fraction=0.1, seed=self.seed)
            val.labels = val.labels[keep]
            val.paths = [val.paths[i] for i in keep]
        return datasets

    def get_param_groups(self):
        ratio = float(self.config.train.optimizer.get("lr_ratio", 10.0))
        labeler = make_prefix_labeler(
            {"classifier": "head", "classifier_swap": "head",
             "convmask": "head", "backbone": "base"}, default="base")
        return labeler, {"base": 1.0, "head": ratio}


if __name__ == "__main__":
    DCLTrainer().train()
