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
    def get_transformers(self, transformer_config):
        resize = int(transformer_config.get("resize_size", 512))
        crop = int(transformer_config.get("image_size", 448))
        return {
            "train": DCLCommonAug(resize, crop, rotate=15, train=True),
            "val": DCLCommonAug(resize, crop, train=False),
        }

    def get_collate_fn(self):
        mcfg = self.config.model
        tcfg = self.config.dataset.transformer
        grid = int(tcfg.get("swap_num", [7, 7])[0])
        cls_2 = bool(mcfg.get("cls_2", True))
        return {
            "train": DCLTrainCollate(grid=grid, cls_2=cls_2,
                                     num_classes=int(mcfg.num_classes),
                                     seed=self.seed),
            "val": DCLValCollate(grid=grid, cls_2=cls_2),
        }

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
