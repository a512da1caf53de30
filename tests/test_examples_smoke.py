"""Integration smoke matrix: every Example trainer runs one tiny epoch on
synthetic data (SURVEY §4 item (c) writ large). Slow-ish on CPU; each case
uses the smallest viable model."""

import os
import sys

import pytest

import hawkeye_tpu.models  # noqa: F401
from hawkeye_tpu.config import ConfigNode

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_config(tmp_path, name, model, criterion, *, batch_size=4, length=8,
                image_size=64, extra_dataset=None, optimizer=None,
                scheduler=None, extra_train=None):
    cfg = {
        "experiment": {"name": name, "log_dir": str(tmp_path / name),
                       "seed": 0, "debug": True},
        "dataset": {
            "name": "synthetic", "length": length, "batch_size": batch_size,
            "num_workers": 0,
            "transformer": {"image_size": image_size,
                            "resize_size": image_size + 8},
            **(extra_dataset or {}),
        },
        "model": model,
        "train": {
            "epoch": 1,
            "optimizer": optimizer or {"name": "SGD", "lr": 0.01,
                                       "momentum": 0.9},
            "scheduler": scheduler or {"name": "CosineAnnealingLR", "T_max": 1},
            "criterion": criterion,
            **(extra_train or {}),
        },
    }
    node = ConfigNode(cfg)
    node.freeze()
    return node


CASES = [
    ("Baseline", "Examples.Baseline", "BaselineTrainer",
     {"name": "ResNet18", "num_classes": 4},
     {"name": "CrossEntropyLoss"}, {}),
    ("BCNN", "Examples.BCNN", "BCNNTrainer",
     {"name": "BCNN", "stage": 1, "num_classes": 4, "backbone": "vgg11"},
     {"name": "CrossEntropyLoss"},
     {"scheduler": {"name": "ReduceLROnPlateau"}}),
    ("CBCNN", "Examples.CBCNN", "CBCNNTrainer",
     {"name": "CBCNN", "stage": 2, "num_classes": 4, "backbone": "vgg11",
      "input_channel": 512, "output_channel": 128},
     {"name": "CrossEntropyLoss"}, {}),
    ("MPN", "Examples.MPN", "MPNTrainer",
     {"name": "MPN", "num_classes": 4, "dimension_reduction": 32,
      "iter_num": 3, "backbone": "resnet18"},
     {"name": "CrossEntropyLoss"}, {}),
    ("OSMENet", "Examples.OSMENet", "OSMETrainer",
     {"name": "OSMENet", "num_classes": 4, "num_attention": 2,
      "backbone": "resnet18"},
     {"name": "MAMCLoss", "lambda_a": 0.5},
     {"extra_dataset": {"n_classes": 2, "n_samples": 2}}),
    ("APINet", "Examples.APINet", "APINetTrainer",
     {"name": "APINet", "num_classes": 4, "backbone": "resnet18"},
     {"name": "APINetLoss"},
     {"extra_dataset": {"n_classes": 2, "n_samples": 2}}),
    ("CIN", "Examples.CIN", "CINTrainer",
     {"name": "CIN", "num_classes": 4, "backbone": "resnet18",
      "r_channel": 16},
     {"name": "CINLoss", "alpha": 2.0, "beta": 0.5},
     {"extra_dataset": {"n_classes": 2, "n_samples": 2}}),
    ("PairConfusion", "Examples.PairConfusion", "PairConfusionTrainer",
     {"name": "ResNet18", "num_classes": 4},
     {"name": "PairwiseConfusionLoss", "lambda_a": 0.1}, {}),
    ("CrossX", "Examples.CrossX", "CrossXTrainer",
     {"name": "CrossX", "num_parts": 2, "num_classes": 4},
     {"name": "CrossXLoss", "num_parts": 2, "gamma": [0.5, 0.25, 0.5]}, {}),
    ("DCL", "Examples.DCL", "DCLTrainer",
     {"name": "DCL", "num_classes": 4, "cls_2": True, "cls_2xmul": False,
      "backbone": "resnet18"},
     {"name": "DCLLoss", "alpha": 1, "beta": 1, "gamma": 1},
     {"image_size": 56,
      "optimizer": {"name": "SGD", "lr": 0.001, "lr_ratio": 10,
                    "momentum": 0.9},
      "extra_dataset": {
          "transformer": {"image_size": 56, "resize_size": 64,
                          "swap_num": [7, 7]}}}),
    ("NTSNet", "Examples.NTSNet", "NTSNetTrainer",
     {"name": "NTSNet", "num_classes": 4, "image_size": 64,
      "proposal_num": 3, "cat_num": 2, "backbone": "resnet18"},
     {"name": "NTSLoss"}, {}),
    ("S3N", "Examples.S3N", "S3NTrainer",
     {"name": "S3N", "num_classes": 4, "image_size": 64, "radius": 0.12,
      "radius_inv": 0.3, "base_ratio": 0.09, "backbone": "resnet18"},
     {"name": "MultiSmoothLoss", "smooth_ratio": 0.85}, {}),
    ("MGE_CNN", "Examples.MGE_CNN", "MGETrainer",
     {"name": "MGE_CNN", "num_classes": 4, "image_size": 64,
      "box_thred": 0.2, "backbone": "resnet18"},
     {"name": "MGELoss"}, {}),
    ("APCNN", "Examples.APCNN", "APCNNTrainer",
     {"name": "APCNN", "num_classes": 4, "image_size": 64},
     {"name": "APCNNLoss"}, {}),
    ("InterpPartsNet", "Examples.InterpPartsNet", "InterpPartsTrainer",
     {"name": "IP_ResNet50", "num_classes": 4, "num_parts": 3},
     {"name": "InterpPartsLoss", "radius": 1, "std": 0.4, "alpha": 1,
      "beta": 0.001, "coeff": 0.5}, {}),
    ("ProtoTreeNet", "Examples.ProtoTreeNet", "ProtoTreeTrainer",
     {"name": "ProtoTreeNet", "num_classes": 4, "height": 3,
      "num_features": 16, "backbone": {"name": "resnet18"}},
     {"name": "ProtoTreeLoss"}, {}),
    ("PeerLearning", "Examples.PeerLearning", "PLTrainer",
     {"name": "PeerLearningNet", "num_classes": 4, "drop_rate": 0.25,
      "T_k": 1,
      "base_model": {"name": "ResNet18", "num_classes": 4}},
     {"name": "PeerLearningLoss"}, {}),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_example_trains_one_epoch(case, tmp_path):
    name, module_name, cls_name, model, criterion, kw = case
    import importlib

    module = importlib.import_module(module_name)
    trainer_cls = getattr(module, cls_name)
    cfg = tiny_config(tmp_path, name, model, criterion, **kw)
    trainer = trainer_cls(cfg)
    trainer.train()
    assert len(trainer.performance_meters["val"]["acc"].values) == 1
