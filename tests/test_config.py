import os

import pytest

from hawkeye_tpu.config import ConfigNode, build_config_from_dict, load_yaml_config, setup_config


def test_attribute_access_and_containment():
    cfg = ConfigNode({"model": {"name": "ResNet50", "num_classes": 200}, "lst": [1, {"a": 2}]})
    assert cfg.model.name == "ResNet50"
    assert "model" in cfg
    assert "load" not in cfg.model  # duck-typed probing semantics
    assert cfg.lst[1].a == 2


def test_freeze_semantics():
    cfg = ConfigNode({"a": {"b": 1}})
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.a.b = 2
    with pytest.raises(AttributeError):
        cfg.c = 3
    cfg.defrost()
    cfg.a.b = 2
    assert cfg.a.b == 2


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("experiment:\n  name: x\n  cuda: [0]\nmodel:\n  name: BCNN\n")
    cfg = load_yaml_config(str(p))
    assert cfg.experiment.cuda == [0]
    text = cfg.dump()
    assert "BCNN" in text


def test_setup_config_cli(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("model:\n  name: ResNet50\n")
    cfg = setup_config(argv=["--config", str(p)])
    assert cfg.is_frozen()
    assert cfg.model.name == "ResNet50"


def test_build_config_from_dict():
    cfg = build_config_from_dict({"x": 1})
    assert cfg.is_frozen() and cfg.x == 1


def test_str_rendering():
    cfg = ConfigNode({"b": 1, "a": {"c": 2}})
    s = str(cfg)
    assert "a:" in s and "c: 2" in s
