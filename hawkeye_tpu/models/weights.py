"""Weight import / partial loading.

- ``convert_torchvision_resnet`` / ``convert_torchvision_vgg``: map a raw
  torchvision ``state_dict`` (as numpy arrays) onto our Flax parameter trees.
  Replaces the reference's torch.hub URL loading (``model/backbone/resnet.py:
  16-26``); with zero egress, weights must be provided as local ``.pth`` files.
- ``partial_load``: shape-checked partial state load, the equivalent of the
  reference's ``model/utils.py:28-33`` (copy only keys that exist on both
  sides with matching shapes; report the rest).
"""

from __future__ import annotations

import re

import numpy as np

from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict


def load_torch_state_dict(path):
    """torch.load a .pth and return {name: np.ndarray}. CPU-only, lazy torch import."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^module\.", "", k)
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv_kernel(w):
    # torch OIHW -> flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _dense_kernel(w):
    # torch (out, in) -> flax (in, out)
    return np.transpose(w, (1, 0))


def convert_torchvision_resnet(sd, prefix=""):
    """Convert torchvision resnet/resnext/wide_resnet state_dict → (params, batch_stats).

    Returns two flat dicts keyed by '/'-joined flax paths (relative to the
    ResNet module), suitable for ``merge_into``.
    """
    params, stats = {}, {}

    def put_bn(flax_name, torch_name):
        params[f"{flax_name}/scale"] = sd[f"{torch_name}.weight"]
        params[f"{flax_name}/bias"] = sd[f"{torch_name}.bias"]
        stats[f"{flax_name}/mean"] = sd[f"{torch_name}.running_mean"]
        stats[f"{flax_name}/var"] = sd[f"{torch_name}.running_var"]

    params["conv1/kernel"] = _conv_kernel(sd[prefix + "conv1.weight"])
    put_bn("bn1", prefix + "bn1")

    block_re = re.compile(r"^layer(\d+)\.(\d+)\.conv(\d+)\.weight$")
    for k in list(sd):
        m = block_re.match(k[len(prefix):] if k.startswith(prefix) else k)
        if not m:
            continue
        li, bj, ci = m.groups()
        base_t = f"{prefix}layer{li}.{bj}"
        base_f = f"layer{li}_{bj}"
        params[f"{base_f}/conv{ci}/kernel"] = _conv_kernel(sd[f"{base_t}.conv{ci}.weight"])
        put_bn(f"{base_f}/bn{ci}", f"{base_t}.bn{ci}")
        if f"{base_t}.downsample.0.weight" in sd and f"{base_f}/downsample_conv/kernel" not in params:
            params[f"{base_f}/downsample_conv/kernel"] = _conv_kernel(
                sd[f"{base_t}.downsample.0.weight"])
            put_bn(f"{base_f}/downsample_bn", f"{base_t}.downsample.1")

    if prefix + "fc.weight" in sd:
        params["fc/kernel"] = _dense_kernel(sd[prefix + "fc.weight"])
        params["fc/bias"] = sd[prefix + "fc.bias"]
    return params, stats


def convert_torchvision_vgg(sd, prefix=""):
    """Convert torchvision vgg(bn) state_dict → (params, batch_stats) flat dicts."""
    params, stats = {}, {}
    feat_re = re.compile(r"^features\.(\d+)\.(weight|bias|running_mean|running_var)$")
    for k, v in sd.items():
        kk = k[len(prefix):] if k.startswith(prefix) else k
        m = feat_re.match(kk)
        if m:
            idx, kind = m.groups()
            if kind == "weight" and v.ndim == 4:
                params[f"conv{idx}/kernel"] = _conv_kernel(v)
            elif kind == "bias" and v.ndim == 1 and f"features.{idx}.running_mean" not in sd:
                params[f"conv{idx}/bias"] = v
            elif kind == "weight" and v.ndim == 1:
                params[f"bn{idx}/scale"] = v
            elif kind == "bias" and v.ndim == 1:
                params[f"bn{idx}/bias"] = v
            elif kind == "running_mean":
                stats[f"bn{idx}/mean"] = v
            elif kind == "running_var":
                stats[f"bn{idx}/var"] = v
        cm = re.match(r"^classifier\.(\d+)\.(weight|bias)$", kk)
        if cm:
            idx, kind = cm.groups()
            if kind == "weight":
                if idx == "0" and v.shape[1] % 49 == 0:
                    # classifier.0 consumes the FLATTENED 7x7 feature map.
                    # torch flattens NCHW (rows ordered c*49+h*7+w); our flax
                    # head flattens NHWC (h*7*C + w*C + c) — reorder the input
                    # axis or the loaded fc0 silently mixes channels/positions.
                    c = v.shape[1] // 49
                    v = (v.reshape(v.shape[0], c, 7, 7)
                          .transpose(2, 3, 1, 0)      # (H, W, C, out)
                          .reshape(49 * c, v.shape[0]))
                    params[f"fc{idx}/kernel"] = v
                else:
                    params[f"fc{idx}/kernel"] = _dense_kernel(v)
            else:
                params[f"fc{idx}/bias"] = v
    return params, stats


def convert_bbn_inat_resnet(sd):
    """Remap a BBN iNaturalist2017 ResNet-50 checkpoint to torchvision names
    then convert (reference ``ProtoTreeNet.get_inat_resnet50_weight``,
    ``model/methods/ProtoTree/ProtoTreeNet.py:41-59``: ``module.backbone.
    cb_block`` → ``layer4.2``, ``rb_block``/classifier dropped)."""
    remapped = {}
    for k, v in sd.items():
        if k.startswith("module.backbone.cb_block"):
            remapped["layer4.2" + k.split("cb_block")[-1]] = v
        elif k.startswith("module.backbone.rb_block"):
            continue
        elif k.startswith("module.classifier"):
            continue
        elif k.startswith("module.backbone."):
            remapped[k.split("backbone.")[-1]] = v
        else:
            remapped[k] = v
    return convert_torchvision_resnet(remapped)


def load_pretrained_backbone(variables, path, backbone_kind, subpath=("backbone",),
                             logger=None):
    """Load a local pretrained checkpoint into a model's backbone subtree.

    ``path`` may be a torch ``.pth`` (converted by backbone kind: 'resnet',
    'vgg', 'bbn_inat') or a flax ``.msgpack`` weights file. With zero egress
    in mind, this is gated on file existence — missing files log a warning
    and return the variables unchanged (training from scratch).
    """
    import os

    if not path or not os.path.exists(path):
        if logger is not None:
            logger.info(f"pretrained weights not found at {path!r}; "
                        f"training from scratch")
        return variables
    if path.endswith((".pth", ".pt", ".tar")):
        sd = load_torch_state_dict(path)
        if backbone_kind == "vgg":
            flat_p, flat_s = convert_torchvision_vgg(sd)
        elif backbone_kind == "bbn_inat":
            flat_p, flat_s = convert_bbn_inat_resnet(sd)
        else:
            flat_p, flat_s = convert_torchvision_resnet(sd)
        merged, _ = merge_into(variables, flat_p, flat_s, subpath=subpath,
                               logger=logger)
        return merged
    from ..engine.checkpoint import load_model

    return load_model(path, variables, logger=logger)


def merge_into(variables, flat_params, flat_stats=None, subpath=(), logger=None,
               flat_other=None):
    """Shape-checked partial merge of flat '/'-keyed arrays into flax variables.

    Only keys present in the target with matching shapes are copied
    (reference semantics: ``model/utils.py:28-33``). ``subpath`` roots the
    merge at a submodule (e.g. ('backbone',)). ``flat_other`` maps extra
    collection names (e.g. 'tree_leaves') to their own flat dicts.
    """
    variables = unfreeze(variables)
    report = {"loaded": 0, "skipped_missing": [], "skipped_shape": []}

    def _merge(collection_name, flat_src):
        if collection_name not in variables or not flat_src:
            return
        flat_tgt = flatten_dict(variables[collection_name])
        for key, arr in flat_src.items():
            path = subpath + tuple(key.split("/"))
            if path not in flat_tgt:
                report["skipped_missing"].append("/".join(path))
                continue
            if tuple(flat_tgt[path].shape) != tuple(arr.shape):
                report["skipped_shape"].append(
                    f"{'/'.join(path)}: {flat_tgt[path].shape} vs {arr.shape}")
                continue
            flat_tgt[path] = np.asarray(arr, dtype=np.asarray(flat_tgt[path]).dtype)
            report["loaded"] += 1
        variables[collection_name] = unflatten_dict(flat_tgt)

    _merge("params", flat_params)
    _merge("batch_stats", flat_stats or {})
    for col, flat in (flat_other or {}).items():
        _merge(col, flat)
    if logger is not None:
        logger.info(
            f"partial load: {report['loaded']} tensors loaded, "
            f"{len(report['skipped_missing'])} missing, "
            f"{len(report['skipped_shape'])} shape-mismatched")
        for s in report["skipped_shape"]:
            logger.info(f"  shape mismatch: {s}")
    return freeze(variables), report
