#!/usr/bin/env python
"""Per-method train-step throughput matrix on the current backend.

Complements bench.py (the north-star ResNet-50/BCNN numbers) with one row
per method of the zoo, each at its reference recipe's input size and batch
size (configs/*.yaml), on synthetic data. The host loader is taken out of
the loop: one real batch is prepared once and the jitted train step is
timed steady-state, so rows measure the device program (fwd+bwd+update and
any in-step machinery — NMS, crops, leaf updates, peer exchange).

Each method runs in a subprocess (isolated TPU memory, one failure doesn't
kill the matrix): ``python bench_methods.py`` prints one JSON line per
method plus a closing summary line; ``--method NAME`` runs one in-process.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

# method -> (config yaml, Examples module, Trainer class)
CASES = {
    "Baseline": ("configs/Baseline.yaml", "Examples.Baseline", "BaselineTrainer"),
    "BCNN": ("configs/BCNN_S2.yaml", "Examples.BCNN", "BCNNTrainer"),
    "CBCNN": ("configs/CBCNN_S2.yaml", "Examples.CBCNN", "CBCNNTrainer"),
    "MPN": ("configs/MPN.yaml", "Examples.MPN", "MPNTrainer"),
    "OSMENet": ("configs/OSMENet.yaml", "Examples.OSMENet", "OSMETrainer"),
    "APINet": ("configs/APINet.yaml", "Examples.APINet", "APINetTrainer"),
    "NTSNet": ("configs/NTSNet.yaml", "Examples.NTSNet", "NTSNetTrainer"),
    "S3N": ("configs/S3N.yaml", "Examples.S3N", "S3NTrainer"),
    "MGE_CNN": ("configs/MGE_CNN.yaml", "Examples.MGE_CNN", "MGETrainer"),
    "APCNN": ("configs/APCNN.yaml", "Examples.APCNN", "APCNNTrainer"),
    "CrossX": ("configs/CrossX.yaml", "Examples.CrossX", "CrossXTrainer"),
    "DCL": ("configs/DCL.yaml", "Examples.DCL", "DCLTrainer"),
    "CIN": ("configs/CIN.yaml", "Examples.CIN", "CINTrainer"),
    "InterpParts": ("configs/InterpPartsNet.yaml", "Examples.InterpPartsNet",
                    "InterpPartsTrainer"),
    "ProtoTree": ("configs/ProtoTreeNet.yaml", "Examples.ProtoTreeNet",
                  "ProtoTreeTrainer"),
    "PeerLearning": ("configs/PeerLearning_BCNN_S2.yaml",
                     "Examples.PeerLearning", "PLTrainer"),
    "PairConfusion": ("configs/PC_resnet50.yaml", "Examples.PairConfusion",
                      "PairConfusionTrainer"),
}


def _bench_config(config_path, batch_size=None, block=1, model_kv=()):
    import yaml

    from hawkeye_tpu.config import ConfigNode

    with open(config_path) as f:
        raw = yaml.safe_load(f)
    if block > 1:
        raw["train"]["steps_per_dispatch"] = int(block)
    for kv in model_kv:  # A/B model knobs, e.g. fused_warp_pass=true
        k, v = kv.split("=", 1)
        raw["model"][k] = yaml.safe_load(v)
    # synthetic data, no weight loading: measure the device program only
    ds = raw["dataset"]
    ds["name"] = "synthetic"
    ds.pop("root_dir", None)
    ds.pop("meta_dir", None)
    ds["num_workers"] = 0
    if batch_size:
        ds["batch_size"] = int(batch_size)
    # enough samples that balanced samplers can fill the RECIPE batch: the
    # P×K cursor truncates a class to the items it actually has, so with 512
    # synthetic items over 200 classes (~2.5/class) an n_samples=5 recipe
    # (CIN 4×5=20) was silently benched at ~10 images/step (round-5 finding —
    # depressed the CIN/OSMENet/APINet matrix rows)
    need = 512
    if "n_samples" in ds:
        # 4× margin: labels are drawn iid-uniform, so 2× the mean still
        # leaves ~7% of classes short of n_samples (measured: OSME filled
        # 9/10 at 2×, and batch-9 is a lane-hostile shape — 1.58 vs
        # 1.30 ms/img)
        ncls = int(ds.get("num_classes", raw["model"].get("num_classes", 200)))
        need = 4 * int(ds["n_samples"]) * ncls
    ds["length"] = max(2 * int(ds["batch_size"]), need)
    raw["model"].pop("load", None)
    raw["model"].pop("pretrain", None)
    if isinstance(raw["model"].get("backbone"), dict):
        raw["model"]["backbone"].pop("pretrain", None)
    if isinstance(raw["model"].get("base_model"), dict):
        raw["model"]["base_model"].pop("load", None)
    raw["experiment"]["log_dir"] = tempfile.mkdtemp(prefix="hawkeye_bench_")
    raw["experiment"]["debug"] = True
    cfg = ConfigNode(raw)
    cfg.freeze()
    return cfg


def run_one(method, steps, warmup, batch_size=None, block=1, model_kv=()):
    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    import hawkeye_tpu.models  # noqa: F401  (populate the registry)

    t_start = time.perf_counter()
    config_path, module_name, cls_name = CASES[method]
    cfg = _bench_config(config_path, batch_size, block, model_kv)
    trainer_cls = getattr(importlib.import_module(module_name), cls_name)
    trainer = trainer_cls(cfg)
    trainer.epoch = 0
    trainer.on_start_epoch()
    t_build = time.perf_counter() - t_start

    batch = next(iter(trainer.dataloaders["train"]))
    host_batch = trainer.pad_batch(batch, train=True)
    n_imgs = int(host_batch["img"].shape[0])
    lr0 = float(trainer.scheduler.epoch_lr(0)) or 1e-4

    # Axon-tunnel measurement rules (see NEXT.md): the remote runtime replays
    # cached step results when a dispatch looks bit-identical to a previous
    # one (chaining donated state is NOT enough), and block_until_ready does
    # not force remote execution — only a host fetch does. So (a) every
    # dispatch gets a unique lr input (~1e-6 relative jitter, timing-neutral),
    # and (b) each segment ends by fetching the loss scalar.
    def lr_i(i):
        return jnp.asarray(lr0 * (1.0 + 1e-6 * (i % 97)), jnp.float32)

    if block > 1:
        from hawkeye_tpu.parallel import shard_stacked_batch

        stacked = {k: np.stack([v] * block) for k, v in host_batch.items()}
        device_in = shard_stacked_batch(trainer.mesh, stacked)

        def lrs_i(i):
            return jnp.asarray(
                [lr0 * (1.0 + 1e-6 * ((i * block + j) % 97))
                 for j in range(block)], jnp.float32)

        def dispatch(i):
            trainer.state, m = trainer.train_block_call(device_in, lrs_i(i))
            return m
    else:
        device_in = trainer.prepare_batch(batch, train=True)

        def dispatch(i):
            trainer.state, m = trainer.train_step_call(device_in, lr_i(i))
            return m

    t0 = time.perf_counter()
    metrics = dispatch(0)
    float(np.sum(metrics["loss"]))
    t_compile = time.perf_counter() - t0
    print(f"[{method}] build {t_build:.1f}s, first step (compile) "
          f"{t_compile:.1f}s", file=sys.stderr, flush=True)
    n_warm = max(1, -(-warmup // block))
    for i in range(1, n_warm):
        metrics = dispatch(i)
    warm_loss = float(np.sum(metrics["loss"]))
    n_disp = max(1, -(-steps // block))
    t0 = time.perf_counter()
    for i in range(n_disp):
        metrics = dispatch(n_warm + i)
    final_loss = float(np.sum(metrics["loss"]))
    dt = time.perf_counter() - t0
    if final_loss == warm_loss:
        raise RuntimeError("loss did not change over the timed steps — "
                           "suspected runtime replay; measurement invalid")

    tr = cfg.dataset.transformer
    n_steps = n_disp * block
    return {
        "method": method,
        "image_size": int(tr.image_size),
        "batch_size": int(cfg.dataset.batch_size),
        "images_per_step": n_imgs,  # DCL interleaves 2x; others == batch_size
        "steps_per_dispatch": block,
        "step_ms": round(dt / n_steps * 1e3, 2),
        "images_per_sec": round(n_imgs * n_steps / dt / jax.device_count(), 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", choices=sorted(CASES), default=None)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=4)
    parser.add_argument("--batch-size", type=int, default=None,
                        help="override the config batch size")
    parser.add_argument("--block", type=int, default=8,
                        help="train steps per device dispatch (lax.scan "
                        "block); 1 = per-step dispatch")
    parser.add_argument("--model-kv", action="append", default=[],
                        metavar="KEY=VAL",
                        help="model config override for A/B runs "
                        "(repeatable), e.g. --model-kv fused_warp_pass=true")
    parser.add_argument("--timeout", type=int, default=2400,
                        help="per-method subprocess timeout (matrix mode); "
                        "remote compile alone can take >500s for the heavy "
                        "region methods (CIN: build 165s + compile 348s)")
    args = parser.parse_args()

    if args.method:
        print(json.dumps(run_one(args.method, args.steps, args.warmup,
                                 args.batch_size, args.block,
                                 args.model_kv)))
        return

    rows = []
    for method in CASES:
        cmd = [sys.executable, os.path.abspath(__file__), "--method", method,
               "--steps", str(args.steps), "--warmup", str(args.warmup),
               "--block", str(args.block)]
        if args.batch_size:
            cmd += ["--batch-size", str(args.batch_size)]
        for kv in args.model_kv:
            cmd += ["--model-kv", kv]
        out = None
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            row = json.loads(line)
        except Exception as e:  # noqa: BLE001 — a row failure is a result
            row = {"method": method, "error": str(e)[:200]}
            # this iteration's stderr only: the run() result if it returned,
            # else what TimeoutExpired captured
            stderr = out.stderr if out is not None else getattr(e, "stderr", None)
            if isinstance(stderr, bytes):
                stderr = stderr.decode(errors="replace")
            if stderr:
                row["stderr_tail"] = stderr.strip().splitlines()[-1][:200]
        rows.append(row)
        print(json.dumps(row), flush=True)
    ok = [r for r in rows if "images_per_sec" in r]
    print(json.dumps({
        "metric": "method_matrix_images_per_sec",
        "methods_ok": len(ok),
        "methods_total": len(rows),
        "min": min((r["images_per_sec"] for r in ok), default=0),
        "max": max((r["images_per_sec"] for r in ok), default=0),
    }))


if __name__ == "__main__":
    main()
