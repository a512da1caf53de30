#!/usr/bin/env python
"""North-star benchmark: CUB-200-shaped 448² images/sec/chip (train + eval).

Prints ONE JSON line. Headline metric = Baseline ResNet-50 448² TRAIN
images/sec/chip (fwd+bwd+update, bf16 compute, device-resident augmentation
included), measured on synthetic CUB-shaped uint8 data (real CUB images are
not redistributable inside this environment; the compute path is identical).
Extra keys carry the full matrix BASELINE.json asks for: ResNet-50 eval
throughput and BCNN train/eval throughput at its best-known batch size.

vs_baseline is relative to 2x a documented A100 estimate for ResNet-50 448²
mixed-precision training (~600 img/s/GPU -> baseline 1200), per BASELINE.md's
">=2x A100 images/sec/chip" target.

Run on the default (TPU) backend. ``--quick`` shortens for smoke tests;
``--model resnet50|bcnn`` restricts to one model (train only, legacy mode).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial

A100_RESNET50_448_TRAIN_IMG_S = 600.0  # documented estimate (see module docstring)
BASELINE_IMG_S = 2.0 * A100_RESNET50_448_TRAIN_IMG_S
V5E_PEAK_FLOP_S = 197e12  # TPU v5e bf16 MXU peak (per chip)

# Physical per-chip ceilings for the headline steps on this v5e, so the
# artifact carries its own context (the raw vs_baseline reads as failure
# while HEAD sits at ~98% of what the silicon permits — RESULTS.md):
# ResNet-50 448² bs128 training moves 146.2 GB/step (10-step xplane capture,
# tools/xplane_table.py); at the ~740 GB/s empirical streaming wall
# (independently confirmed by tools/hbm_canary.py) the byte floor is
# 197.6 ms, plus 14.2 ms of MXU-bound excess ⇒ ~212 ms ⇒ ~604 img/s.
# BCNN bs128: same closure from its own profile (RESULTS.md round-5).
R50_CEILING_IMG_S = 604.0
# BCNN bs128 (round-5 10-step capture): 333.5 ms/step device, 46.7 TF +
# 92.2 GB per step; per-op floor at max(flops/197TF, bytes/740GB) = 272.6 ms
# -> 469.6 img/s. OPTIMISTIC: ~101 ms of the step is f32-accumulating wgrad
# fusions measured at ~96 TF/s (at/near the f32 issue bound, not the bf16
# peak the floor assumes), so the true ceiling is materially lower and
# vs_ceiling here UNDERSTATES efficiency. HEAD 382.7 = 0.81x this bound.
BCNN_CEILING_IMG_S = 469.6


def _step_flops(fn, abstract):
    """Model FLOPs of one step via client-side HLO cost analysis. The remote
    (axon) backend can't analyze its own lowering, so lower the SAME function
    against the local CPU backend with abstract inputs — the HLO math (and
    its flop count) is identical. Returns None if analysis is unavailable.

    ORDERING CONTRACT (round-4 finding): this must run only AFTER every
    timed TPU loop in the process. Initializing the CPU client + lowering
    here before the TPU measurements was measured to depress BCNN train
    throughput 380 -> 331 img/s (the round-3 "pool kernel regression" was
    entirely this meter artifact). Deferring also makes the FORCE_LAX toggle
    safe by construction: the TPU step functions are traced (with the Pallas
    path) long before the flag ever flips for the CPU lowering."""
    import jax

    from hawkeye_tpu.ops import pool

    try:
        cpu = jax.local_devices(backend="cpu")[0]
        # the TPU Pallas pool kernels can't lower on CPU; the lax path has
        # the same model flop count (pools are flop-negligible)
        pool.FORCE_LAX = True
        try:
            # fresh wrapper function: pjit's jaxpr-tracing cache keys on the
            # callable object + avals (NOT the device), so jitting `fn`
            # itself would reuse the TPU-traced jaxpr — whose pallas_call
            # cannot lower on CPU (this was the null bcnn_mfu)
            stats = (jax.jit(lambda *a: fn(*a), device=cpu)
                     .lower(*abstract).cost_analysis())
        finally:
            pool.FORCE_LAX = False
        if isinstance(stats, (list, tuple)):
            stats = stats[0]
        flops = float(stats.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        if os.environ.get("HAWKEYE_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()
        return None


def build_model(name, stem_s2d):
    from hawkeye_tpu.config import ConfigNode
    from hawkeye_tpu.registry import MODEL

    if name == "bcnn":
        return MODEL.get("BCNN")(ConfigNode(
            {"num_classes": 200, "stage": 2,
             "fast_dgrad": bool(int(os.environ.get("HAWKEYE_FAST_DGRAD",
                                                   "0")))}))
    return MODEL.get("ResNet50")(ConfigNode(
        {"num_classes": 200, "stem_space_to_depth": bool(stem_s2d)}))


def measure_train(model, B, S, steps, warmup, *, remat=False, no_aug=False,
                  donate=True, real_batch=None, profile_dir=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from hawkeye_tpu.config import ConfigNode
    from hawkeye_tpu.data.transforms_device import make_train_augment
    from hawkeye_tpu.engine.optim import build_optimizer

    R = S * 8 // 7  # decode size (e.g. 512 for 448)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((2, S, S, 3), jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    has_bn = bool(batch_stats)

    tx, _ = build_optimizer(ConfigNode({"name": "SGD", "lr": 0.01,
                                        "momentum": 0.9, "weight_decay": 1e-4}))
    opt_state = tx.init(params)

    # feed the model bf16 directly: halves aug->model HBM traffic; the model
    # casts to bf16 internally anyway
    augment = make_train_augment(image_size=S, out_dtype=jnp.bfloat16)

    def loss_fn(params, batch_stats, x, y, drop_key):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
            out, mut = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
            new_stats = mut["batch_stats"]
        else:
            # the dropout key must be an ARGUMENT: creating PRNGKey(0) at
            # trace time materializes a constant on the ambient (axon)
            # backend, which poisons _step_flops' CPU lowering (this was
            # the null bcnn_mfu)
            out = model.apply(variables, x, train=True,
                              rngs={"dropout": drop_key})
            new_stats = batch_stats
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out["logits"], y).mean()
        return loss, new_stats

    if remat == "conv":
        # finer policy for the HBM-BW-bound step: keep conv/matmul outputs,
        # recompute the elementwise BN/relu chains in the backward — trades
        # cheap VPU FLOPs for activation reads/writes
        def _save_convs(prim, *_, **__):
            return prim.name in ("conv_general_dilated", "dot_general")

        loss_fn = jax.checkpoint(loss_fn, policy=_save_convs)
    elif remat:
        loss_fn = jax.checkpoint(loss_fn)

    donate_argnums = (0, 1, 2) if donate else ()

    def train_step_body(params, batch_stats, opt_state, key, raw_u8, labels):
        key, drop_key = jax.random.split(key)
        if no_aug:
            x = raw_u8[:, :S, :S, :].astype(jnp.float32) / 255.0
        else:
            x = augment(key, raw_u8)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, x, labels, drop_key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    train_step = jax.jit(train_step_body, donate_argnums=donate_argnums)

    # input: uint8 [B, R, R, 3] on device (synthetic CUB-shaped, or a real
    # decoded batch when --host-pipeline drives the full seam)
    host = np.random.RandomState(0)
    if real_batch is not None:
        raw = jax.device_put(np.ascontiguousarray(real_batch["img"]))
        labels = jax.device_put(
            np.asarray(real_batch["label"], np.int32) % 200)
    else:
        raw = jax.device_put(host.randint(0, 256, (B, R, R, 3), dtype=np.uint8))
        labels = jax.device_put(host.randint(0, 200, (B,)).astype(np.int32))

    # Anti-elision discipline for the axon tunnel (NEXT.md): inputs must
    # differ every step (the fresh rng key does that) and each timed segment
    # must END WITH A HOST FETCH — block_until_ready alone does not force
    # remote execution. The loss-progression assert catches silent replay.
    key = jax.random.PRNGKey(1)
    # capture abstract arg shapes now (donation frees the buffers later);
    # the actual FLOPs analysis is DEFERRED — see _step_flops ordering note
    abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            (params, batch_stats, opt_state, key, raw, labels))
    for _ in range(warmup):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, k, raw, labels)
    warm_loss = float(loss)

    if profile_dir:
        # capture the steady-state timed loop itself (tools/xplane_table.py
        # turns the .xplane.pb into the per-fusion roofline table)
        jax.profiler.start_trace(profile_dir)
    try:
        t0 = time.perf_counter()
        for _ in range(steps):
            key, k = jax.random.split(key)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, k, raw, labels)
        final_loss = float(loss)
        dt = time.perf_counter() - t0
    finally:
        if profile_dir:
            jax.profiler.stop_trace()
    if final_loss == warm_loss:
        raise RuntimeError("loss did not change over the timed steps — "
                           "suspected runtime replay; measurement invalid")
    img_s = B * steps / dt / jax.device_count()

    def mfu_thunk():
        # MFU: model FLOPs issued per second vs the chip's bf16 peak.
        # Deferred: call only after ALL timed loops (see _step_flops).
        step_flops = _step_flops(train_step_body, abstract)
        return (step_flops * (img_s / B) / V5E_PEAK_FLOP_S
                if step_flops else None)

    return img_s, mfu_thunk


def measure_eval(model, B, S, steps, warmup):
    """Center-crop eval forward, chained so the tunnel runtime can't elide it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    R = S * 8 // 7
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((2, S, S, 3), jnp.float32), train=False)
    off = (R - S) // 2
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.bfloat16)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.bfloat16)

    @jax.jit
    def eval_step(variables, raw_u8, acc):
        x = raw_u8[:, off:off + S, off:off + S, :].astype(jnp.bfloat16) / 255.0
        x = (x - mean) / std
        out = model.apply(variables, x, train=False)
        # chain: fold predictions into acc so every step's output is consumed
        return acc + jnp.argmax(out["logits"], axis=-1).sum()

    host = np.random.RandomState(0)
    raw = jax.device_put(host.randint(0, 256, (B, R, R, 3), dtype=np.uint8))
    acc = jnp.zeros((), jnp.int32)
    for _ in range(warmup):
        acc = eval_step(variables, raw, acc)
    int(acc)  # host fetch: forces execution (block_until_ready is not enough)
    t0 = time.perf_counter()
    for _ in range(steps):
        acc = eval_step(variables, raw, acc)
    int(acc)
    dt = time.perf_counter() - t0
    return B * steps / dt / jax.device_count()


def measure_host_pipeline(steps, *, batch_size=64, decode_size=512,
                          image_size=448, workers=None, data_root=None,
                          meta=None, train_step=True):
    """Sustained disk→device feed rate: JPEG files → native C++ decoder
    (thread pool) → collate, then one real batch through device aug + a
    448² train step (end-to-end seam check). Uses the committed fixture
    JPEGs unless --data-root/--meta point at a real dataset."""
    import os

    from hawkeye_tpu.data import DataLoader, FGDataset, RandomBatchSampler
    from hawkeye_tpu.data import native_decoder
    from hawkeye_tpu.data.loader import default_collate

    here = os.path.dirname(os.path.abspath(__file__))
    data_root = data_root or os.path.join(here, "tests", "fixtures", "images")
    meta = meta or os.path.join(here, "tests", "fixtures", "meta", "train.txt")
    workers = workers or os.cpu_count()
    native = native_decoder.get_lib() is not None

    ds = FGDataset(data_root, meta, decode_size=decode_size)
    # loop epochs over a small fixture set: the steady-state cost is decode
    # (page cache holds the bytes either way)
    batch_size = min(batch_size, len(ds))
    sampler = RandomBatchSampler(len(ds), batch_size, drop_last=True, seed=0)
    loader = DataLoader(ds, sampler, num_workers=workers,
                        collate_fn=default_collate, prefetch_batches=2)

    def run_epochs(n_batches):
        seen = 0
        t0 = time.perf_counter()
        epoch = 0
        while seen < n_batches:
            loader.set_epoch(epoch)
            for batch in loader:
                seen += 1
                if seen >= n_batches:
                    break
            epoch += 1
        return seen * batch_size / (time.perf_counter() - t0)

    run_epochs(2)  # warm page cache + thread pool
    loader_img_s = run_epochs(max(steps, 4))

    result = {
        "metric": "host_pipeline_images_per_sec",
        "value": round(loader_img_s, 2),
        "unit": "images/sec",
        "decode_size": decode_size,
        "decode_workers": workers,
        "native_decoder": native,
        "host_cores": os.cpu_count(),
        # feed budget for the north-star train rate (588 img/s/chip):
        # decode scales with cores (GIL released in the native decoder)
        "cores_to_feed_588": round(588.0 / max(loader_img_s, 1e-9)
                                   * os.cpu_count(), 1),
    }
    if train_step:
        import jax
        import jax.numpy as jnp

        from hawkeye_tpu.config import ConfigNode
        from hawkeye_tpu.registry import MODEL

        batch = next(iter(loader))
        model = MODEL.get("ResNet50")(ConfigNode({"num_classes": 200}))
        img_s, _ = measure_train(model, int(batch["img"].shape[0]),
                                 image_size, 3, 1, real_batch=batch)
        result["train_step_from_disk_images_per_sec"] = round(img_s, 2)
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--image-size", type=int, default=448)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--repeats", type=int, default=3,
                        help="median-of-N for the headline train numbers "
                        "(full-matrix mode)")
    parser.add_argument("--no-aug", action="store_true",
                        help="skip device augmentation (ablation)")
    parser.add_argument("--no-donate", action="store_true")
    parser.add_argument("--remat", nargs="?", const=True, default=False,
                        choices=[True, False, "conv"],
                        help="rematerialize the forward in the backward: "
                             "bare flag = full remat (enables larger "
                             "batches); 'conv' = save conv/dot outputs only "
                             "(recompute elementwise, cuts HBM traffic)")
    parser.add_argument("--no-stem-s2d", action="store_true",
                        help="disable the space-to-depth stem (ablation; "
                             "numerics are identical either way)")
    parser.add_argument("--model", choices=["all", "resnet50", "bcnn"],
                        default="all",
                        help="'all' = the full train+eval matrix (default); "
                             "a model name = train-only single measurement")
    parser.add_argument("--bcnn-batch-size", type=int, default=128)
    # bs sweep (448², v5e, argmax-index pools): 96→345, 112→362, 128→378,
    # 144/160→compile OOM.  (Round-2 path peaked at 112→333.)
    parser.add_argument("--eval-batch-size", type=int, default=256)
    parser.add_argument("--host-pipeline", action="store_true",
                        help="measure the disk→decoder→loader feed rate and "
                        "one real-batch 448² train step instead of the "
                        "device matrix")
    parser.add_argument("--data-root", default=None,
                        help="image root for --host-pipeline (default: the "
                        "committed JPEG fixtures)")
    parser.add_argument("--meta", default=None,
                        help="metadata list for --host-pipeline")
    parser.add_argument("--workers", type=int, default=None,
                        help="decode threads for --host-pipeline "
                        "(default: all cores)")
    parser.add_argument("--no-train-step", action="store_true",
                        help="--host-pipeline: skip the device train step "
                        "(loader-only measurement, no TPU needed)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the timed "
                        "train loop (single-model mode only); feed the DIR "
                        "to tools/xplane_table.py for the per-fusion table")
    args = parser.parse_args()
    if args.quick:
        args.steps, args.warmup = 5, 2
        args.batch_size, args.bcnn_batch_size, args.eval_batch_size = 16, 8, 16

    import hawkeye_tpu.models  # noqa: F401  (populate the registry)

    if args.host_pipeline:
        print(json.dumps(measure_host_pipeline(
            args.steps, batch_size=min(args.batch_size, 64),
            image_size=args.image_size, workers=args.workers,
            data_root=args.data_root, meta=args.meta,
            train_step=not args.no_train_step)))
        return

    stem_s2d = not args.no_stem_s2d
    B, S = args.batch_size, args.image_size

    if args.model != "all":  # legacy single-model train measurement
        name = args.model
        if name == "bcnn" and B == 128:
            B = args.bcnn_batch_size
        model = build_model(name, stem_s2d)
        img_s, mfu_thunk = measure_train(model, B, S, args.steps, args.warmup,
                                         remat=args.remat, no_aug=args.no_aug,
                                         donate=not args.no_donate,
                                         profile_dir=args.profile)
        mfu = mfu_thunk()  # AFTER the timed loop (see _step_flops)
        print(json.dumps({
            "metric": f"{name}_448_train_images_per_sec_per_chip",
            "value": round(img_s, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(img_s / BASELINE_IMG_S, 4),
            "mfu": round(mfu, 4) if mfu else None,
        }))
        return

    resnet = build_model("resnet50", stem_s2d)
    bcnn = build_model("bcnn", stem_s2d)

    def median_train(model, batch, **kw):
        """Median-of-N train measurement (±1-2% run-to-run spread through
        the tunnel makes single runs unable to support small claims —
        round-4 VERDICT weak #3). Compile is cached after the first run."""
        runs, thunk = [], None
        for _ in range(max(1, args.repeats)):
            img_s, thunk = measure_train(model, batch, S, args.steps,
                                         args.warmup, **kw)
            runs.append(img_s)
        runs_sorted = sorted(runs)
        med = runs_sorted[len(runs_sorted) // 2]
        spread = ((max(runs) - min(runs)) / med * 100.0) if med else 0.0
        return med, runs, round(spread, 2), thunk

    train_r50, runs_r50, spread_r50, mfu_r50_thunk = median_train(
        resnet, B, remat=args.remat, no_aug=args.no_aug,
        donate=not args.no_donate)
    eval_r50 = measure_eval(resnet, args.eval_batch_size, S,
                            args.steps, args.warmup)
    train_bcnn, runs_bcnn, spread_bcnn, mfu_bcnn_thunk = median_train(
        bcnn, args.bcnn_batch_size, donate=not args.no_donate)
    eval_bcnn = measure_eval(bcnn, args.eval_batch_size, S,
                             args.steps, args.warmup)
    # FLOPs/MFU analysis strictly after every timed loop (see _step_flops)
    mfu_r50 = mfu_r50_thunk()
    mfu_bcnn = mfu_bcnn_thunk()
    print(json.dumps({
        "metric": "resnet50_448_train_images_per_sec_per_chip",
        "value": round(train_r50, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(train_r50 / BASELINE_IMG_S, 4),
        "ceiling_img_s": R50_CEILING_IMG_S,
        "vs_ceiling": round(train_r50 / R50_CEILING_IMG_S, 4),
        "train_images_per_sec": round(train_r50, 2),
        "train_runs": [round(r, 1) for r in runs_r50],
        "train_spread_pct": spread_r50,
        "mfu": round(mfu_r50, 4) if mfu_r50 else None,
        "eval_images_per_sec": round(eval_r50, 2),
        "bcnn_train_images_per_sec": round(train_bcnn, 2),
        "bcnn_train_runs": [round(r, 1) for r in runs_bcnn],
        "bcnn_train_spread_pct": spread_bcnn,
        "bcnn_ceiling_img_s": BCNN_CEILING_IMG_S,
        "bcnn_vs_ceiling": (round(train_bcnn / BCNN_CEILING_IMG_S, 4)
                            if BCNN_CEILING_IMG_S else None),
        "bcnn_mfu": round(mfu_bcnn, 4) if mfu_bcnn else None,
        "bcnn_eval_images_per_sec": round(eval_bcnn, 2),
        "batch_size": B,
        "bcnn_batch_size": args.bcnn_batch_size,
        "eval_batch_size": args.eval_batch_size,
        "stem_space_to_depth": stem_s2d,
    }))


if __name__ == "__main__":
    main()
