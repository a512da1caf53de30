"""Capture a jax.profiler trace of one method's train step (bench harness)."""
import argparse, sys, time
import bench_methods as bm
import importlib
import jax, jax.numpy as jnp
import hawkeye_tpu.models  # noqa

p = argparse.ArgumentParser()
p.add_argument("--method", required=True)
p.add_argument("--out", default="/tmp/perf/trace_m")
p.add_argument("--batch-size", type=int, default=None)
p.add_argument("--steps", type=int, default=5)
args = p.parse_args()

config_path, module_name, cls_name = bm.CASES[args.method]
cfg = bm._bench_config(config_path, args.batch_size)
trainer = getattr(importlib.import_module(module_name), cls_name)(cfg)
trainer.epoch = 0
trainer.on_start_epoch()
batch = next(iter(trainer.dataloaders["train"]))
db = trainer.prepare_batch(batch, train=True)
lr0 = float(trainer.scheduler.epoch_lr(0)) or 1e-4
lr_i = lambda i: jnp.asarray(lr0 * (1.0 + 1e-6 * (i % 97)), jnp.float32)

m = None
for i in range(4):
    trainer.state, m = trainer.train_step_call(db, lr_i(i))
print("warm loss", float(m["loss"]), flush=True)

jax.profiler.start_trace(args.out)
for i in range(args.steps):
    trainer.state, m = trainer.train_step_call(db, lr_i(4 + i))
print("final loss", float(m["loss"]), flush=True)
jax.profiler.stop_trace()
print("trace written to", args.out)
