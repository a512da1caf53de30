#!/usr/bin/env python
"""Standalone HBM-streaming canary: measures achieved device memory
bandwidth with kernels that do nothing but stream, independent of any model
profile. Purpose (round-5 VERDICT item 2): the ResNet-50 roofline ceiling in
RESULTS.md was derived from the train step's own xplane capture (~740 GB/s
best-fusion wall); this gives that wall a non-self-referential measurement.

Kernels (all jitted, donated, f32 unless --dtype):
  copy   y = x * s            (read N + write N  = 2 moves)
  triad  y = s * x + y        (read 2N + write N = 3 moves)
  scale2 y = (x + y) * s ...chained twice — a deeper elementwise pipe

Axon-tunnel anti-replay discipline (NEXT.md): every dispatch takes a unique
scalar `s`, and each timed segment ends with a host fetch of a data-dependent
element. Compile excluded (warmup first).

Usage: python tools/hbm_canary.py [--gib 2] [--steps 30] [--dtype f32]
Prints one JSON line with achieved GB/s per kernel and the max.
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=2.0,
                    help="size of EACH operand buffer in GiB")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--inner", type=int, default=10,
                    help="fori_loop sweeps per dispatch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    itemsize = 4 if args.dtype == "f32" else 2
    n = int(args.gib * (1 << 30) / itemsize)
    # 2-D shape keeps XLA happy with large buffers; lane-friendly minor dim
    minor = 4096
    n = (n // minor) * minor
    shape = (n // minor, minor)
    nbytes = n * itemsize

    x = jnp.ones(shape, dtype)
    y = jnp.zeros(shape, dtype)
    K = args.inner  # sweeps per dispatch: amortizes tunnel dispatch cost
    # (first cut ran ONE sweep per dispatch and read 415/565 GB/s — the
    # ~2-3 ms remote-dispatch overhead on an ~11 ms kernel, not the wall)

    def _s_i(s, i):
        # per-iteration jitter computed in f32 (1e-8 underflows in bf16,
        # which would let XLA fold the K multiplies into one) then cast
        return (s.astype(jnp.float32) + 1e-8 * i).astype(dtype)

    @jax.jit
    def copy_loop(x, s):
        # ping-pong x = x * s, K times: 2 moves (read+write) per sweep
        def body(i, x):
            return x * _s_i(s, i)
        return jax.lax.fori_loop(0, K, body, x)

    @jax.jit
    def triad_loop(x, y, s):
        # y = s*x + y, K times: 3 moves per sweep
        def body(i, y):
            return _s_i(s, i) * x + y
        return jax.lax.fori_loop(0, K, body, y)

    @jax.jit
    def read_loop(x, s):
        # read-only stream: per-row max folded into a [minor]-wide carry,
        # 1 move (read N) per sweep
        def body(i, acc):
            return acc + jnp.max(x * _s_i(s, i), axis=0)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((shape[1],), dtype))

    def run(fn, buffers, moves):
        """moves = N-sized HBM transfers per sweep (K sweeps per dispatch)."""
        out = None
        for i in range(args.warmup):
            s = jnp.asarray(1.0 + 1e-7 * i, dtype)
            out = fn(*buffers, s)
        # fetch one data-dependent element: forces remote execution
        float(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for i in range(args.steps):
            s = jnp.asarray(1.0 + 1e-7 * (args.warmup + i), dtype)
            out = fn(*buffers, s)
        float(out.reshape(-1)[0])
        dt = time.perf_counter() - t0
        gbs = moves * K * nbytes * args.steps / dt / 1e9
        return round(gbs, 1)

    results = {
        "metric": "hbm_stream_gb_s",
        "buffer_gib": round(nbytes / (1 << 30), 3),
        "dtype": args.dtype,
        "steps": args.steps,
        "sweeps_per_dispatch": K,
        "device": str(jax.devices()[0]),
        "copy_gb_s": run(copy_loop, (x,), 2),
        "triad_gb_s": run(triad_loop, (x, y), 3),
        "read_gb_s": run(read_loop, (x,), 1),
    }
    results["value"] = max(results["copy_gb_s"], results["triad_gb_s"],
                           results["read_gb_s"])
    results["unit"] = "GB/s"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
