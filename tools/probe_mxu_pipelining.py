#!/usr/bin/env python
"""TPU microbenchmark: do consecutive INDEPENDENT small dots pipeline?

The sphere MLP kernel is matmul-latency-bound: 24 serially-dependent
~104×256×256 dots/step at ~0.3 µs each vs ~55 ns of pure MXU compute
(docs/architecture.md). The grid kernel runs sweep rows as sequential
pallas grid cells, so cross-row independence is never exposed to the
scheduler. IF the MXU can overlap weight staging / pipeline fill across
independent back-to-back dots, interleaving R rows inside one grid cell
would lift the sphere one-launch aggregate toward throughput-bound.

This probe settles that question in ~1 min on hardware, without touching
the kernels:

  A. serial chain:   y ← dot(y, W_i), 24 dots, each depends on the last
  B. independent:    y_r ← dot(y_r, W_{r,i}), R=2 interleaved chains,
                     48 dots, consecutive dots independent
  C. independent:    R=4 chains, 96 dots

All dots are 104×256×256 f32 (the sphere shape after padding). If
time(B) ≈ time(A) per-dot, independence buys nothing (the cost is weight
staging that every distinct-weight dot pays) — don't build the interleaved
kernel. If per-dot time drops materially, build it.

Run:  python tools/probe_mxu_pipelining.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 104, 256, 256
# 8 distinct weight matrices per chain (not the sphere's 24: 4 chains ×
# 24 × 256×256 f32 would blow the ~16 MB VMEM; 8 still forces a weight
# restage on every consecutive dot, which is the cost under test)
DEPTH = 8
STEPS = 6000  # fori_loop trips inside the kernel per timed call


def make_kernel(n_chains: int):
    def kernel(*refs):
        x_refs = refs[:n_chains]
        w_refs = refs[n_chains:2 * n_chains]  # each (DEPTH*K, N) stacked
        o_refs = refs[2 * n_chains:]

        def body(_, ys):
            outs = []
            for d in range(DEPTH):
                # issue chain r's depth-d dot back-to-back with the other
                # chains' — consecutive dots share NO operands
                nxt = []
                for r in range(n_chains):
                    w = w_refs[r][d * K:(d + 1) * K, :]
                    nxt.append(jnp.dot(ys[r], w,
                                       preferred_element_type=jnp.float32))
                ys = tuple(nxt)
                outs = ys
            # renormalize so the loop doesn't overflow across steps
            return tuple(y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6))
                         for y in outs)

        ys = tuple(x_refs[r][:] for r in range(n_chains))
        ys = jax.lax.fori_loop(0, STEPS, body, ys)
        for r in range(n_chains):
            o_refs[r][:] = ys[r]

    return kernel


def run(n_chains: int) -> float:
    key = jax.random.PRNGKey(0)
    xs = [jax.random.normal(jax.random.fold_in(key, r), (M, K), jnp.float32)
          for r in range(n_chains)]
    ws = [jax.random.normal(jax.random.fold_in(key, 100 + r),
                            (DEPTH * K, N), jnp.float32) * 0.05
          for r in range(n_chains)]
    f = pl.pallas_call(
        make_kernel(n_chains),
        out_shape=[jax.ShapeDtypeStruct((M, N), jnp.float32)] * n_chains,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_chains),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_chains,
    )
    f = jax.jit(f)
    out = f(*xs, *ws)
    float(np.asarray(out[0])[0, 0])  # force completion through data chain
    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*xs, *ws)
        float(np.asarray(out[0])[0, 0])
        best = min(best, time.perf_counter() - t0)
    n_dots = STEPS * DEPTH * n_chains
    per_dot_ns = best / n_dots * 1e9
    print(f"chains={n_chains}: {best*1e3:8.2f} ms for {n_dots} dots "
          f"-> {per_dot_ns:7.1f} ns/dot")
    return per_dot_ns


def main() -> int:
    print(f"devices: {jax.devices()}", file=sys.stderr)
    a = run(1)
    b = run(2)
    c = run(4)
    print(f"independence speedup: x2={a/b:.2f}  x4={a/c:.2f} "
          f"(>1.3 => interleaving the sphere grid kernel pays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
