"""Probe: are the MLP kernel's serially-dependent small dots latency-bound
enough that interleaving TWO independent chains is nearly free?

The sphere kernel runs ~24 serially-dependent 104x256x256 dots per step
(docs/architecture.md "MLP kernel" accounting) and sits ~6x above the MXU
throughput floor. If the gap is pipeline fill/drain per small dot, a second
INDEPENDENT chain interleaved op-by-op should hide inside the first chain's
stalls: 2x the work at << 2x the wall time. That would justify processing
two grid rows per pallas grid step in kernels/mlp_vae.py.

Usage: python tools/probe_mlp_interleave.py [n_steps]
Prints per-variant wall times; VERDICT line gives the interleave cost ratio.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 104  # batch row tile (batch 100)
W = 256  # padded hidden width (200 -> 256)
DEPTH = 24  # dots per simulated step


def _chain_kernel(n_steps: int, n_chains: int):
    def kernel(*refs):
        x_refs = refs[:n_chains]
        w_refs = refs[n_chains:2 * n_chains]
        o_refs = refs[2 * n_chains:]

        def body(i, carry):
            hs = list(carry)
            for d in range(DEPTH):
                # interleave the chains op-by-op (source order drives the
                # Mosaic schedule); each dot depends on the previous dot of
                # ITS OWN chain only
                for c in range(n_chains):
                    hs[c] = jnp.dot(hs[c], w_refs[c][:],
                                    preferred_element_type=jnp.float32)
                for c in range(n_chains):
                    hs[c] = jnp.minimum(hs[c], 8.0)  # keep values bounded
            return tuple(hs)

        out = jax.lax.fori_loop(
            0, n_steps, body, tuple(r[:] for r in x_refs))
        for c in range(n_chains):
            o_refs[c][:] = out[c]

    return kernel


def run(n_steps: int, n_chains: int):
    xs = [jnp.full((ROWS, W), 0.01 * (c + 1), jnp.float32)
          for c in range(n_chains)]
    ws = [jnp.eye(W, dtype=jnp.float32) * (1.0 + 1e-4 * c)
          for c in range(n_chains)]
    fn = pl.pallas_call(
        _chain_kernel(n_steps, n_chains),
        out_shape=[jax.ShapeDtypeStruct((ROWS, W), jnp.float32)] * n_chains,
        cost_estimate=pl.CostEstimate(
            flops=2 * ROWS * W * W * DEPTH * n_steps * n_chains,
            bytes_accessed=4 * ROWS * W * 2 * n_chains,
            transcendentals=0,
        ),
    )
    jfn = jax.jit(fn)
    out = jfn(*xs, *ws)
    # force warmup completion through the data chain too —
    # block_until_ready can return early on the tunnel runtime (CLAUDE.md),
    # which would leak warmup execution into the timed window
    sum(float(o[0, 0]) for o in out)
    t0 = time.perf_counter()
    out = jfn(*xs, *ws)
    s = sum(float(o[0, 0]) for o in out)
    dt = time.perf_counter() - t0
    return dt, s


def main():
    # default sized so the 1-chain window is >~1 s of device work (CLAUDE.md
    # timing rule: amortize the tunnel's up-to-29 ms dispatch RTT below the
    # percent level; 24 dots/step at ~150 ns/dot → ~3.7 µs/step)
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    print(f"chain: {DEPTH} serially-dependent {ROWS}x{W}x{W} dots/step, "
          f"{n_steps} steps")
    results = {}
    for n_chains in (1, 2, 1, 2, 4):
        dt, s = run(n_steps, n_chains)
        per = dt / n_steps * 1e6
        results.setdefault(n_chains, []).append(per)
        print(f"  chains={n_chains}: {dt:.3f}s total, {per:.3f} us/step "
              f"(checksum {s:.3f})")
    one = min(results[1])
    two = min(results[2])
    four = min(results[4])
    print(f"VERDICT: 2-chain cost ratio {two / one:.2f}x for 2x work "
          f"(aggregate win {2 * one / two:.2f}x); "
          f"4-chain {four / one:.2f}x for 4x work "
          f"(win {4 * one / four:.2f}x)")


if __name__ == "__main__":
    main()
