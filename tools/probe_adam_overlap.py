"""Probe: does interleaving Adam (VPU elementwise) between the MLP kernel's
serially-dependent dots (MXU) let the two units overlap?

The sphere MLP step splits ~2.9 us Adam + ~2.4 us dot chain + ~0.8 us rest
(docs/architecture.md, cache-cleared ablation) and the parts SUM to the
measured step — i.e. today the units run back-to-back, not overlapped. The
kernel currently computes all gradients, then runs all Adam updates in a
tail loop (kernels/mlp_vae.py:368-379). But each layer's dW is final as
soon as the backward chain passes that layer, so its Adam update could be
issued BETWEEN the remaining backward dots. If Mosaic's schedule (driven by
source order) lets VPU work hide inside MXU pipeline stalls, the step floor
drops toward max(Adam, dots) ~ 3.7 us (~+60%). If time(interleaved) ==
time(tail), source order doesn't reach the hardware and the kernel stays
as-is.

Both variants execute IDENTICAL dataflow: N_BUF*DOTS_PER_BUF (25)
serially-dependent 104x256x256 dots per step consuming the step's initial
weights, plus one Adam update per (256,256) buffer x N_BUF (5) whose
gradient depends on the chain's progress at that buffer's position
(matching the real backward structure: grad d is ready after dot 5d+4).
Only the source order of the Adam ops differs: tail (variant A) vs
interleaved every DOTS_PER_BUF (5) dots (variant B).

Usage: python tools/probe_adam_overlap.py [n_steps]
"""

from __future__ import annotations

import math
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROWS = 104   # batch row tile (batch 100)
W = 256      # padded hidden width (200 -> 256)
N_BUF = 5    # weight matrices (~328k params x3 Adam slots; real config 393k)
DOTS_PER_BUF = 5  # 25 dots total, grad for buffer d ready after dot 5d+4

B1, B2, EPS = 0.9, 0.999, 1e-8


def _adam(p, m, v, g, t, lr):
    m = B1 * m + (1.0 - B1) * g
    v = B2 * v + (1.0 - B2) * g * g
    bc2_sqrt = jnp.sqrt(1.0 - jnp.exp(t * math.log(B2)))
    lr_t = lr * bc2_sqrt / (1.0 - jnp.exp(t * math.log(B1)))
    return p - lr_t * m / (jnp.sqrt(v) + EPS * bc2_sqrt), m, v


def _kernel(n_steps: int, interleave: bool):
    def kernel(x_ref, *refs):
        w_refs = refs[:N_BUF]
        m_refs = refs[N_BUF:2 * N_BUF]
        v_refs = refs[2 * N_BUF:3 * N_BUF]
        out_refs = refs[3 * N_BUF:]

        def body(i, carry):
            h, ws, ms, vs = carry
            t = i.astype(jnp.float32) + 1.0
            new = [None] * N_BUF

            def grad_for(d, h_now):
                # (256,256) grad depending on the chain's progress at dot
                # 5d+4 — a VPU reduce+broadcast, identical in both variants
                col = jnp.mean(h_now, axis=0, keepdims=True)
                return jnp.broadcast_to(col, (W, W)) * (1e-6 * (d + 1))

            for d in range(N_BUF):
                for _ in range(DOTS_PER_BUF):
                    h = jnp.minimum(
                        jnp.dot(h, ws[d], preferred_element_type=jnp.float32),
                        8.0)
                if interleave:
                    new[d] = _adam(ws[d], ms[d], vs[d], grad_for(d, h), t,
                                   1e-9)
            if not interleave:
                for d in range(N_BUF):
                    new[d] = _adam(ws[d], ms[d], vs[d], grad_for(d, h), t,
                                   1e-9)
            # NOTE the tail variant's grads all use the FINAL h while the
            # interleaved ones use h at dot 3d+2 — with lr=1e-9 and the
            # min-clamp the trajectories stay bounded either way, and the
            # comparison is of schedules, not values (checksums printed so
            # neither variant is DCE'd).
            return (h, tuple(n[0] for n in new), tuple(n[1] for n in new),
                    tuple(n[2] for n in new))

        init = (x_ref[:], tuple(r[:] for r in w_refs),
                tuple(r[:] for r in m_refs), tuple(r[:] for r in v_refs))
        h, ws, ms, vs = jax.lax.fori_loop(0, n_steps, body, init)
        out_refs[0][:] = h
        for d in range(N_BUF):
            out_refs[1 + d][:] = ws[d]
            out_refs[1 + N_BUF + d][:] = ms[d]
            out_refs[1 + 2 * N_BUF + d][:] = vs[d]

    return kernel


def run(n_steps: int, interleave: bool):
    x = jnp.full((ROWS, W), 0.01, jnp.float32)
    ws = [jnp.eye(W, dtype=jnp.float32) * (1.0 + 1e-4 * d)
          for d in range(N_BUF)]
    zeros = [jnp.zeros((W, W), jnp.float32) for _ in range(N_BUF)]
    out_shape = ([jax.ShapeDtypeStruct((ROWS, W), jnp.float32)]
                 + [jax.ShapeDtypeStruct((W, W), jnp.float32)] * (3 * N_BUF))
    fn = pl.pallas_call(
        _kernel(n_steps, interleave),
        out_shape=out_shape,
        # alias w/m/v in-place like the real kernel — 25 live (256,256)
        # buffers each way would blow the 16 MB scoped-VMEM limit
        input_output_aliases={1 + k: 1 + k for k in range(3 * N_BUF)},
        cost_estimate=pl.CostEstimate(
            flops=2 * ROWS * W * W * N_BUF * DOTS_PER_BUF * n_steps,
            bytes_accessed=4 * W * W * 6 * N_BUF,
            transcendentals=2 * n_steps,
        ),
    )
    jfn = jax.jit(fn)
    out = jfn(x, *ws, *zeros, *zeros)
    s = float(out[0][0, 0]) + float(out[1][0, 0])  # force completion
    t0 = time.perf_counter()
    out = jfn(x, *ws, *zeros, *zeros)
    s = float(out[0][0, 0]) + float(out[1][0, 0])
    dt = time.perf_counter() - t0
    return dt, s


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    print(f"{N_BUF * DOTS_PER_BUF} serial {ROWS}x{W}x{W} dots + Adam over "
          f"{N_BUF}x{W}x{W} params/step, {n_steps} steps")
    res = {}
    for label, inter in (("tail", False), ("interleaved", True),
                         ("tail", False), ("interleaved", True)):
        dt, s = run(n_steps, inter)
        per = dt / n_steps * 1e6
        res.setdefault(label, []).append(per)
        print(f"  {label:12s}: {dt:.3f}s, {per:.3f} us/step (checksum {s:.4f})")
    tail = min(res["tail"])
    inter = min(res["interleaved"])
    print(f"VERDICT: interleaved/tail = {inter / tail:.3f}x "
          f"({'OVERLAP — restructure the kernel' if inter < 0.93 * tail else 'no overlap — keep the tail loop'})")


if __name__ == "__main__":
    main()
