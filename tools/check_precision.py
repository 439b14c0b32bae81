#!/usr/bin/env python
"""TPU check for --precision semantics (run on a real TPU; ~1 min).

Verifies, on hardware, the three facts the flag's design rests on:

1. A DEFAULT f32 Pallas dot is single-pass bf16-operand: its output is
   bit-identical to the same dot with operands explicitly cast to bfloat16,
   and differs from host-numpy fp32 by O(bf16 rounding).
2. ``precision=Precision.HIGHEST`` recovers true fp32 (diff vs host numpy
   drops by ~3 orders of magnitude).
3. The fused MLP kernel's trajectories under --precision bf16 vs fp32
   actually diverge (the flag reaches the kernel), while CPU-interpret
   equivalence tests (tests/test_mlp_kernel.py) pin both modes' math.

Exits nonzero if any check fails. Not a pytest test: the suite runs on the
CPU backend where 1-2 are vacuous (see test_mlp_kernel.py fp32_dots tests).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def check_dot_modes():
    def mk(mode):
        def k(x_ref, w_ref, o_ref):
            x, w = x_ref[:], w_ref[:]
            if mode == "cast":
                x, w = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
            prec = jax.lax.Precision.HIGHEST if mode == "highest" else None
            o_ref[:] = jnp.dot(x, w, preferred_element_type=jnp.float32,
                               precision=prec)
        return k

    x = jax.random.normal(jax.random.PRNGKey(0), (128, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 256), jnp.float32)
    ref = np.asarray(x) @ np.asarray(w)
    out = {}
    for mode in ("default", "cast", "highest"):
        f = pl.pallas_call(
            mk(mode), out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32))
        out[mode] = np.asarray(f(x, w))
    d_def = float(np.abs(out["default"] - ref).max())
    d_hi = float(np.abs(out["highest"] - ref).max())
    print(f"default vs host fp32 maxdiff: {d_def:.3e}")
    print(f"highest vs host fp32 maxdiff: {d_hi:.3e}")
    assert np.array_equal(out["default"], out["cast"]), (
        "default f32 dot is NOT single-pass bf16 on this toolchain")
    assert d_hi < d_def / 100, "HIGHEST did not recover fp32 accuracy"
    print("dot modes: OK (default==explicit-bf16; HIGHEST~fp32)")


def check_kernel_divergence():
    sys.path.insert(0, ".")
    import bench

    losses = {}
    for prec in ("bf16", "fp32"):
        tr = bench.build("auto", "sphere", prec)
        _, l = tr.fns.train_chunk(tr.state, 50)
        losses[prec] = np.asarray(l)
    assert losses["bf16"][0] != losses["fp32"][0], (
        "--precision fp32 did not change the fused kernel's first step")
    print(f"kernel step-1 loss bf16={losses['bf16'][0]:.6f} "
          f"fp32={losses['fp32'][0]:.6f} — flag reaches the kernel: OK")


if __name__ == "__main__":
    if jax.default_backend() not in ("tpu", "axon"):
        print("run on a TPU backend", file=sys.stderr)
        sys.exit(2)
    check_dot_modes()
    check_kernel_divergence()
    print("all precision checks passed")
