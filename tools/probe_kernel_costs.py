"""Probe: empirical cost split of the fused linear kernel on hardware.

Times run_fused_chunk on the linear sweep config (batch 100, ambient 12,
latent 20) under targeted mutations of the kernel internals, to direct
optimization at the component that actually pays:

- baseline            : the production kernel
- cheap-adam          : _adam monkeypatched to plain SGD (p - lr*g) — the
                        delta bounds the FULL Adam elementwise cost
                        (12 ops x 3 param sets + m/v state churn)
- no-noise            : _normal_block_pair monkeypatched to constant blocks
                        — the delta bounds the PRNG + Box-Muller cost

Each window is >= 1 s of device work and completion is forced through the
data chain (CLAUDE.md timing rules).

Usage: python tools/probe_kernel_costs.py [n_steps_per_chunk]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import vae_training_tpu.kernels.linear_vae as lv  # noqa: E402

BATCH = 100
DATA_DIM = 12
LATENT = 20
INTRINSIC = 4


def build_inputs():
    import numpy as np

    rng = np.random.RandomState(0)
    a = rng.randn(INTRINSIC, DATA_DIM).astype("float32")
    a_t = jnp.zeros((lv.N, lv.N), jnp.float32).at[:INTRINSIC, :DATA_DIM].set(a)
    mats = [jnp.zeros((lv.N, lv.N), jnp.float32) for _ in range(10)]
    vecs = [jnp.zeros((8, lv.N), jnp.float32) for _ in range(2)]
    we = mats[0].at[:DATA_DIM, :LATENT].set(
        rng.randn(DATA_DIM, LATENT).astype("float32") * 0.1)
    wd = mats[1].at[:LATENT, :DATA_DIM].set(
        rng.randn(LATENT, DATA_DIM).astype("float32") * 0.1)
    buffers = (we, wd, mats[2], vecs[0], mats[3], mats[4], mats[5],
               mats[6], mats[7], mats[8], vecs[1],
               jnp.zeros((8, lv.N), jnp.float32))
    return a_t, buffers


def timed(n_steps: int, reps: int):
    a_t, buffers = build_inputs()

    def chunk(bufs, seed):
        return lv.run_fused_chunk(
            n_steps=n_steps, seed_and_t0=seed, a_t=a_t, buffers=bufs,
            batch=BATCH, data_dim=DATA_DIM, latent_dim=LATENT,
            intrinsic_dim=INTRINSIC, var_added=0.0, eps_const=-1.0,
            tdv=True, lr=1e-3)

    jfn = jax.jit(chunk, donate_argnums=(0,))
    bufs, losses = jfn(buffers, jnp.array([3, 0], jnp.int32))
    float(losses[-1])  # force warmup completion through the data chain
    t0 = time.perf_counter()
    for r in range(reps):
        bufs, losses = jfn(bufs, jnp.array([3 + r, 0], jnp.int32))
    s = float(losses[-1])
    dt = time.perf_counter() - t0
    assert s == s, "NaN loss"
    return dt / (n_steps * reps) * 1e9  # ns/step


def main():
    # 5000-step chunks (the production chunk length — the (n_steps, 1) loss
    # buffer is VMEM-resident and lane-padded, so big chunks OOM VMEM)
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    reps = 240  # ~1.6 s+ per timed window at the production rate
    rounds = 3  # interleave variants so session drift hits all equally

    real_adam = lv._adam
    real_pair = lv._normal_block_pair
    real_uniform = lv._uniform

    def with_cheap_adam():
        lv._adam = lambda p, m, v, g, t, lr: (p - lr * g, m, v)

    def with_no_noise():
        # CAUTION (learned the hard way): CONSTANT stand-in noise lets
        # Mosaic hoist the whole downstream sampling chain (manifold
        # matmul included) out of the fori_loop, wildly overstating the
        # noise cost. A loop-variant cheap block (scaled by the carried
        # Adam step t, which _normal_block_pair can't see — so scaled by a
        # prng SCALAR draw) keeps downstream work in the loop.
        from jax.experimental.pallas import tpu as pltpu

        def cheap_pair(rows=lv.N):
            s = pltpu.bitcast(
                pltpu.prng_random_bits((8, lv.N)), jnp.uint32)
            sc = pltpu.bitcast(s >> 8, jnp.int32).astype(jnp.float32)
            blk = jnp.broadcast_to(sc[0:1, :] * (1.0 / 16777216.0),
                                   (rows, lv.N))
            return blk, blk * 0.5

        lv._normal_block_pair = cheap_pair

    def with_const_uniform():
        lv._uniform = lambda shape: jnp.full(shape, 0.5, jnp.float32)

    def with_no_sin():
        def no_sin(rows=lv.N):
            u1 = real_uniform((rows, lv.N))
            u2 = real_uniform((rows, lv.N))
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            c = r * jnp.cos(2.0 * jnp.pi * u2)
            return c, c

        lv._normal_block_pair = no_sin

    def with_pair_16bit():
        from jax.experimental.pallas import tpu as pltpu

        def pair16(rows=lv.N):
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((rows, lv.N)), jnp.uint32)
            hi = pltpu.bitcast(bits >> 16, jnp.int32).astype(jnp.float32)
            lo = pltpu.bitcast(
                bits & jnp.uint32(0xFFFF), jnp.int32).astype(jnp.float32)
            u1 = (hi + 0.5) * (1.0 / 65536.0)
            u2 = (lo + 0.5) * (1.0 / 65536.0)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            theta = 2.0 * jnp.pi * u2
            return r * jnp.cos(theta), r * jnp.sin(theta)

        lv._normal_block_pair = pair16

    variants = [
        ("baseline", lambda: None),
        ("cheap-adam", with_cheap_adam),
        ("no-noise", with_no_noise),
        ("const-unifrm", with_const_uniform),
        ("no-sin", with_no_sin),
        ("pair-16bit", with_pair_16bit),
    ]
    best = {}
    for _ in range(rounds):
        for name, install in variants:
            install()
            try:
                ns = timed(n_steps, reps)
            finally:
                lv._adam = real_adam
                lv._normal_block_pair = real_pair
                lv._uniform = real_uniform
            best[name] = min(best.get(name, float("inf")), ns)
            print(f"  {name:12s}: {ns:8.1f} ns/step")

    base = best["baseline"]
    print(f"\nbaseline     : {base:8.1f} ns/step "
          f"({1e9 / base / 1e3:.0f}k steps/s)  [min of {rounds}]")
    for name, note in [
        ("cheap-adam", "Adam elementwise"),
        ("no-noise", "PRNG+Box-Muller total"),
        ("const-unifrm", "prng bits+u-map"),
        ("no-sin", "the sin pass (single-block-window upper bound)"),
    ]:
        print(f"{name:13s}: {best[name]:8.1f} ns/step  -> {note} ~"
              f"{base - best[name]:.0f} ns/step")


if __name__ == "__main__":
    main()
