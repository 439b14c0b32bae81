#!/usr/bin/env python
"""Probe: is the conv epoch program's 20.7 us/step `corpus gather + NHWC
relayout` fusion (docs/architecture.md, conv accounting) caused by the
C=1 input forcing a T(1,128) sublane-1 layout — and does pre-laying the
corpus in a conv-friendly layout remove it?

Variants (same math where it matters, fresh params, perf-only):
  flat1  : today's path — flat (N,784) corpus, take -> reshape (B,28,28,1)
  nhwc1  : corpus stored (N,28,28,1), take slabs directly (no reshape)
  pad8   : corpus stored (N,28,28,8) with 7 zero channels; encoder's first
           conv sees Cin=8 (zero channels contribute zero — identical
           output); ELBO still on the true 784 pixels.
  pad8w  : like pad8 but the corpus pad happens PER STEP inside the program
           (jnp.pad after the gather) — distinguishes "the gather needs a
           padded SOURCE" from "the conv just needs a padded INPUT".

Each timed window is >= 1 s of device work and completion is forced
through the loss value (CLAUDE.md: block_until_ready lies on axon).
Run on the real TPU: python tools/probe_conv_layout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_training_tpu._platform import honor_platform_env

honor_platform_env()

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

B, H, W, LAT = 128, 28, 28, 16
N_IMGS = int(os.environ.get("PROBE_IMGS", "4096"))
EPOCHS_PER_CALL = int(os.environ.get("PROBE_EPOCHS", "5"))
REPS = int(os.environ.get("PROBE_REPS", "12"))


class Enc(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B,H,W,C)
        x = nn.relu(nn.Conv(32, (3, 3), strides=(2, 2))(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2))(x))
        return nn.Dense(LAT)(x.reshape(x.shape[0], -1))


class Dec(nn.Module):
    @nn.compact
    def __call__(self, z):
        x = nn.relu(nn.Dense(7 * 7 * 64)(z)).reshape(z.shape[0], 7, 7, 64)
        x = nn.relu(nn.ConvTranspose(32, (3, 3), strides=(2, 2))(x))
        return nn.ConvTranspose(1, (3, 3), strides=(2, 2))(x)


def build(variant: str, corpus_f32: np.ndarray):
    """Returns (epoch_fn, state). corpus_f32: (N, 28, 28) in [-1, 1]."""
    enc, dec = Enc(), Dec()
    key = jax.random.PRNGKey(0)
    if variant == "flat1":
        corpus = jnp.asarray(corpus_f32.reshape(N_IMGS, -1))
        x0 = jnp.zeros((B, H, W, 1))
    elif variant == "nhwc1":
        corpus = jnp.asarray(corpus_f32[..., None])
        x0 = jnp.zeros((B, H, W, 1))
    elif variant == "pad8":
        c8 = np.zeros((N_IMGS, H, W, 8), np.float32)
        c8[..., 0] = corpus_f32
        corpus = jnp.asarray(c8)
        x0 = jnp.zeros((B, H, W, 8))
    elif variant == "pad8w":
        corpus = jnp.asarray(corpus_f32[..., None])
        x0 = jnp.zeros((B, H, W, 8))
    else:
        raise ValueError(variant)
    params = {
        "enc": enc.init(key, x0),
        "dec": dec.init(key, jnp.zeros((B, LAT))),
        "eps_p": jnp.ones((LAT,)),
    }
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def get_batch(perm, i):
        idx = jax.lax.dynamic_slice(perm, (i * B,), (B,))
        x = jnp.take(corpus, idx, axis=0)
        if variant == "flat1":
            x = x.reshape(B, H, W, 1)
        elif variant == "pad8w":
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 7)))
        return x

    def loss_fn(params, x, z1, z2):
        mu = enc.apply(params["enc"], x)
        s = mu + jnp.exp(params["eps_p"] / 2.0) * z1
        xh = dec.apply(params["dec"], s).reshape(B, -1) + z2
        # ELBO always on the true 784 pixels (channel 0)
        xt = x[..., 0].reshape(B, -1)
        dkl = -0.5 * jnp.sum(1.0 + params["eps_p"]
                             - jnp.exp(params["eps_p"]) - mu * mu, axis=-1)
        mse = 0.5 * jnp.sum((xh - xt) ** 2, axis=-1)
        return jnp.mean(dkl + mse)

    grad_fn = jax.value_and_grad(loss_fn)
    n_batches = N_IMGS // B

    @partial(jax.jit, donate_argnums=(0, 1))
    def epochs(params, opt, ekey):
        def epoch(carry, e):
            params, opt = carry
            perm = jax.random.permutation(
                jax.random.fold_in(ekey, e), N_IMGS)

            def body(c, i):
                params, opt = c
                x = get_batch(perm, i)
                kz = jax.random.fold_in(ekey, e * n_batches + i)
                z1 = jax.random.normal(kz, (B, LAT))
                z2 = jax.random.normal(jax.random.fold_in(kz, 1),
                                       (B, H * W)) * 0.1
                loss, g = grad_fn(params, x, z1, z2)
                up, opt = tx.update(g, opt, params)
                return (optax.apply_updates(params, up), opt), loss

            (params, opt), losses = jax.lax.scan(
                body, (params, opt), jnp.arange(n_batches))
            return (params, opt), losses[-1]

        (params, opt), last = jax.lax.scan(
            epoch, (params, opt), jnp.arange(EPOCHS_PER_CALL))
        return params, opt, last[-1]

    return epochs, params, opt


def main():
    rng = np.random.RandomState(0)
    corpus = (rng.rand(N_IMGS, H, W).astype(np.float32) * 2.0 - 1.0)
    variants = ["flat1", "nhwc1", "pad8", "pad8w"]
    built = {}
    for v in variants:
        built[v] = build(v, corpus)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    n_batches = N_IMGS // B
    steps_per_call = EPOCHS_PER_CALL * n_batches
    results = {v: [] for v in variants}
    for rep in range(REPS):
        for v in variants:  # interleaved: session drift hits all variants
            fn, params, opt = built[v]
            k = jax.random.PRNGKey(rep)
            params, opt, loss = fn(params, opt, k)  # warm/carry
            float(loss)
            t0 = time.perf_counter()
            params, opt, loss = fn(params, opt, jax.random.fold_in(k, 1))
            float(loss)  # force completion through the data chain
            dt = time.perf_counter() - t0
            built[v] = (fn, params, opt)
            if rep >= 2:  # first reps warm compile caches
                results[v].append(dt / steps_per_call * 1e6)
    print(f"{'variant':8} {'us/step p50':>12} {'min':>8} {'n':>3}")
    for v in variants:
        r = sorted(results[v])
        print(f"{v:8} {r[len(r) // 2]:12.1f} {r[0]:8.1f} {len(r):3d}")


if __name__ == "__main__":
    main()
