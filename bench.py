#!/usr/bin/env python
"""Headline benchmark: train steps/sec/chip on the linear-VAE sweep config.

Workload = row 1 of /root/reference/seed_linpadding_expts.sh (linear
encoder/decoder, ambient dim 12, latent 20, batch 100, Adam 1e-3, tunable
decoder variance) — the config BASELINE.json sets the ≥20k steps/sec/chip
target on. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

All diagnostics go to stderr. Uses the fastest available backend
(--kernels auto: Pallas fused kernel when supported, else the XLA scan
chunk).
"""

from __future__ import annotations

import json
import sys
import time

import jax

BASELINE_STEPS_PER_SEC = 20_000.0  # /root/repo/BASELINE.json:5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(kernels: str = "auto"):
    from vae_training_tpu.config import RunConfig
    from vae_training_tpu.data import get_dataset
    from vae_training_tpu.train import Trainer

    cfg = RunConfig(
        name="bench",
        dataset="linear_gaussian",
        encoder_layer_sizes="",
        layer_sizes="",
        latent_dimension=20,
        padding_dim=9,
        dataset_dimension=3,
        dataset_intrinsic_dimension=3,
        num_batches=100_000,
        batch_size=100,
        learning_rate=1e-3,
        epsilon=-1.0,
        tunable_decoder_var=True,
        dataset_seed=2,
        tqdm=False,
        kernels=kernels,
    ).validate()
    dataset = get_dataset(cfg.dataset, cfg.dataset_seed, cfg)

    class _NullDir:
        pass

    trainer = Trainer(cfg, dataset, output_dir=".")
    return trainer


def measure(trainer, chunk_steps: int = 20_000, reps: int = 3) -> float:
    state = trainer.state
    # Warmup: compile + one chunk.
    state, losses = trainer.fns.train_chunk(state, chunk_steps)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = trainer.fns.train_chunk(state, chunk_steps)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    trainer.state = state
    return (chunk_steps * reps) / dt


def latency_mode(trainer, reps: int = 200):
    """Per-step dispatch latency: single-step chunks with block_until_ready
    (SURVEY §5's 'per-step timing mode'). Percentiles to stderr."""
    state = trainer.state
    state, l = trainer.fns.train_chunk(state, 1)
    jax.block_until_ready(l)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, l = trainer.fns.train_chunk(state, 1)
        jax.block_until_ready(l)
        times.append(time.perf_counter() - t0)
    trainer.state = state
    import numpy as np

    t = np.array(times) * 1e6
    log(f"per-step dispatch latency (us): p50={np.percentile(t,50):.0f} "
        f"p90={np.percentile(t,90):.0f} p99={np.percentile(t,99):.0f}")


def main() -> int:
    from vae_training_tpu.runio import enable_compile_cache

    enable_compile_cache()
    log(f"devices: {jax.devices()}")
    try:
        trainer = build("auto")
        log(f"backend fns: {trainer.fns!r}")
        steps_per_sec = measure(trainer)
    except Exception as e:  # scoring insurance: fall back to the XLA path
        log(f"auto backend failed ({type(e).__name__}: {e}); retrying xla")
        trainer = build("xla")
        steps_per_sec = measure(trainer)
    log(f"steps/sec: {steps_per_sec:.0f}")
    if "--latency" in sys.argv:
        latency_mode(trainer)
    print(
        json.dumps(
            {
                "metric": "linear_vae_train_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
