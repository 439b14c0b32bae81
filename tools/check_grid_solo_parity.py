#!/usr/bin/env python
"""TPU check: a --seed_grid launch reproduces per-process solo runs.

Grid rows share the solo Trainer's key derivation (train/grid.py), so on
the fused-kernel path — where the chunk PRNG seeds derive purely from the
state keys and the shared next_event chunk boundaries — each grid row's
per-step TRAINING loss trace should be BITWISE identical to the solo run
of the same flags, and the eval channels equal to float tolerance (solo
eval runs as one eval_step program, the grid as a vmapped batch of it —
same keys, reassociated sums).

    python tools/check_grid_solo_parity.py [--num_batches 15000]

Prints a per-channel verdict and exits nonzero on any mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_training_tpu._platform import honor_platform_env  # noqa: E402

honor_platform_env()

import numpy as np  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num_batches", type=int, default=15000)
    p.add_argument("--data_dir", default="data/grid_solo_parity")
    p.add_argument("--kernels", default="auto")
    args = p.parse_args()

    from run import main as run_main
    from vae_training_tpu.config import RunConfig
    from vae_training_tpu.runio import enable_compile_cache
    from vae_training_tpu.train.grid import run_seed_grid

    enable_compile_cache()
    seeds = [2, 3]

    def cfg(name, seed):
        return RunConfig(
            name=name, dataset="linear_gaussian", encoder_layer_sizes="",
            layer_sizes="", latent_dimension=20, padding_dim=9,
            dataset_dimension=3, dataset_intrinsic_dimension=3,
            num_batches=args.num_batches, batch_size=100,
            learning_rate=1e-3, epsilon=-1.0, tunable_decoder_var=True,
            dataset_seed=seed, kernels=args.kernels, overwrite=True,
            tqdm=False, data_dir=args.data_dir,
        ).validate()

    for s in seeds:
        run_main(cfg(f"solo_s{s}", s))
    run_seed_grid(cfg("grid", seeds[0]), seeds)

    failures = 0
    for s in seeds:
        za = np.load(os.path.join(args.data_dir, f"solo_s{s}", "losses.npz"),
                     allow_pickle=True)
        zb = np.load(os.path.join(args.data_dir, f"grid_seed{s}",
                                  "losses.npz"), allow_pickle=True)
        if set(za.files) != set(zb.files):
            print(f"seed {s}: channel sets differ: "
                  f"{set(za.files) ^ set(zb.files)}")
            failures += 1
            continue
        for k in sorted(za.files):
            a = np.asarray(za[k], np.float64)
            b = np.asarray(zb[k], np.float64)
            if a.size == 0 and b.size == 0:
                continue
            if a.shape != b.shape:
                print(f"seed {s} {k}: SHAPE {a.shape} vs {b.shape}")
                failures += 1
                continue
            if np.array_equal(a, b):
                print(f"seed {s} {k}: BITWISE ({a.size} values)")
            elif np.allclose(a, b, rtol=1e-5, atol=1e-5):
                md = float(np.max(np.abs(a - b)))
                print(f"seed {s} {k}: close (max abs diff {md:.2e})")
            else:
                md = float(np.max(np.abs(a - b)))
                print(f"seed {s} {k}: MISMATCH (max abs diff {md:.2e})")
                failures += 1
    print("PARITY OK" if failures == 0 else f"{failures} channel mismatches")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
