#!/usr/bin/env python
"""Run an entire reference sweep grid in ONE process.

The ``*_expts.sh`` scripts remain the reference-compatible API (one process
per run); this runner executes the same grids in a single process so
compiled programs are shared across rows and seeds — with the fused Pallas
kernels and the per-static-config compile cache, the whole 21-run linear
sweep costs a handful of kernel compiles instead of 21× cold starts.

    python sweep.py linear   # 21 runs of seed_linpadding_expts.sh
    python sweep.py sigmoid  # 18 runs of sigmoid_vae_padding_expts.sh
    python sweep.py sphere   # 15 runs of sphere_vae_padding_expts.sh
"""

from __future__ import annotations

import argparse
import sys
import time

from vae_training_tpu.config import RunConfig

# (data_dim, padding_dim, latent_dim) rows — identical grids to the shell
# scripts / the reference's sweeps.
LINEAR_GRID = [(3, 9, 20), (3, 17, 20), (6, 6, 20), (6, 14, 20),
               (9, 3, 20), (9, 11, 10), (12, 8, 10)]
SIGMOID_GRID = [(3, 3, 6), (3, 13, 8), (5, 16, 16), (5, 5, 10),
                (7, 7, 13), (7, 20, 24)]
SPHERE_GRID = [(3, 3, 6), (3, 13, 8), (5, 16, 16), (5, 5, 10), (7, 7, 13)]


def sweep_configs(sweep: str, data_dir: str, num_batches: int | None,
                  kernels: str):
    if sweep == "linear":
        for seed in (2, 3, 4):
            for dd, pd, ld in LINEAR_GRID:
                yield RunConfig(
                    name=f"vae{dd}linear_gaussian_{dd + pd}dim{seed}",
                    dataset="linear_gaussian", encoder_layer_sizes="",
                    layer_sizes="", overwrite=True, latent_dimension=ld,
                    padding_dim=pd, dataset_dimension=dd,
                    num_batches=num_batches or 100000, epsilon=-1.0,
                    tunable_decoder_var=True, dataset_seed=seed,
                    learning_rate=1e-3, data_dir=data_dir, kernels=kernels,
                    tqdm=False,
                )
    elif sweep == "sigmoid":
        for seed in (None, 24, 48):
            for dd, pd, ld in SIGMOID_GRID:
                name = f"sigmoid_dd{dd}_pd{pd}_ld_{ld}_eps-3"
                if seed is not None:
                    name += f"_seed{seed}"
                yield RunConfig(
                    name=name, dataset="sigmoid", encoder_layer_sizes="",
                    layer_sizes="", overwrite=True, latent_dimension=ld,
                    padding_dim=pd, dataset_dimension=dd,
                    num_batches=num_batches or 150000, epsilon=-3.0,
                    tunable_decoder_var=True,
                    dataset_seed=seed if seed is not None else 69,
                    data_dir=data_dir, kernels=kernels, tqdm=False,
                )
    elif sweep == "sphere":
        for seed in (None, 24, 48):
            for dd, pd, ld in SPHERE_GRID:
                name = f"sphere_dd{dd}_pd{pd}_ld_{ld}_eps-3"
                if seed is not None:
                    name += f"_seed{seed}"
                yield RunConfig(
                    name=name, dataset="sphere",
                    encoder_layer_sizes="200|200|200",
                    layer_sizes="200|200|200", overwrite=True,
                    latent_dimension=ld, padding_dim=pd,
                    dataset_dimension=dd,
                    num_batches=num_batches or 150000, epsilon=-3.0,
                    tunable_decoder_var=True,
                    dataset_seed=seed if seed is not None else 69,
                    data_dir=data_dir, kernels=kernels, tqdm=False,
                )
    else:
        raise ValueError(f"unknown sweep {sweep!r}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sweep", choices=["linear", "sigmoid", "sphere"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--num_batches", type=int, default=None,
                   help="Override the sweep's per-run step count.")
    p.add_argument("--kernels", default="auto",
                   choices=["auto", "xla", "pallas"])
    args = p.parse_args(argv)

    from run import main as run_one

    t0 = time.perf_counter()
    count = 0
    for cfg in sweep_configs(args.sweep, args.data_dir, args.num_batches,
                             args.kernels):
        t1 = time.perf_counter()
        run_one(cfg)
        count += 1
        print(f"[sweep] {cfg.name} done in {time.perf_counter() - t1:.1f}s",
              flush=True)
    print(f"[sweep] {count} runs in {time.perf_counter() - t0:.1f}s",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
