#!/usr/bin/env python
"""Statistical validation of the in-kernel TPU PRNG (Box-Muller) path.

Runs a tiny Pallas kernel on the real TPU that emits raw normal blocks via
the exact `_normal_block_pair`/`_normal_block` helpers the training kernels
use, then checks moments and a chi-squared normality fit. The training-side
validation of the RNG is the analytic-oracle convergence of full sweep rows;
this tool isolates the sampler itself.

Also validates the PACKED noise mode's premise (linear_vae._make_kernel
``packed_noise``): the lane windows it pairs — a block's lower half with
its rolled upper half — must be independent, checked as a direct
correlation over the paired elements.

Last recorded run (v5e, 2026-08-18):
    n=4,194,304  mean=-0.00041  std=0.99997  skew=-0.00085  ex.kurt=+0.00259
    chi2(99 dof, exact N(0,1) bins)=97.6 -> PASS
    cos/sin partner correlation=+0.00067
    lane-half (packed-window) correlation=+0.00180
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from vae_training_tpu.kernels.linear_vae import (  # noqa: E402
    N,
    _normal_block,
    _normal_block_pair,
)


def sample_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    n_blocks = out_ref.shape[0]

    def body(i, _):
        a, b = _normal_block_pair()
        out_ref[pl.ds(2 * i, 1)] = a.reshape(1, N, N)
        out_ref[pl.ds(2 * i + 1, 1)] = b.reshape(1, N, N)
        return 0

    jax.lax.fori_loop(0, n_blocks // 2, body, 0)


def draw(seed: int, n_blocks: int = 128) -> np.ndarray:
    # out buffer must fit VMEM (16 MB): 128 blocks × 128² f32 = 8.4 MB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        sample_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, N, N), jnp.float32),
    )(jnp.array([seed, 0], jnp.int32))
    return np.asarray(out).reshape(-1)


def main() -> int:
    x = np.concatenate([draw(12345), draw(54321)])
    n = x.size
    mean, std = x.mean(), x.std()
    skew = ((x - mean) ** 3).mean() / std**3
    kurt = ((x - mean) ** 4).mean() / std**4 - 3.0
    print(f"n={n}  mean={mean:+.5f}  std={std:.5f}  skew={skew:+.5f}  "
          f"ex.kurt={kurt:+.5f}")

    # chi-squared goodness of fit against N(0,1) over 100 equal-prob bins
    # (exact quantile edges via the normal inverse CDF)
    from jax.scipy.stats import norm as jnorm

    qs = np.asarray(jnorm.ppf(jnp.linspace(0.0, 1.0, 101)), np.float64)
    qs[0], qs[-1] = -np.inf, np.inf
    counts, _ = np.histogram(x, bins=qs)
    expected = n / 100.0
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # chi2 with 99 dof: mean 99, std ~14; flag > 99 + 5*14
    ok = chi2 < 99 + 5 * np.sqrt(2 * 99)
    print(f"chi2(99 dof)={chi2:.1f}  -> {'PASS' if ok else 'FAIL'}")

    # independence between the paired cos/sin outputs: correlation ~ 0.
    # Use a FULL draw (64 pairs, ~1M paired samples, sigma ~ 1e-3) so the
    # 0.01 bound sits at ~10 sigma — a single 16k pair (sigma 0.008) would
    # spuriously FAIL a healthy RNG ~1 time in 5.
    a = draw(777).reshape(-1, N * N)
    cos_part, sin_part = a[0::2].reshape(-1), a[1::2].reshape(-1)
    pair_corr = np.corrcoef(cos_part, sin_part)[0, 1]
    print(f"cos/sin partner correlation={pair_corr:+.5f} "
          f"(n={cos_part.size} pairs)")

    # packed-noise window independence: the packed kernel path pairs a
    # block's LOWER lane half with its (rolled) UPPER half — z2 with the
    # manifold draw, z1 with the observation noise (linear_vae._make_kernel
    # packed_noise). Element [r, j] pairs with [r, j + N/2] of the same
    # block; their correlation must vanish like any other disjoint draw.
    halves = a.reshape(-1, N, N)
    lo, hi = halves[:, :, : N // 2].reshape(-1), halves[:, :, N // 2:].reshape(-1)
    half_corr = np.corrcoef(lo, hi)[0, 1]
    print(f"lane-half (packed-window) correlation={half_corr:+.5f} "
          f"(n={lo.size} pairs)")
    ok = (ok and abs(mean) < 5e-3 and abs(std - 1) < 5e-3
          and abs(pair_corr) < 0.01 and abs(half_corr) < 0.01)
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
