#!/usr/bin/env python
"""Headline benchmark: train steps/sec/chip, one JSON line on stdout.

Default workload = row 1 of /root/reference/seed_linpadding_expts.sh
(linear encoder/decoder, ambient dim 12, latent 20, batch 100, Adam 1e-3,
tunable decoder variance) — the config BASELINE.json sets the ≥20k
steps/sec/chip target on. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

``--config {linear,sigmoid,sphere,grid}`` captures every PARITY.md headline
with the same driver contract (grid = the 21-row mixed-dim linear sweep in
one launch; its value is AGGREGATE steps/sec across rows). All diagnostics
go to stderr. Uses the fastest available backend (--kernels auto: Pallas
fused kernel when supported, else the XLA scan chunk).
"""

from __future__ import annotations

import json
import os
import sys
import time

# When invoked as the SUPERVISOR (the default CLI entry — see supervise()),
# this process is a pure stdlib watcher: the child re-exec does the real
# benchmark. Skipping the jax/flax imports here keeps the parent fast and,
# more importantly, keeps it from ever touching the axon PJRT init whose
# hangs it exists to supervise.
_IS_SUPERVISOR = (
    # the repo-root bench.py shim sets VAE_BENCH_SUPERVISOR before importing
    # this module so the supervisor parent stays a pure-stdlib watcher even
    # though the shim (not this file) is __main__
    (__name__ == "__main__" or os.environ.get("VAE_BENCH_SUPERVISOR") == "1")
    and not os.environ.get("VAE_BENCH_CHILD")
    and "--no-supervise" not in sys.argv
)
if not _IS_SUPERVISOR:
    # Honor JAX_PLATFORMS=cpu before backends initialize (the axon
    # sitecustomize otherwise overrides the env var) — same guard as run.py.
    from vae_training_tpu._platform import honor_platform_env

    honor_platform_env()

    import jax
    import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 20_000.0  # /root/repo/BASELINE.json:5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Sweep-representative configs (flags exactly as the reference's scripts
# set them): linear row 1, sigmoid row 1, sphere row 1.
CONFIGS = {
    "linear": dict(
        dataset="linear_gaussian", encoder_layer_sizes="", layer_sizes="",
        latent_dimension=20, padding_dim=9, dataset_dimension=3,
        dataset_intrinsic_dimension=3, learning_rate=1e-3, epsilon=-1.0,
    ),
    "sigmoid": dict(
        dataset="sigmoid", encoder_layer_sizes="", layer_sizes="",
        latent_dimension=6, padding_dim=3, dataset_dimension=3,
        learning_rate=1e-4, epsilon=-3.0,
    ),
    "sphere": dict(
        dataset="sphere", encoder_layer_sizes="200|200|200",
        layer_sizes="200|200|200", latent_dimension=6, padding_dim=3,
        dataset_dimension=3, learning_rate=1e-4, epsilon=-3.0,
    ),
}


# Row-1 dataset seeds exactly as the scripts pass them: the linear script's
# first run uses -ds 2 (seed_linpadding_expts.sh), the sigmoid/sphere
# scripts' first runs pass no -ds (reference default 69, run.py:26) — so
# the bench's data manifolds (and its loss diagnostics) match reference
# runs of the same row.
CONFIG_SEEDS = {"linear": 2, "sigmoid": 69, "sphere": 69}


def make_cfg(config: str, kernels: str = "auto", precision: str = "bf16",
             adam_dtype: str = "f32"):
    from vae_training_tpu.config import RunConfig

    return RunConfig(
        name="bench",
        num_batches=100_000,
        batch_size=100,
        tunable_decoder_var=True,
        dataset_seed=CONFIG_SEEDS[config],
        tqdm=False,
        kernels=kernels,
        precision=precision,
        adam_dtype=adam_dtype,
        **CONFIGS[config],
    ).validate()


def build(kernels: str = "auto", config: str = "linear",
          precision: str = "bf16", adam_dtype: str = "f32"):
    from vae_training_tpu.data import get_dataset
    from vae_training_tpu.train import Trainer

    cfg = make_cfg(config, kernels, precision, adam_dtype)
    dataset = get_dataset(cfg.dataset, cfg.dataset_seed, cfg)
    trainer = Trainer(cfg, dataset, output_dir=".")
    return trainer


def build_conv():
    """Conv-VAE epoch-mode workload: 4096 synthetic 28x28 images (the
    MNIST-scale config of BASELINE.json config 5), conv stack 32|64."""
    from vae_training_tpu.config import RunConfig
    from vae_training_tpu.data import get_dataset
    from vae_training_tpu.train import Trainer

    cfg = RunConfig(
        name="bench_conv", dataset="image", image_source="synthetic",
        image_size=28, num_images=4096, num_epochs=10, batch_size=128,
        latent_dimension=16, conv_channels="32|64", learning_rate=1e-3,
        epsilon=-1.0, tunable_decoder_var=True, tqdm=False,
    ).validate()
    dataset = get_dataset(cfg.dataset, 0, cfg)
    return Trainer(cfg, dataset, output_dir="."), dataset


def measure_conv(trainer, dataset, reps: int = 90) -> float:
    """Minibatch steps/sec of the compiled epoch program (one epoch = one
    device program; completion forced through the state chain)."""
    n_batches = dataset.n // trainer.cfg.batch_size
    state = trainer.state
    state, losses = trainer.epoch_chunk(state, jnp.asarray(0), n_batches)
    float(losses[-1])
    t0 = time.perf_counter()
    for e in range(reps):
        state, losses = trainer.epoch_chunk(
            state, jnp.asarray(e + 1), n_batches)
    final_loss = float(losses[-1])
    dt = time.perf_counter() - t0
    log(f"final loss after bench chain: {final_loss:.3f}")
    log(f"epochs/sec: {reps / dt:.2f} ({n_batches} batches of "
        f"{trainer.cfg.batch_size} per epoch)")
    trainer.state = state
    return (reps * n_batches) / dt


def build_grid(kernels: str = "auto", precision: str = "bf16",
               family: str = "linear", adam_dtype: str = "f32"):
    """A whole sweep family as ONE launch (the grid headlines): every
    (dd, pd, ld) row × every seed of the reference sweep, trained by
    MixedGridSweep — linear 21 rows, sigmoid 18, sphere 15."""
    from vae_training_tpu._scripts import sweep as sweep_mod
    from vae_training_tpu.train.grid import GridTrainer
    from vae_training_tpu.train.mixed_grid import (
        MixedGridSweep, MixedSweepUnavailable)

    seeds = sweep_mod.SWEEP_SEEDS[family]
    rows = {}
    for cfg in sweep_mod.sweep_configs(family, "data", None, kernels):
        cfg.precision = precision  # reaches fp32_dots in the fused kernels
        cfg.adam_dtype = adam_dtype  # bf16 moment buffers in the kernels
        key = (cfg.dataset_dimension, cfg.padding_dim, cfg.latent_dimension)
        rows.setdefault(key, {})[cfg.dataset_seed] = cfg
    groups = [GridTrainer(by_seed[seeds[0]], seeds)
              for by_seed in rows.values()]
    if kernels == "xla":
        # the comparison column: the family's same rows as per-group
        # vmapped XLA grid launches (GridTrainer built XLA-only chunks)
        return _PerGroupSweep(groups)
    try:
        return MixedGridSweep(groups)
    except MixedSweepUnavailable as e:
        if kernels == "pallas":
            # an explicitly requested backend must not be papered over:
            # no one-launch kernel ⇒ exit nonzero, never measure XLA
            # under a pallas label (GridTrainer construction above already
            # raises off-TPU for the same reason)
            raise
        # scoring insurance (auto): outside the fused envelope, measure the
        # family's same rows as per-group grid launches — an honest
        # aggregate, and the one-JSON-line contract survives
        log(f"one-launch unavailable ({e}); per-row grid launches")
        return _PerGroupSweep(groups)


class _PerGroupSweep:
    """Duck-type of MixedGridSweep for bench: per-group chunk driving."""

    def __init__(self, groups):
        self.groups = groups
        self.n_rows = sum(len(g.seeds) for g in groups)

    def _train_chunk(self, state_grids, n_steps):
        from vae_training_tpu.train.mixed_grid import per_group_chunk

        return per_group_chunk(self.groups, state_grids, n_steps)


def measure_grid(sweep, chunk_steps: int = 20_000, reps: int = 6) -> float:
    """Aggregate steps/sec across all rows of the one-launch sweep
    (completion forced through the state chain — see measure())."""
    grids = tuple(g.state_grid for g in sweep.groups)
    grids, losses = sweep._train_chunk(grids, chunk_steps)  # warmup+compile
    for l in losses:  # force EVERY group's chain, not just the last —
        float(l[-1][-1])  # per-group fallback chunks are independent
    t0 = time.perf_counter()
    for _ in range(reps):
        grids, losses = sweep._train_chunk(grids, chunk_steps)
    final_loss = [float(l[-1][-1]) for l in losses][-1]
    dt = time.perf_counter() - t0
    log(f"final loss after bench chain: {final_loss:.3f}")
    for g, ng in zip(sweep.groups, grids):
        g.state_grid = ng
    return (sweep.n_rows * chunk_steps * reps) / dt


def measure(trainer, chunk_steps: int = 20_000, reps: int = 30) -> float:
    """Time ``reps`` pre-compiled chunks, forcing completion by fetching one
    scalar THROUGH the donated-state dependency chain. block_until_ready is
    deliberately not used: on remote-tunnel TPU runtimes (axon) it can
    report readiness before the kernel actually retires (observed: a 60k-
    step fused chunk 'completing' in 0.4 ms), silently inflating results by
    100×+. A scalar read of the last chunk's loss cannot resolve until
    every chained chunk has executed."""
    state = trainer.state
    # Warmup: compile the chunk AND the scalar-slice fetch program.
    state, losses = trainer.fns.train_chunk(state, chunk_steps)
    float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = trainer.fns.train_chunk(state, chunk_steps)
    final_loss = float(losses[-1])  # forces the whole chain (4-byte fetch)
    dt = time.perf_counter() - t0
    log(f"final loss after bench chain: {final_loss:.3f}")
    trainer.state = state
    return (chunk_steps * reps) / dt


def latency_mode(trainer, reps: int = 200):
    """Per-step dispatch latency: single-step chunks, completion forced by
    fetching the loss scalar through the data chain (SURVEY §5's 'per-step
    timing mode'). block_until_ready is deliberately not used — it can
    return before the kernel retires on remote-tunnel runtimes (see
    measure()). Percentiles to stderr."""
    state = trainer.state
    state, l = trainer.fns.train_chunk(state, 1)
    float(l[-1])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, l = trainer.fns.train_chunk(state, 1)
        float(l[-1])
        times.append(time.perf_counter() - t0)
    trainer.state = state
    import numpy as np

    t = np.array(times) * 1e6
    log(f"per-step dispatch latency (us): p50={np.percentile(t,50):.0f} "
        f"p90={np.percentile(t,90):.0f} p99={np.percentile(t,99):.0f}")


# ---------------------------------------------------------------------------
# Analytic FLOPs / MFU accounting (the bench contract's compute denominator).
# Peak dense matmul throughput by device kind, bf16 operands (the MXU's
# native mode and this framework's default precision). MFU is always quoted
# against the bf16 peak — with --precision fp32 the dots cost ~3 bf16 passes,
# so the fp32 numbers read honestly lower rather than against a softer peak.
PEAK_MATMUL_FLOPS = (
    ("v5 lite", 197e12), ("v5e", 197e12),   # TPU v5e
    ("v5p", 459e12),
    ("v6", 918e12), ("trillium", 918e12),
    ("v4", 275e12),
)


def device_peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for frag, peak in PEAK_MATMUL_FLOPS:
        if frag in kind:
            return peak
    return None


def mlp_step_flops(batch: int, data_dim: int, latent_dim: int,
                   enc_features, dec_features, dual: bool) -> int:
    """Analytic matmul FLOPs for ONE training step of the MLP VAE.

    Formula (matmul terms only): a Dense forward (B,k)·(k,n) costs 2·B·k·n
    FLOPs; the backward pass adds dX (2·B·k·n) and dW (2·B·k·n) at the same
    cost — training multiplier 3. The sigmoid dataset's dual decoder runs
    two decoder stacks. Elementwise work (reparam, ELBO, Adam) is excluded:
    the denominator counts MXU terms only, so ``mfu_pct`` reads as
    systolic-array utilization — for the VPU-bound tiny configs it is
    honestly low (docs/architecture.md speed-of-light accounting).
    """
    def net(in_dim, feats):
        fl, d = 0, in_dim
        for f in feats:
            fl += 2 * batch * d * f
            d = f
        return fl

    fwd = net(data_dim, enc_features)
    fwd += net(latent_dim, dec_features) * (2 if dual else 1)
    return 3 * fwd


def conv_step_flops(batch: int, image_hwc, latent_dim: int, channels) -> int:
    """Analytic matmul FLOPs for ONE training step of the conv VAE.

    Conv2D 3×3 stride 2 at output (B,Ho,Wo,Cout) costs 2·B·Ho·Wo·9·Cin·Cout;
    ConvTranspose 3×3 stride 2 costs 2·B·Hi·Wi·9·Cin·Cout (each input pixel
    feeds 9 taps). Dense layers as in mlp_step_flops. Training ×3.
    Mirrors models/conv.py: enc = [Conv(ch) for ch in channels] + Dense(mu);
    dec = Dense + [ConvTranspose] over reversed(channels) + UpOut.
    """
    h, w, c = image_hwc
    k2 = 9
    fwd = 0
    # encoder convs
    cin, hh, ww = c, h, w
    for ch in channels:
        hh, ww = hh // 2, ww // 2
        fwd += 2 * batch * hh * ww * k2 * cin * ch
        cin = ch
    fwd += 2 * batch * (hh * ww * cin) * latent_dim  # FCmu
    # decoder: Dense in, then transposed stack back up
    dec_ch = tuple(reversed(channels))
    n_up = len(dec_ch)
    h0, w0 = h // (2 ** n_up), w // (2 ** n_up)
    fwd += 2 * batch * latent_dim * (h0 * w0 * dec_ch[0])  # FCin
    cin, hh, ww = dec_ch[0], h0, w0
    for ch in dec_ch[1:]:
        fwd += 2 * batch * hh * ww * k2 * cin * ch
        cin, hh, ww = ch, hh * 2, ww * 2
    fwd += 2 * batch * hh * ww * k2 * cin * c  # UpOut
    return 3 * fwd


def workload_flops_per_step(config: str, obj) -> float:
    """FLOPs per MEASURED step of the benchmark workload. Grid configs
    count aggregate row-steps, so this is the average per row-step across
    the family's mixed-dimension rows."""
    if config in GRID_FAMILIES:
        total = rows = 0
        for g in obj.groups:
            m = g.model
            total += len(g.seeds) * mlp_step_flops(
                g.cfg.batch_size, g.data_dim, g.latent_dim,
                m.encoder_features, m.decoder_features,
                m.dual_sigmoid_decoder)
            rows += len(g.seeds)
        return total / rows
    if config == "conv":
        m = obj.model
        return conv_step_flops(obj.cfg.batch_size, m.image_hwc,
                               m.latent_dim, m.channels)
    m = obj.model
    return mlp_step_flops(obj.cfg.batch_size, obj.dataset.dimension,
                          m.latent_dim, m.encoder_features,
                          m.decoder_features, m.dual_sigmoid_decoder)


METRIC_NAMES = {
    "linear": "linear_vae_train_steps_per_sec_per_chip",
    "sigmoid": "sigmoid_vae_train_steps_per_sec_per_chip",
    "sphere": "sphere_mlp200_vae_train_steps_per_sec_per_chip",
    "grid": "linear_sweep21_aggregate_steps_per_sec_per_chip",
    "grid_linear": "linear_sweep21_aggregate_steps_per_sec_per_chip",
    "grid_sigmoid": "sigmoid_sweep18_aggregate_steps_per_sec_per_chip",
    "grid_sphere": "sphere_sweep15_aggregate_steps_per_sec_per_chip",
    "conv": "conv_vae_train_steps_per_sec_per_chip",
}

# one-launch sweep family per grid config ("grid" = the original alias)
GRID_FAMILIES = {"grid": "linear", "grid_linear": "linear",
                 "grid_sigmoid": "sigmoid", "grid_sphere": "sphere"}


def main() -> int:
    import argparse

    from vae_training_tpu.runio import enable_compile_cache

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="linear",
                   choices=["linear", "sigmoid", "sphere", "grid",
                            "grid_linear", "grid_sigmoid", "grid_sphere",
                            "conv"],
                   help="Which PARITY.md headline workload to measure "
                        "(grid_* = the whole sweep family as one launch; "
                        "'grid' is an alias for grid_linear).")
    p.add_argument("--latency", action="store_true",
                   help="Also report per-step dispatch latency percentiles "
                        "(stderr).")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"],
                   help="Fused-kernel matmul precision: bf16 (default, "
                        "MXU-native) or fp32 (Precision.HIGHEST true-fp32 "
                        "dots — measures the cost of reference-exact "
                        "arithmetic).")
    p.add_argument("--kernels", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="Backend under test: auto (default, fastest "
                        "available), xla (the scan path — the comparison "
                        "column in PARITY), pallas (require the fused "
                        "kernel).")
    p.add_argument("--adam_dtype", default="f32", choices=["f32", "bf16"],
                   help="Adam moment storage under test: f32 (default, "
                        "bitwise optax) or bf16 weight-matrix moments "
                        "(halved optimizer VMEM traffic).")
    p.add_argument("--min", dest="min_steps", type=float, default=None,
                   help="Perf-regression floor: exit nonzero (3) if the "
                        "measured steps/sec falls below this value. The "
                        "JSON line is still printed. Used by the verify "
                        "skill to guard the headline numbers.")
    args = p.parse_args()

    enable_compile_cache()
    log(f"devices: {jax.devices()}")
    trainer = None
    measured = None  # the workload object FLOPs accounting reads dims from
    if args.config in GRID_FAMILIES:
        try:
            sweep = build_grid(args.kernels, args.precision,
                               family=GRID_FAMILIES[args.config],
                               adam_dtype=args.adam_dtype)
        except ValueError as e:
            if args.kernels == "pallas":
                # deterministic eligibility error (e.g. --kernels pallas
                # off-TPU): exit 2 so the supervisor fails fast instead of
                # retrying a doomed configuration three times
                log(f"config error: {e}")
                return 2
            raise
        steps_per_sec = measure_grid(sweep)
        measured = sweep
    elif args.config == "conv":
        conv_trainer, dataset = build_conv()
        steps_per_sec = measure_conv(conv_trainer, dataset)
        measured = conv_trainer
    else:
        try:
            trainer = build(args.kernels, args.config, args.precision,
                            args.adam_dtype)
            log(f"backend fns: {trainer.fns!r}")
            steps_per_sec = measure(trainer)
        except Exception as e:  # scoring insurance: fall back to the XLA path
            if args.kernels != "auto":
                raise  # an explicitly requested backend must not be papered over
            log(f"auto backend failed ({type(e).__name__}: {e}); retrying xla")
            trainer = build("xla", args.config, args.precision,
                            args.adam_dtype)
            steps_per_sec = measure(trainer)
    if measured is None:
        measured = trainer
    log(f"steps/sec: {steps_per_sec:.0f}")
    # Compute denominator: analytic matmul FLOPs/step + MFU vs the chip's
    # bf16 peak — turns "N steps/s" into a claim with a denominator. Null
    # mfu off-TPU / on unknown chips; flops_per_step is always emitted.
    flops_per_step = workload_flops_per_step(args.config, measured)
    peak = device_peak_flops()
    mfu_pct = (round(100.0 * steps_per_sec * flops_per_step / peak, 2)
               if peak else None)
    log(f"flops/step: {flops_per_step:.4g}; "
        f"achieved: {steps_per_sec * flops_per_step / 1e12:.3f} TFLOP/s; "
        f"mfu: {mfu_pct}%")
    if args.latency:
        if trainer is not None:
            latency_mode(trainer)
        else:
            log("--latency applies to the linear/sigmoid/sphere configs "
                "only; skipped")
    # The ≥20k steps/sec/chip target (BASELINE.json) is defined on the
    # linear workload; grid(_linear) is that same workload aggregated
    # across the 21 sweep rows, so the ratio stays meaningful. The
    # sigmoid/sphere families and conv have no published target — emit
    # null rather than a ratio against an unrelated workload's number.
    vs = (round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3)
          if args.config in ("linear", "grid", "grid_linear") else None)
    print(
        json.dumps(
            {
                "metric": METRIC_NAMES[args.config],
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec",
                "vs_baseline": vs,
                "flops_per_step": round(flops_per_step),
                "mfu_pct": mfu_pct,
            }
        )
    )
    if args.min_steps is not None and steps_per_sec < args.min_steps:
        log(f"PERF REGRESSION: {steps_per_sec:.0f} steps/sec is below the "
            f"--min {args.min_steps:.0f} floor")
        return 3
    return 0


def supervise(child_argv=None, init_timeout=None, total_timeout=None,
              attempts=None) -> int:
    """Run the benchmark as a supervised child process and retry hangs.

    ~1 in 10 process starts hang in axon PJRT init before ``jax.devices()``
    returns (CLAUDE.md), and the driver captures this benchmark exactly once
    per round — a single unlucky start must not turn into a missing
    BENCH_r{N}.json. The child is the real benchmark (env
    ``VAE_BENCH_CHILD=1``); supervision is the shared ``_supervise.run_
    supervised`` (also behind ``sweep.py --isolate``): stderr forwarded
    live, the early ``devices:`` marker required within
    ``VAE_BENCH_INIT_TIMEOUT`` (240 s), the whole run bounded by
    ``VAE_BENCH_TIMEOUT`` (2400 s), hangs SIGTERMed and retried. stdout
    stays exactly ONE JSON line: the child's, re-emitted once on success
    (non-JSON child stdout — e.g. ``--help`` — passes through verbatim
    instead).
    """
    from vae_training_tpu._scripts._supervise import run_supervised

    if child_argv is None:
        # -m keeps the re-exec location-independent (works from a checkout
        # AND an installed wheel; running the package file as a bare script
        # would put _scripts/ at sys.path[0])
        child_argv = ([sys.executable, "-m", "vae_training_tpu._scripts.bench"]
                      + sys.argv[1:])
    if init_timeout is None:
        init_timeout = float(os.environ.get("VAE_BENCH_INIT_TIMEOUT", "240"))
    if total_timeout is None:
        total_timeout = float(os.environ.get("VAE_BENCH_TIMEOUT", "2400"))
    if attempts is None:
        attempts = int(os.environ.get("VAE_BENCH_ATTEMPTS", "3"))
    retry_delay = float(os.environ.get("VAE_BENCH_RETRY_DELAY", "10"))
    last_code = 1
    # The -m child resolves vae_training_tpu from ITS sys.path, which for a
    # bare-script invocation from a foreign cwd (`cd /tmp && python
    # /repo/bench.py`, package not pip-installed) would not contain the
    # checkout — thread the package root (three levels above this file;
    # site-packages when installed, where it is a harmless duplicate)
    # through the child's PYTHONPATH.
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for attempt in range(1, attempts + 1):
        env = dict(os.environ, VAE_BENCH_CHILD="1")
        env["PYTHONPATH"] = (
            pkg_root + os.pathsep + env["PYTHONPATH"]
            if env.get("PYTHONPATH") else pkg_root)
        outcome = run_supervised(
            child_argv, init_timeout=init_timeout,
            total_timeout=total_timeout, env=env, stdout_mode="capture",
            label="bench-supervisor",
            note=f" (attempt {attempt}/{attempts})",
            cooldown_after_kill=attempt < attempts,
        )
        out = outcome.stdout
        if outcome.hung:
            last_code = 124
        else:
            if outcome.returncode == 0:
                lines = [l for l in out.splitlines() if l.strip()]
                is_json = False
                if lines:
                    try:
                        json.loads(lines[-1])
                        is_json = True
                    except ValueError:
                        pass
                if is_json:
                    print(lines[-1], flush=True)  # the ONE-JSON-line contract
                    return 0
                if out:
                    # non-benchmark stdout (--help and friends): verbatim
                    sys.stdout.write(out)
                    sys.stdout.flush()
                    return 0
                log("[bench-supervisor] child exited 0 without output")
                last_code = 1
            else:
                log(f"[bench-supervisor] child exited {outcome.returncode} "
                    f"(attempt {attempt}/{attempts})")
                last_code = outcome.returncode
                if outcome.returncode == 2:
                    # argparse usage errors are deterministic — retrying
                    # re-prints the same usage message 2 more times
                    return last_code
                if outcome.returncode == 3:
                    # --min floor violation: the measurement itself
                    # succeeded — re-emit its JSON line and fail fast
                    lines = [l for l in out.splitlines() if l.strip()]
                    if lines:
                        print(lines[-1], flush=True)
                    return last_code
        if attempt < attempts:
            time.sleep(retry_delay)
    return last_code


def cli() -> int:
    """Console entry point (``vae-bench``) — same supervise-by-default
    contract as ``python bench.py``. One difference: as an imported module
    the jax import above already ran in this (supervisor) process — merely
    importing jax does not initialize the PJRT backend, so the supervisor
    still never touches the axon init it exists to watch."""
    if (not os.environ.get("VAE_BENCH_CHILD")
            and "--no-supervise" not in sys.argv):
        return supervise()
    sys.argv = [a for a in sys.argv if a != "--no-supervise"]
    return main()


if __name__ == "__main__":
    # cli() re-checks the same supervise-or-run condition _IS_SUPERVISOR
    # captured at import time (the flag itself must stay: it gates the jax
    # import above before any CLI dispatch runs).
    sys.exit(cli())
