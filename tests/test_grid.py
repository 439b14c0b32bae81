"""Vmapped multi-seed grid training: per-seed parity with solo runs,
artifacts, and convergence."""

import os

import jax
import numpy as np
import pytest

from vae_training_tpu.config import RunConfig
from vae_training_tpu.data import get_dataset
from vae_training_tpu.runio import make_output_dir
from vae_training_tpu.train import Trainer
from vae_training_tpu.train.grid import GridTrainer, run_seed_grid


def make_cfg(tmpdir, **kw):
    defaults = dict(
        name="grid",
        dataset="linear_gaussian",
        encoder_layer_sizes="",
        layer_sizes="",
        latent_dimension=6,
        padding_dim=3,
        dataset_dimension=3,
        num_batches=120,
        batch_size=40,
        learning_rate=1e-3,
        epsilon=-1.0,
        tunable_decoder_var=True,
        overwrite=True,
        tqdm=False,
        data_dir=tmpdir,
    )
    defaults.update(kw)
    return RunConfig(**defaults).validate()


def test_grid_trains_and_converges(tmp_outdir):
    cfg = make_cfg(tmp_outdir, num_batches=600)
    trainer = GridTrainer(cfg, seeds=[2, 3, 4])
    trainer.compute_and_write_stats()
    first = [float(r.vae_losses[0][0]) for r in trainer.recorders]
    trainer.state_grid, losses = trainer._train_chunk(
        trainer.dataset_grid, trainer.state_grid, 600
    )
    assert losses.shape == (3, 600)
    trainer.batchnum = 600
    trainer.compute_and_write_stats()
    last = [float(r.vae_losses[-1][0]) for r in trainer.recorders]
    for f, l in zip(first, last):
        assert l < f  # every seed converging


def test_grid_cli_writes_per_seed_outputs(tmp_outdir):
    from run import main

    cfg = make_cfg(tmp_outdir, seed_grid="2,3")
    assert main(cfg) == 0
    for seed in (2, 3):
        out = os.path.join(tmp_outdir, f"grid_seed{seed}")
        files = set(os.listdir(out))
        assert {"args.json", "losses.npz", "model.pkl"} <= files
        z = np.load(os.path.join(out, "losses.npz"), allow_pickle=True)
        assert z["VAE Loss"].shape[0] >= cfg.num_batches
        assert np.all(np.isfinite(z["VAE Loss"]))
    # different seeds ⇒ different manifolds ⇒ different traces
    za = np.load(os.path.join(tmp_outdir, "grid_seed2", "losses.npz"),
                 allow_pickle=True)
    zb = np.load(os.path.join(tmp_outdir, "grid_seed3", "losses.npz"),
                 allow_pickle=True)
    assert not np.allclose(za["VAE Loss"][:50], zb["VAE Loss"][:50])


def test_grid_seed_matches_solo_run(tmp_outdir):
    """A seed's trajectory inside the grid equals a solo XLA run with the
    same keys — vmap changes batching, not math."""
    cfg = make_cfg(tmp_outdir, num_batches=80)
    grid = GridTrainer(cfg, seeds=[5, 7])
    grid.state_grid, glosses = grid._train_chunk(
        grid.dataset_grid, grid.state_grid, 80
    )

    # Solo: replicate grid's key derivation for seed 5
    solo_cfg = make_cfg(tmp_outdir, name="solo", dataset_seed=5)
    out = make_output_dir("solo", True, solo_cfg, data_dir=tmp_outdir)
    ds = get_dataset("linear_gaussian", 5, solo_cfg)
    trainer = Trainer(solo_cfg, ds, out)
    # align keys with the grid's derivation
    key = jax.random.fold_in(jax.random.PRNGKey(0), 5)
    vae_key, key = jax.random.split(key)
    params = trainer.model.init(
        vae_key,
        jax.numpy.zeros((1, ds.dimension)),
        jax.numpy.zeros((1, 6)),
        jax.numpy.zeros((1, ds.dimension)),
    )["params"]
    z_key, key = jax.random.split(key)
    trainer.state = trainer.state.replace(
        params=params,
        model_key=z_key,
        data_key=jax.random.fold_in(jax.random.PRNGKey(5), 1),
    )
    trainer.state, slosses = trainer.fns.train_chunk(trainer.state, 80)

    np.testing.assert_allclose(
        np.asarray(glosses[0]), np.asarray(slosses), rtol=1e-5, atol=1e-5
    )


def test_grid_resume_artifacts_equal_uninterrupted(tmp_outdir):
    """A preempted + resumed grid sweep emits per-seed losses.npz files
    IDENTICAL to an uninterrupted sweep's (per-row checkpoints carry the
    recorder history + shared host key chain)."""
    seeds = [2, 3]

    def drive(data_dir, die_at=None):
        cfg = make_cfg(data_dir, num_batches=400, n_print=100, n_plot=200)
        trainer = GridTrainer(cfg, seeds)
        outdirs = []
        for s in seeds:
            sub = cfg.__class__(**{**cfg.to_json_dict()})
            sub.dataset_seed = s
            outdirs.append(make_output_dir(f"grid_seed{s}", True, sub,
                                           data_dir=data_dir))
        if die_at is not None:
            orig = trainer.compute_and_write_stats

            def dying_stats():
                if trainer.batchnum == die_at:
                    raise KeyboardInterrupt
                orig()

            trainer.compute_and_write_stats = dying_stats
            with pytest.raises(KeyboardInterrupt):
                trainer.train(outdirs)
            return cfg, outdirs
        trainer.train(outdirs)
        trainer.save_all(outdirs, final=True)
        return cfg, outdirs

    dir_a = os.path.join(tmp_outdir, "straight")
    dir_b = os.path.join(tmp_outdir, "preempted")
    _, outs_a = drive(dir_a)
    # Killed at the b=300 eval: the last checkpoint is the sync save at 200
    # (events at 200 already fired).
    cfg_b, outs_b = drive(dir_b, die_at=300)

    # Resume the whole grid in place and finish.
    cfg_b.resume = "rows"
    resumed = GridTrainer(cfg_b, seeds)
    resumed.restore(outs_b)
    assert resumed.batchnum == 200
    assert resumed._skip_events_at == 200
    resumed.train(outs_b)
    resumed.save_all(outs_b, final=True)

    for oa, ob in zip(outs_a, outs_b):
        za = np.load(os.path.join(oa, "losses.npz"), allow_pickle=True)
        zb = np.load(os.path.join(ob, "losses.npz"), allow_pickle=True)
        assert set(za.files) == set(zb.files)
        for k in za.files:
            np.testing.assert_array_equal(
                np.asarray(za[k], dtype=np.float64),
                np.asarray(zb[k], dtype=np.float64), err_msg=k)


def test_grid_kernels_pallas_strict_raises_off_tpu(tmp_outdir):
    """--kernels pallas must never silently train on the XLA fallback
    (VERDICT r2 item 3): grid construction raises when the fused kernel is
    unavailable (here: non-TPU backend)."""
    cfg = make_cfg(tmp_outdir, kernels="pallas")
    with pytest.raises(ValueError, match="pallas"):
        GridTrainer(cfg, seeds=[2, 3])


def test_grid_kernels_pallas_nojit_raises(tmp_outdir):
    cfg = make_cfg(tmp_outdir, kernels="pallas", nojit=True)
    with pytest.raises(ValueError, match="nojit"):
        GridTrainer(cfg, seeds=[2, 3])


def test_bench_grid_pallas_exits_nonzero_off_tpu():
    """bench.py --config grid --kernels pallas must exit nonzero off-TPU
    rather than measuring XLA under a pallas label."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "bench.py", "--config", "grid",
         "--kernels", "pallas"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode != 0
    assert "pallas" in (out.stderr + out.stdout)
