"""Deep convergence oracles: the trained model must RECOVER the manifold,
not just reduce padding energy.

The linear-gaussian case has closed-form structure (SURVEY.md §6: "the
linear cases additionally have closed-form optima to verify against"): the
generator's learned decoder must span exactly col(A) ⊕ {0-padding}, so
generated samples live in A's column space and the decoder's principal
subspace aligns with A's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_training_tpu.config import RunConfig
from vae_training_tpu.data import get_dataset
from vae_training_tpu.runio import make_output_dir
from vae_training_tpu.train import Trainer


@pytest.mark.slow
def test_linear_vae_recovers_column_space(tmp_outdir):
    cfg = RunConfig(
        name="rec", dataset="linear_gaussian", encoder_layer_sizes="",
        layer_sizes="", latent_dimension=8, padding_dim=5,
        dataset_dimension=3, dataset_intrinsic_dimension=3,
        num_batches=20000, batch_size=100, learning_rate=1e-3,
        epsilon=-1.0, tunable_decoder_var=True, dataset_seed=2,
        overwrite=True, tqdm=False, data_dir=tmp_outdir,
    ).validate()
    out = make_output_dir(cfg.name, True, cfg, data_dir=tmp_outdir)
    ds = get_dataset(cfg.dataset, cfg.dataset_seed, cfg)
    trainer = Trainer(cfg, ds, out)
    trainer.state, _ = trainer.fns.train_chunk(trainer.state, 20000)

    Wd = np.asarray(trainer.state.params["Decoder"]["FC0"]["kernel"])  # (L, D)
    # Decoder outputs into padding dims must vanish.
    assert np.abs(Wd[:, ds.dim:]).max() < 0.05
    # The decoder's active output subspace must equal col(A): principal
    # angles between the top singular subspace of Wd[:, :dim] and col(A)
    # are ~0 ⇒ projector difference is small.
    A = np.asarray(ds.A, np.float64)
    P_A = A @ np.linalg.pinv(A)
    U, S, Vt = np.linalg.svd(Wd[:, : ds.dim].astype(np.float64).T,
                             full_matrices=False)
    k = ds.intrinsic_dim
    Uk = U[:, :k]
    P_W = Uk @ Uk.T
    assert np.abs(P_A - P_W).max() < 0.05
    # Generated samples lie in col(A) ⊕ 0-padding.
    fake, _ = trainer.sample_batch(jax.random.PRNGKey(0), 512)
    fake = np.asarray(fake, np.float64)
    resid = fake[:, : ds.dim] - fake[:, : ds.dim] @ P_A.T
    # residual small relative to signal (decoder output noise adds e^{ε/2})
    assert np.abs(resid).mean() < 0.2


def test_kl_nonnegative_on_live_dims():
    """KL(N(mu, e^lv) || N(0,1)) ≥ 0 for any mu, lv."""
    from vae_training_tpu.ops import kl_to_standard_normal

    rng = np.random.RandomState(0)
    mu = jnp.asarray(rng.randn(64, 9), jnp.float32)
    lv = jnp.asarray(rng.randn(9) * 2, jnp.float32)
    kl = np.asarray(kl_to_standard_normal(mu, lv))
    assert np.all(kl >= -1e-5)


def test_nojit_mode_runs(tmp_outdir):
    """-nojit stays usable: chunks are capped and the run completes."""
    from run import main

    cfg = RunConfig(
        name="nj", dataset="linear_gaussian", encoder_layer_sizes="",
        layer_sizes="", latent_dimension=4, padding_dim=2,
        dataset_dimension=3, num_batches=25, batch_size=8, nojit=True,
        overwrite=True, tqdm=False, data_dir=tmp_outdir,
    )
    with jax.disable_jit():
        assert main(cfg) == 0


def test_nojit_rejects_pallas(tmp_outdir):
    from vae_training_tpu.data import get_dataset as gd

    cfg = RunConfig(
        name="njp", dataset="linear_gaussian", encoder_layer_sizes="",
        layer_sizes="", latent_dimension=4, padding_dim=2,
        dataset_dimension=3, num_batches=5, batch_size=8, nojit=True,
        kernels="pallas", overwrite=True, tqdm=False, data_dir=tmp_outdir,
    ).validate()
    out = make_output_dir(cfg.name, True, cfg, data_dir=tmp_outdir)
    ds = gd(cfg.dataset, cfg.dataset_seed, cfg)
    with pytest.raises(ValueError, match="nojit"):
        Trainer(cfg, ds, out)
