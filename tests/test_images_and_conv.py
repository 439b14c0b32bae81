"""Image dataset, pure-JAX tiling, conv VAE, and the epoch-mode loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_training_tpu.config import RunConfig
from vae_training_tpu.data import ImageDataset, get_dataset
from vae_training_tpu.models.conv import build_conv_vae
from vae_training_tpu.ops.images import img_tile, resize_image, tile_images
from vae_training_tpu.runio import make_output_dir
from vae_training_tpu.train import Trainer


def test_synthetic_digits_shapes():
    ds = ImageDataset.synthetic_digits(0, n=32, size=16)
    assert ds.images.shape == (32, 16, 16, 1)
    assert ds.is_epochs and ds.dimension == 256 and ds.shape == (16, 16, 1)
    assert float(ds.images.min()) >= -1.0 and float(ds.images.max()) <= 1.0
    # deterministic by seed
    ds2 = ImageDataset.synthetic_digits(0, n=32, size=16)
    np.testing.assert_array_equal(np.asarray(ds.images), np.asarray(ds2.images))
    batch = ds.sample(jax.random.PRNGKey(0), 8)
    assert batch.shape == (8, 256)


def test_npz_roundtrip(tmp_path):
    ds = ImageDataset.synthetic_digits(1, n=8, size=16)
    path = str(tmp_path / "imgs.npz")
    ds.save(path)
    ds2 = ImageDataset.from_npz(path)
    np.testing.assert_allclose(
        np.asarray(ds.images), np.asarray(ds2.images), atol=1e-6)


def test_npz_roundtrip_all_nonnegative_corpus(tmp_path):
    """save() must stamp pixel_range so a bright corpus (all remapped
    pixels >= 0 — e.g. white-background images) isn't remapped a SECOND
    time by from_npz's auto heuristic on reload."""
    bright = np.full((4, 8, 8, 1), 0.5, np.float32)  # in [-1,1], min >= 0
    ds = ImageDataset(images=bright, h=8, w=8, c=1)
    path = str(tmp_path / "bright.npz")
    ds.save(path)
    ds2 = ds.load(path)
    np.testing.assert_allclose(np.asarray(ds2.images), bright, atol=1e-6)


def test_tile_images_layout():
    imgs = jnp.stack([jnp.full((4, 4), -1.0), jnp.full((4, 4), 1.0)])
    tile = tile_images(imgs, border=1)
    # 2 images → 2x1 or 1x2 grid; [-1,1] mapped to [0,1]
    assert set(np.unique(np.asarray(tile))) <= {0.0, 1.0}
    r = resize_image(tile, (8, 8))
    assert r.shape[:2] == (8, 8)


def test_img_tile_writes_png(tmp_path):
    imgs = np.random.RandomState(0).randn(9, 8, 8).astype(np.float32)
    fn = str(tmp_path / "tile.png")
    out = img_tile(imgs, fn, save=True)
    assert os.path.exists(fn) and os.path.getsize(fn) > 0
    assert out.shape == (256, 256)


def test_conv_vae_forward_and_generate():
    model = build_conv_vae(image_hwc=(16, 16, 1), latent_dim=8,
                           channels_spec="8|16", epsilon=-1.0,
                           tunable_decoder_var=True)
    x = jnp.zeros((4, 256))
    z1 = jnp.zeros((4, 8))
    z2 = jnp.zeros((4, 256))
    params = model.init(jax.random.PRNGKey(0), x, z1, z2)["params"]
    assert set(params) >= {"Encoder", "Decoder", "epsilon_p", "epsilon"}
    assert params["epsilon_p"].shape == (8,)
    x_hat, mu, logvar_e, epsilon = model.apply({"params": params}, x, z1, z2)
    assert x_hat.shape == (4, 256) and mu.shape == (4, 8)
    out = model.apply({"params": params}, z1, z2, jnp.asarray(-2.0),
                      method=type(model).generate)
    assert out.shape == (4, 256)


def test_conv_vae_rejects_bad_size():
    with pytest.raises(ValueError, match="divisible"):
        model = build_conv_vae(image_hwc=(18, 18, 1), latent_dim=4)
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 324)),
                   jnp.zeros((1, 4)), jnp.zeros((1, 324)))


def test_epoch_mode_end_to_end(tmp_outdir):
    from run import main

    cfg = RunConfig(
        name="img", dataset="image", image_source="synthetic",
        image_size=16, num_images=256, num_epochs=3, batch_size=32,
        latent_dimension=8, conv_channels="8|16", learning_rate=1e-3,
        epsilon=-1.0, tunable_decoder_var=True, overwrite=True, tqdm=False,
        data_dir=tmp_outdir,
    ).validate()
    assert main(cfg) == 0
    out = os.path.join(tmp_outdir, "img")
    files = set(os.listdir(out))
    assert {"args.json", "losses.npz", "model.pkl"} <= files
    assert "output_0.png" in files and "output_2.png" in files
    z = np.load(os.path.join(out, "losses.npz"), allow_pickle=True)
    # 3 epochs × 8 batches + 4 evals
    assert z["VAE Loss"].shape == (28,)
    assert np.all(np.isfinite(z["VAE Loss"]))
    # training reduces loss across epochs
    evals = z["KL divergence"]
    assert len(evals) == 4


def test_from_npz_corpus_end_to_end(tmp_outdir):
    """Real-file image path: --image_source <corpus.npz> through the full
    CLI pipeline (checked-in MNIST-scale 28x28 uint8 corpus,
    tests/data/tiny_digits.npz)."""
    from run import main

    corpus = os.path.join(os.path.dirname(__file__), "data",
                          "tiny_digits.npz")
    cfg = RunConfig(
        name="imgz", dataset="image", image_source=corpus,
        num_epochs=2, batch_size=16, latent_dimension=8,
        conv_channels="8|16", learning_rate=1e-3, epsilon=-1.0,
        tunable_decoder_var=True, overwrite=True, tqdm=False,
        data_dir=tmp_outdir,
    ).validate()
    assert main(cfg) == 0
    out = os.path.join(tmp_outdir, "imgz")
    files = set(os.listdir(out))
    assert {"args.json", "losses.npz", "model.pkl", "output_0.png"} <= files
    z = np.load(os.path.join(out, "losses.npz"), allow_pickle=True)
    # 2 epochs x 4 batches + 3 evals
    assert z["VAE Loss"].shape == (11,)
    assert np.all(np.isfinite(z["VAE Loss"]))


def test_epoch_mode_mesh_dp(tmp_outdir):
    """Epoch-mode training over a dp mesh: batch sharded per device,
    gradients pmean'd; runs the full engine loop on the 8-device CPU mesh
    and still converges."""
    cfg = RunConfig(
        name="imgm", dataset="image", image_source="synthetic",
        image_size=16, num_images=256, num_epochs=4, batch_size=32,
        latent_dimension=8, conv_channels="8|16", learning_rate=1e-3,
        epsilon=-1.0, tunable_decoder_var=True, overwrite=True, tqdm=False,
        data_dir=tmp_outdir, mesh="dp=8",
    ).validate()
    out = make_output_dir(cfg.name, True, cfg, data_dir=tmp_outdir)
    ds = get_dataset("image", 0, cfg)
    trainer = Trainer(cfg, ds, out)
    first = float(trainer.compute_stats()["VAE Loss"])
    trainer.train()
    last = float(trainer.compute_stats()["VAE Loss"])
    assert last < first
    assert int(trainer.state.step) == 4 * (256 // 32)
    # indivisible batch rejected with a clear message
    bad = RunConfig(
        name="imgbad", dataset="image", image_source="synthetic",
        image_size=16, num_images=64, batch_size=12, mesh="dp=8",
        overwrite=True, tqdm=False, data_dir=tmp_outdir,
    ).validate()
    ds_bad = get_dataset("image", 0, bad)
    with pytest.raises(ValueError, match="divisible"):
        Trainer(bad, ds_bad, out)


def test_epoch_training_converges(tmp_outdir):
    cfg = RunConfig(
        name="imgc", dataset="image", image_source="synthetic",
        image_size=16, num_images=512, num_epochs=8, batch_size=64,
        latent_dimension=16, conv_channels="8|16", learning_rate=1e-3,
        epsilon=-1.0, tunable_decoder_var=True, overwrite=True, tqdm=False,
        data_dir=tmp_outdir,
    ).validate()
    out = make_output_dir(cfg.name, True, cfg, data_dir=tmp_outdir)
    ds = get_dataset("image", 0, cfg)
    trainer = Trainer(cfg, ds, out)
    first = float(trainer.compute_stats()["VAE Loss"])
    trainer.train()
    last = float(trainer.compute_stats()["VAE Loss"])
    assert last < first


def test_from_npz_pixel_range_explicit_and_metadata(tmp_path):
    """ADVICE r2: an all-nonnegative [-1,1]-meaning corpus must be loadable
    unshifted — via pixel_range='pm1', an npz pixel_range metadata array,
    or the --image_range flag — with the heuristic only as fallback."""
    bright = np.random.RandomState(0).rand(6, 8, 8).astype(np.float32)

    p1 = str(tmp_path / "a.npz")
    np.savez(p1, images=bright)
    # heuristic fallback: all-nonnegative floats are remapped x*2-1
    ds = ImageDataset.from_npz(p1)
    np.testing.assert_allclose(np.asarray(ds.images)[..., 0],
                               bright * 2 - 1, atol=1e-6)
    # explicit override: pass through unchanged
    ds = ImageDataset.from_npz(p1, pixel_range="pm1")
    np.testing.assert_allclose(np.asarray(ds.images)[..., 0], bright,
                               atol=1e-6)

    # npz metadata wins over the heuristic under 'auto'
    p2 = str(tmp_path / "b.npz")
    np.savez(p2, images=bright, pixel_range="pm1")
    ds = ImageDataset.from_npz(p2)
    np.testing.assert_allclose(np.asarray(ds.images)[..., 0], bright,
                               atol=1e-6)

    # integer dtype with values > 1 ⇒ 0..255
    p3 = str(tmp_path / "c.npz")
    np.savez(p3, images=np.full((2, 8, 8), 255, np.uint8))
    ds = ImageDataset.from_npz(p3)
    np.testing.assert_allclose(np.asarray(ds.images), 1.0, atol=1e-6)

    # binarized integer {0, 1} corpus ⇒ [0, 1] → {-1, +1}, NOT 0..255
    p4 = str(tmp_path / "d.npz")
    binarized = (np.random.RandomState(1).rand(4, 8, 8) > 0.5).astype(np.uint8)
    np.savez(p4, images=binarized)
    ds = ImageDataset.from_npz(p4)
    np.testing.assert_allclose(np.asarray(ds.images)[..., 0],
                               binarized * 2.0 - 1.0, atol=1e-6)

    # integer corpus WITH negatives (e.g. ternary {-1,0,1}) already carries
    # [-1,1] semantics — must pass through, not get remapped to [-3,1]
    p5 = str(tmp_path / "e.npz")
    ternary = np.random.RandomState(2).choice(
        np.array([-1, 0, 1], np.int8), size=(4, 8, 8))
    np.savez(p5, images=ternary)
    ds = ImageDataset.from_npz(p5)
    np.testing.assert_allclose(np.asarray(ds.images)[..., 0],
                               ternary.astype(np.float32), atol=1e-6)

    with pytest.raises(ValueError, match="pixel_range"):
        ImageDataset.from_npz(p1, pixel_range="bogus")

    # the CLI flag threads through the registry
    cfg = RunConfig(
        name="rng", dataset="image", image_source=p1, image_range="pm1",
        num_batches=1, tqdm=False,
    ).validate()
    ds = get_dataset("image", 0, cfg)
    np.testing.assert_allclose(np.asarray(ds.images)[..., 0], bright,
                               atol=1e-6)


def test_epoch_chunk_matches_manual_steps():
    """The (software-pipelined) epoch program is pinned step-by-step to a
    manual per-batch computation with the same permutation and key streams
    — guards the prefetch restructure's batch indexing (each step i must
    still train on permutation slice i)."""
    import optax

    from vae_training_tpu.ops import elbo_terms
    from vae_training_tpu.train.state import TrainState, make_adam
    from vae_training_tpu.train.step import (
        make_epoch_chunk,
        sample_z,
        split_z,
    )

    ds = ImageDataset.synthetic_digits(3, n=12, size=8)
    model = build_conv_vae(image_hwc=ds.shape, latent_dim=4,
                           channels_spec="4|8", epsilon=-1.0,
                           tunable_decoder_var=True)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, ds.dimension)),
        jnp.zeros((1, 4)), jnp.zeros((1, ds.dimension)))["params"]
    tx = make_adam(1e-3)

    def fresh():
        return TrainState.create(
            params=jax.device_put(jax.device_get(params)), tx=tx,
            model_key=jax.random.PRNGKey(1), data_key=jax.random.PRNGKey(2))

    bs, nb = 4, 3
    epoch_chunk = make_epoch_chunk(model, ds, tx, bs)
    state, losses = epoch_chunk(fresh(), jnp.asarray(5), nb)
    losses = np.asarray(losses)

    # manual reference: per-step gather + grad + adam, no pipelining
    s = fresh()
    flat = ds.images.reshape(ds.n, -1)
    perm = jax.random.permutation(jax.random.fold_in(s.data_key, 5), ds.n)
    manual = []
    for i in range(nb):
        batch = jnp.take(flat, perm[i * bs:(i + 1) * bs], axis=0)
        kz = jax.random.fold_in(s.model_key, s.step)
        z = sample_z(kz, bs, 4, ds.dimension)
        z1, z2 = split_z(z, 4)

        def loss_fn(p):
            x_hat, mu, lv, eps = model.apply({"params": p}, batch, z1, z2)
            return elbo_terms(batch, x_hat, mu, lv, eps)[0]

        loss, grads = jax.value_and_grad(loss_fn)(s.params)
        updates, opt_state = tx.update(grads, s.opt_state, s.params)
        s = s.replace(params=optax.apply_updates(s.params, updates),
                      opt_state=opt_state, step=s.step + 1)
        manual.append(float(loss))

    np.testing.assert_allclose(losses, manual, rtol=1e-5, atol=1e-5)
    assert int(state.step) == nb
