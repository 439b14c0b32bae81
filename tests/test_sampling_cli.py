"""sample.py serving path: restore a trained run, generate, score, plot."""

import os

import numpy as np


def test_sample_cli_roundtrip(tmp_path):
    from run import main as run_main
    from sample import main as sample_main
    from vae_training_tpu.config import parse_arguments

    data_dir = str(tmp_path)
    cfg = parse_arguments([
        "srv", "--dataset", "linear_gaussian", "--encoder_layer_sizes", "",
        "--layer_sizes", "", "-ow", "--latent_dim", "6", "--padding_dim",
        "3", "-dd", "3", "--num_batches", "200", "--batch_size", "32",
        "-tdv", "--epsilon", "-1", "-ds", "2", "-lr", "1e-3",
        "--data_dir", data_dir,
    ])
    cfg.tqdm = False
    assert run_main(cfg) == 0

    run_dir = os.path.join(data_dir, "srv")
    out = os.path.join(data_dir, "samples.npz")
    png = os.path.join(data_dir, "tile.png")
    assert sample_main([run_dir, "-n", "128", "-o", out, "--png", png]) == 0
    z = np.load(out)
    assert z["samples"].shape == (128, 6)
    assert z["latents"].shape == (128, 12)
    assert np.all(np.isfinite(z["samples"]))
    assert os.path.getsize(png) > 0

    # determinism: same seed ⇒ same samples
    out2 = os.path.join(data_dir, "samples2.npz")
    sample_main([run_dir, "-n", "128", "-o", out2])
    np.testing.assert_array_equal(z["samples"], np.load(out2)["samples"])
    # different seed ⇒ different samples
    out3 = os.path.join(data_dir, "samples3.npz")
    sample_main([run_dir, "-n", "128", "-o", out3, "--seed", "7"])
    assert not np.array_equal(z["samples"], np.load(out3)["samples"])


def test_epoch_mode_rejects_tp_mesh(tmp_path):
    """Epoch mode shards the batch over dp (supported — see
    tests/test_images_and_conv.py); a tp axis has nothing to shard and is
    rejected with a clear message."""
    import pytest

    from vae_training_tpu.config import RunConfig
    from vae_training_tpu.data import get_dataset
    from vae_training_tpu.runio import make_output_dir
    from vae_training_tpu.train import Trainer

    cfg = RunConfig(
        name="em", dataset="image", image_source="synthetic", image_size=16,
        num_images=64, num_epochs=1, batch_size=16, latent_dimension=4,
        conv_channels="8|16", mesh="dp=2,tp=2", overwrite=True, tqdm=False,
        data_dir=str(tmp_path),
    ).validate()
    out = make_output_dir(cfg.name, True, cfg, data_dir=cfg.data_dir)
    ds = get_dataset("image", 0, cfg)
    with pytest.raises(ValueError, match="dp"):
        Trainer(cfg, ds, out)
