"""Checkpoint/resume bit-exactness and model.pkl export round-trip.

Resume determinism is a design property: per-step keys derive from
fold_in(base_key, step), so a resumed run consumes the identical random
stream as an uninterrupted one — the state after 100+100 steps equals the
state after 200 straight steps, bit for bit.
"""

import os
import pickle

import jax
import numpy as np

from vae_training_tpu.config import RunConfig
from vae_training_tpu.data import get_dataset
from vae_training_tpu.runio import (
    make_output_dir,
    restore_checkpoint,
    save_checkpoint,
)
from vae_training_tpu.runio.export import load_model_pkl, save_model_pkl
from vae_training_tpu.train import Trainer


def build(tmpdir, name="ck", **kw):
    defaults = dict(
        name=name,
        dataset="linear_gaussian",
        encoder_layer_sizes="",
        layer_sizes="",
        latent_dimension=6,
        padding_dim=3,
        dataset_dimension=3,
        num_batches=200,
        batch_size=50,
        learning_rate=1e-3,
        epsilon=-1.0,
        tunable_decoder_var=True,
        dataset_seed=2,
        overwrite=True,
        tqdm=False,
        data_dir=tmpdir,
    )
    defaults.update(kw)
    cfg = RunConfig(**defaults).validate()
    out = make_output_dir(cfg.name, cfg.overwrite, cfg, data_dir=cfg.data_dir)
    ds = get_dataset(cfg.dataset, cfg.dataset_seed, cfg)
    return Trainer(cfg, ds, out), out, cfg


def tree_equal(a, b):
    eq = jax.tree_util.tree_map(
        lambda x, y: bool(np.array_equal(np.asarray(x), np.asarray(y))), a, b
    )
    return all(jax.tree_util.tree_leaves(eq))


def test_resume_is_bit_exact(tmp_outdir):
    straight, _, _ = build(tmp_outdir, "a")
    straight.state, _ = straight.fns.train_chunk(straight.state, 200)

    half, out, _ = build(tmp_outdir, "b")
    half.state, _ = half.fns.train_chunk(half.state, 100)
    save_checkpoint(out, half.state)

    resumed, _, _ = build(tmp_outdir, "c", resume=out)
    assert int(resumed.state.step) == 100
    resumed.state, _ = resumed.fns.train_chunk(resumed.state, 100)

    assert tree_equal(straight.state.params, resumed.state.params)
    assert tree_equal(straight.state.opt_state, resumed.state.opt_state)
    assert int(resumed.state.step) == 200


def test_model_pkl_layout_and_roundtrip(tmp_outdir):
    trainer, out, _ = build(tmp_outdir, "pkl")
    trainer.state, _ = trainer.fns.train_chunk(trainer.state, 50)
    path = os.path.join(out, "model.pkl")
    save_model_pkl(path, jax.device_get(trainer.state.params),
                   jax.device_get(trainer.state.opt_state))

    with open(path, "rb") as f:
        sd = pickle.load(f)
    # Reference optimizer-state-dict layout (/root/reference/model.py:85-89)
    assert set(sd) == {"target", "state"}
    assert "params" in sd["target"]
    assert set(sd["target"]["params"]) >= {"Encoder", "Decoder", "epsilon_p"}
    assert sd["state"]["step"] == 50
    ps = sd["state"]["param_states"]
    any_leaf = ps["Encoder"]["FC0"]["kernel"]
    assert set(any_leaf) == {"grad_ema", "grad_sq_ema"}

    # Round-trip through --state_dict restore
    fresh, _, _ = build(tmp_outdir, "pkl2")
    params, opt_state = load_model_pkl(path, fresh.state.params,
                                       fresh.state.opt_state)
    assert tree_equal(params, trainer.state.params)
    # Adam moments restored
    import optax
    def moments(s):
        for x in jax.tree_util.tree_leaves(
            s, is_leaf=lambda y: isinstance(y, optax.ScaleByAdamState)):
            if isinstance(x, optax.ScaleByAdamState):
                return x
    m0, m1 = moments(trainer.state.opt_state), moments(opt_state)
    assert tree_equal(m0.mu, m1.mu) and tree_equal(m0.nu, m1.nu)
    assert int(m1.count) == 50


def test_state_dict_flag_resumes_params(tmp_outdir):
    trainer, out, _ = build(tmp_outdir, "sd1")
    trainer.state, _ = trainer.fns.train_chunk(trainer.state, 30)
    path = os.path.join(out, "model.pkl")
    save_model_pkl(path, jax.device_get(trainer.state.params),
                   jax.device_get(trainer.state.opt_state))
    resumed, _, _ = build(tmp_outdir, "sd2", state_dict=path)
    assert tree_equal(resumed.state.params, trainer.state.params)


def test_checkpoint_never_replaced_by_older(tmp_outdir):
    """A queued async save must not clobber a newer sync checkpoint."""
    trainer, out, _ = build(tmp_outdir, "order")
    old_state = jax.device_get(trainer.state)  # host snapshot at step 0
    # (snapshot BEFORE the chunk: train_chunk donates its input buffers)
    trainer.state, _ = trainer.fns.train_chunk(trainer.state, 20)
    save_checkpoint(out, trainer.state)  # step 20
    save_checkpoint(out, old_state)  # stale write attempt
    restored = restore_checkpoint(out, trainer.state)
    assert int(restored.step) == 20  # newer checkpoint survived


def test_make_output_dir_reuse_existing(tmp_outdir):
    from vae_training_tpu.config import RunConfig
    from vae_training_tpu.runio import make_output_dir

    cfg = RunConfig(name="ruse", data_dir=tmp_outdir)
    out = make_output_dir("ruse", False, cfg, data_dir=tmp_outdir)
    marker = os.path.join(out, "keep.me")
    open(marker, "w").write("x")
    # reuse keeps artifacts and refreshes the manifest without clobbering
    out2 = make_output_dir("ruse", False, cfg, data_dir=tmp_outdir,
                           reuse_existing=True)
    assert out2 == out and os.path.exists(marker)


def test_mixed_backends_restore_newest(tmp_outdir):
    """A newer orbax sync save must win over an older msgpack async save
    (and vice versa): restore follows the meta's backend, and the
    step-ordering guard holds across backends."""
    from vae_training_tpu.runio.checkpoint import (
        save_checkpoint_async,
        save_checkpoint_orbax,
    )

    trainer, out, _ = build(tmp_outdir, "mix")
    old_state = jax.device_get(trainer.state)  # step 0 snapshot
    trainer.state, _ = trainer.fns.train_chunk(trainer.state, 20)
    # async msgpack save at step 20 (simulating --checkpoint_every) ...
    save_checkpoint_async(out, trainer.state, backend="msgpack").result()
    trainer.state, _ = trainer.fns.train_chunk(trainer.state, 20)
    # ... then a newer orbax sync save at step 40 (--ckpt_backend orbax)
    save_checkpoint_orbax(out, trainer.state)
    # a stale queued msgpack write must be refused across backends
    save_checkpoint(out, old_state)
    restored = restore_checkpoint(out, jax.device_get(trainer.state))
    assert int(restored.step) == 40
    assert tree_equal(restored.params, jax.device_get(trainer.state.params))
    # and a stale queued ORBAX write must be refused too
    save_checkpoint_orbax(out, old_state)
    restored = restore_checkpoint(out, jax.device_get(trainer.state))
    assert int(restored.step) == 40


def test_async_save_honors_backend(tmp_outdir):
    """save_checkpoint_async(backend='orbax') writes orbax, not msgpack."""
    from vae_training_tpu.runio.checkpoint import (
        ORBAX_NAME,
        save_checkpoint_async,
    )

    trainer, out, _ = build(tmp_outdir, "asyb")
    trainer.state, _ = trainer.fns.train_chunk(trainer.state, 10)
    save_checkpoint_async(out, trainer.state, backend="orbax").result()
    assert os.path.exists(os.path.join(out, ORBAX_NAME))
    assert not os.path.exists(os.path.join(out, "ckpt.msgpack"))
    restored = restore_checkpoint(out, jax.device_get(trainer.state))
    assert int(restored.step) == 10


def test_orbax_backend_roundtrip(tmp_outdir):
    """--ckpt_backend orbax: save via orbax, --resume auto-detects it."""
    from vae_training_tpu.runio.checkpoint import (
        checkpoint_exists,
        save_checkpoint_orbax,
    )

    trainer, out, cfg = build(tmp_outdir, "orb", ckpt_backend="orbax")
    trainer.state, _ = trainer.fns.train_chunk(trainer.state, 40)
    save_checkpoint_orbax(out, trainer.state,
                          extra_meta={"current_epsilon": -2.5})
    assert checkpoint_exists(out)
    assert not os.path.exists(os.path.join(out, "ckpt.msgpack"))

    resumed, _, _ = build(tmp_outdir, "orb2", resume=out)
    assert int(resumed.state.step) == 40
    assert float(np.asarray(resumed.current_epsilon)) == -2.5
    assert tree_equal(resumed.state.params, trainer.state.params)
