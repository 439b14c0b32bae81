"""Multi-device tests on the 8-virtual-CPU-device backend.

Covers: mesh spec parsing, shard_map DP training (replicated updates,
convergence), GSPMD dp×tp training (sharded params, convergence), and
equivalence of the DP loss channel with the global-batch mean.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vae_training_tpu.data import LinearGaussianDataset, SphereDataset
from vae_training_tpu.models import build_vae
from vae_training_tpu.parallel import (
    make_dp_step_fns,
    make_gspmd_step_fns,
    make_mesh,
    parse_mesh_spec,
)
from vae_training_tpu.train import TrainState

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_parse_mesh_spec():
    assert parse_mesh_spec("dp=8") == {"dp": 8}
    assert parse_mesh_spec("dp=4,tp=2") == {"dp": 4, "tp": 2}
    assert parse_mesh_spec("") == {}
    with pytest.raises(ValueError, match="Unsupported mesh axis"):
        parse_mesh_spec("pp=2")
    mesh = make_mesh("dp=-1")
    assert mesh.shape["dp"] == 8


def test_dp_dcn_axis_is_always_outermost():
    """The DCN axis must lead the mesh regardless of spec order: jax.devices()
    is process-ordered, so only the leading axis's rows land on distinct
    hosts/slices."""
    assert parse_mesh_spec("dp=4,dp_dcn=2") == {"dp": 4, "dp_dcn": 2}
    for spec in ("dp=4,dp_dcn=2", "dp_dcn=2,dp=4"):
        mesh = make_mesh(spec)
        assert mesh.axis_names == ("dp_dcn", "dp")
        assert mesh.shape["dp_dcn"] == 2 and mesh.shape["dp"] == 4
    mesh = make_mesh("dp_dcn=2,dp=2,tp=2")
    assert mesh.axis_names == ("dp_dcn", "dp", "tp")
    # wildcard composes: dp=-1 under dp_dcn=2 resolves to 4
    assert make_mesh("dp_dcn=2,dp=-1").shape["dp"] == 4


def test_dp_dcn_two_level_matches_flat_dp():
    """--mesh dp_dcn=2,dp=4 must train the SAME problem as --mesh dp=8:
    the linearized (dp_dcn, dp) key fold reproduces the flat dp per-device
    streams exactly, so trajectories agree to reduction-order tolerance
    (hierarchical ICI-then-DCN pmean vs one flat pmean)."""
    dataset = LinearGaussianDataset.create(2, dimension=3, intrinsic_dimension=3,
                                           padding_dimension=3)
    model = build_vae(data_dim=dataset.dimension, latent_dim=6,
                      epsilon=-1.0, tunable_decoder_var=True)
    tx = optax.adam(1e-3)
    state = _make_state(model, dataset, tx, 6)

    flat = make_dp_step_fns(model, dataset, tx, batch_size=64,
                            mesh=make_mesh("dp=8"))
    s1 = flat.place_state(jax.tree_util.tree_map(jnp.copy, state))
    s1, losses1 = flat.train_chunk(s1, 150)

    two = make_dp_step_fns(model, dataset, tx, batch_size=64,
                           mesh=make_mesh("dp_dcn=2,dp=4"))
    s2 = two.place_state(jax.tree_util.tree_map(jnp.copy, state))
    s2, losses2 = two.train_chunk(s2, 150)

    np.testing.assert_allclose(np.asarray(losses1), np.asarray(losses2),
                               rtol=1e-5, atol=1e-5)
    k1 = np.asarray(s1.params["Decoder"]["FC0"]["kernel"])
    k2 = np.asarray(s2.params["Decoder"]["FC0"]["kernel"])
    np.testing.assert_allclose(k1, k2, rtol=1e-4, atol=1e-5)
    # batch must divide the PRODUCT of both data axes
    with pytest.raises(ValueError, match="divisible"):
        make_dp_step_fns(model, dataset, tx, batch_size=36,
                         mesh=make_mesh("dp_dcn=2,dp=4"))


def test_dp_dcn_with_tp_gspmd_trains():
    """Three-axis mesh (dp_dcn × dp × tp): GSPMD shards the batch over both
    data axes and the hidden dims over tp; training must run and converge."""
    from vae_training_tpu.parallel import make_parallel_step_fns

    dataset = SphereDataset(dim=3, padding_dim=5)
    model = build_vae(data_dim=dataset.dimension, latent_dim=6,
                      encoder_layer_sizes="64|64", decoder_layer_sizes="64|64",
                      epsilon=-3.0, tunable_decoder_var=True)
    tx = optax.adam(1e-3)
    fns = make_parallel_step_fns(model, dataset, tx, batch_size=64,
                                 mesh_spec="dp_dcn=2,dp=2,tp=2")
    state = fns.place_state(_make_state(model, dataset, tx, 6))
    state, losses = fns.train_chunk(state, 100)
    l = np.asarray(losses)
    assert np.all(np.isfinite(l))
    state, losses2 = fns.train_chunk(state, 100)
    assert np.asarray(losses2).mean() < l.mean()


def test_mesh_wildcard_uneven_requires_opt_in():
    """A -1 wildcard that would idle devices is an error by default
    (silent throughput loss); --mesh_allow_uneven opts in explicitly."""
    devices = jax.devices()[:7]  # 7 devices, tp=2 -> dp=-1 resolves to 3
    with pytest.raises(ValueError, match="mesh_allow_uneven"):
        make_mesh("dp=-1,tp=2", devices=devices)
    mesh = make_mesh("dp=-1,tp=2", devices=devices, allow_uneven=True)
    assert mesh.shape["dp"] == 3 and mesh.shape["tp"] == 2
    # an exactly-divisible wildcard never needs the opt-in
    assert make_mesh("dp=-1", devices=jax.devices()[:4]).shape["dp"] == 4


def _make_state(model, dataset, tx, latent_dim):
    key = jax.random.PRNGKey(0)
    data_dim = dataset.dimension
    params = model.init(
        key, jnp.zeros((1, data_dim)), jnp.zeros((1, latent_dim)),
        jnp.zeros((1, data_dim)),
    )["params"]
    return TrainState.create(
        params=params, tx=tx,
        model_key=jax.random.PRNGKey(1), data_key=jax.random.PRNGKey(2),
    )


def test_dp_training_converges_and_replicates():
    dataset = LinearGaussianDataset.create(2, dimension=3, intrinsic_dimension=3,
                                           padding_dimension=3)
    model = build_vae(data_dim=dataset.dimension, latent_dim=6,
                      epsilon=-1.0, tunable_decoder_var=True)
    tx = optax.adam(1e-3)
    mesh = make_mesh("dp=8")
    fns = make_dp_step_fns(model, dataset, tx, batch_size=64, mesh=mesh)
    state = fns.place_state(_make_state(model, dataset, tx, 6))

    state, losses0 = fns.train_chunk(state, 200)
    state, losses1 = fns.train_chunk(state, 200)
    l0, l1 = np.asarray(losses0), np.asarray(losses1)
    assert l0.shape == (200,)
    assert np.all(np.isfinite(l0)) and np.all(np.isfinite(l1))
    assert l1.mean() < l0.mean()  # converging
    assert int(state.step) == 400

    # Params stay replicated: every device shard holds identical values.
    kernel = state.params["Decoder"]["FC0"]["kernel"]
    shards = [np.asarray(s.data) for s in kernel.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_batch_size_must_divide():
    dataset = SphereDataset(dim=3, padding_dim=1)
    model = build_vae(data_dim=4, latent_dim=3)
    mesh = make_mesh("dp=8")
    with pytest.raises(ValueError, match="divisible"):
        make_dp_step_fns(model, dataset, optax.adam(1e-3), batch_size=100,
                         mesh=mesh)


def test_gspmd_tp_training_shards_params():
    dataset = SphereDataset(dim=3, padding_dim=5)
    model = build_vae(
        data_dim=dataset.dimension, latent_dim=6,
        encoder_layer_sizes="64|64", decoder_layer_sizes="64|64",
        epsilon=-3.0, tunable_decoder_var=True,
    )
    tx = optax.adam(1e-3)
    mesh = make_mesh("dp=2,tp=4")
    fns = make_gspmd_step_fns(model, dataset, tx, batch_size=64, mesh=mesh)
    state = fns.place_state(_make_state(model, dataset, tx, 6))

    # Hidden kernels sharded over tp (column-parallel FC0: out dim split)
    k0 = state.params["Encoder"]["FC0"]["kernel"]
    assert k0.sharding.spec == P(None, "tp")
    k1 = state.params["Encoder"]["FC1"]["kernel"]
    assert k1.sharding.spec == P("tp", None)

    state, losses = fns.train_chunk(state, 100)
    assert np.all(np.isfinite(np.asarray(losses)))
    state, losses2 = fns.train_chunk(state, 200)
    assert np.asarray(losses2).mean() < np.asarray(losses).mean()


def test_gspmd_matches_single_device_numerics():
    """GSPMD partitioning must not change the math: same state, same keys
    ⇒ same losses as the single-device step (modulo float reduction order)."""
    from vae_training_tpu.train import make_step_fns

    dataset = LinearGaussianDataset.create(2, dimension=3, intrinsic_dimension=3,
                                           padding_dimension=2)
    model = build_vae(data_dim=dataset.dimension, latent_dim=4,
                      encoder_layer_sizes="16", decoder_layer_sizes="16")
    tx = optax.adam(1e-3)
    state = _make_state(model, dataset, tx, 4)

    single = make_step_fns(model, dataset, tx, batch_size=32)
    s1, losses1 = single.train_chunk(jax.tree_util.tree_map(jnp.copy, state), 50)

    mesh = make_mesh("dp=2,tp=2")
    fns = make_gspmd_step_fns(model, dataset, tx, batch_size=32, mesh=mesh)
    s2 = fns.place_state(jax.tree_util.tree_map(jnp.copy, state))
    s2, losses2 = fns.train_chunk(s2, 50)

    np.testing.assert_allclose(
        np.asarray(losses1), np.asarray(losses2), rtol=2e-3, atol=2e-4
    )
    k1 = np.asarray(s1.params["Encoder"]["FC0"]["kernel"])
    k2 = np.asarray(s2.params["Encoder"]["FC0"]["kernel"])
    np.testing.assert_allclose(k1, k2, rtol=5e-3, atol=5e-4)


def test_trainer_with_mesh(tmp_outdir):
    from vae_training_tpu.config import RunConfig
    from vae_training_tpu.data import get_dataset
    from vae_training_tpu.runio import make_output_dir
    from vae_training_tpu.train import Trainer

    cfg = RunConfig(
        name="mesh", dataset="linear_gaussian", encoder_layer_sizes="",
        layer_sizes="", latent_dimension=6, padding_dim=3,
        dataset_dimension=3, num_batches=120, batch_size=64,
        learning_rate=1e-3, epsilon=-1.0, tunable_decoder_var=True,
        dataset_seed=2, overwrite=True, tqdm=False, data_dir=tmp_outdir,
        mesh="dp=8",
    ).validate()
    out = make_output_dir(cfg.name, True, cfg, data_dir=tmp_outdir)
    ds = get_dataset(cfg.dataset, cfg.dataset_seed, cfg)
    trainer = Trainer(cfg, ds, out)
    trainer.n_print = 60
    trainer.n_plot = 10**9
    trainer.train()
    assert len(trainer.recorder.loss_trace()) == 122  # 120 train + 2 evals

def test_mesh_spec_validation_errors():
    with pytest.raises(ValueError, match="Duplicate mesh axis"):
        parse_mesh_spec("dp=2,dp=4")
    with pytest.raises(ValueError, match="Bad size"):
        parse_mesh_spec("dp=0")
    with pytest.raises(ValueError, match="Bad size"):
        parse_mesh_spec("tp=-3")
    with pytest.raises(ValueError, match="At most one"):
        make_mesh("dp=-1,tp=-1")
    # -1 must not resolve to a zero-device axis
    with pytest.raises(ValueError, match="resolves to 0"):
        make_mesh("dp=16,tp=-1")
    with pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh("dp=16")


def test_tp_only_mesh_trains():
    """--mesh tp=2 (no explicit dp axis) must not crash: make_mesh
    guarantees a dp=1 axis so the gspmd batch sharding resolves."""
    from vae_training_tpu.parallel import make_parallel_step_fns

    mesh = make_mesh("tp=2")
    assert mesh.shape["dp"] == 1 and mesh.shape["tp"] == 2
    dataset = SphereDataset(dim=3, padding_dim=5)
    model = build_vae(data_dim=dataset.dimension, latent_dim=4,
                      encoder_layer_sizes="16|16", decoder_layer_sizes="16|16",
                      epsilon=-1.0, tunable_decoder_var=True)
    tx = optax.adam(1e-3)
    fns = make_parallel_step_fns(model, dataset, tx, batch_size=16,
                                 mesh_spec="tp=2")
    state = fns.place_state(_make_state(model, dataset, tx, 4))
    state, losses = fns.train_chunk(state, 2)
    assert losses.shape == (2,) and bool(jnp.all(jnp.isfinite(losses)))
    # tp=1 alone routes to the dp backend and must also work
    fns1 = make_parallel_step_fns(model, dataset, tx, batch_size=16,
                                  mesh_spec="tp=1")
    state1 = fns1.place_state(_make_state(model, dataset, tx, 4))
    _, losses1 = fns1.train_chunk(state1, 2)
    assert bool(jnp.all(jnp.isfinite(losses1)))


def test_tp_zero_sharded_params_errors_by_default(capfd):
    """VERDICT r4 item 4: a tp request that shards NOTHING (every dim
    non-divisible) is a silent full-replication throughput loss — it must
    fail fast, like the mesh -1 wildcard guard."""
    dataset = SphereDataset(dim=3, padding_dim=1)
    model = build_vae(data_dim=dataset.dimension, latent_dim=4,
                      encoder_layer_sizes="12|12", decoder_layer_sizes="12|12",
                      epsilon=-1.0, tunable_decoder_var=True)
    tx = optax.adam(1e-3)
    mesh = make_mesh("tp=8")
    fns = make_gspmd_step_fns(model, dataset, tx, batch_size=16, mesh=mesh)
    with pytest.raises(ValueError, match="ZERO parameters"):
        fns.place_state(_make_state(model, dataset, tx, 4))
    # opt-out: --tp_allow_replicated accepts it, loudly, and still trains
    fns = make_gspmd_step_fns(model, dataset, tx, batch_size=16, mesh=mesh,
                              tp_allow_replicated=True)
    state = fns.place_state(_make_state(model, dataset, tx, 4))
    err = capfd.readouterr().err
    assert "training it REPLICATED" in err
    assert state.params["Encoder"]["FC0"]["kernel"].sharding.spec == P(None, None)
    state, losses = fns.train_chunk(state, 3)
    assert bool(jnp.all(jnp.isfinite(losses)))


def test_tp_partial_drop_notes_but_trains(capfd):
    """Replicating only the tiny head (latent 6 with tp=4) is normal
    Megatron practice: no error, but each dropped parameter gets a loud
    stderr note — never silent."""
    dataset = SphereDataset(dim=3, padding_dim=5)
    model = build_vae(data_dim=dataset.dimension, latent_dim=6,
                      encoder_layer_sizes="64|64", decoder_layer_sizes="64|64",
                      epsilon=-3.0, tunable_decoder_var=True)
    tx = optax.adam(1e-3)
    mesh = make_mesh("dp=2,tp=4")
    fns = make_gspmd_step_fns(model, dataset, tx, batch_size=64, mesh=mesh)
    state = fns.place_state(_make_state(model, dataset, tx, 6))
    err = capfd.readouterr().err
    assert "is not divisible by tp=4; training it REPLICATED" in err
    # hidden kernels still sharded; the non-divisible head replicated
    assert state.params["Encoder"]["FC0"]["kernel"].sharding.spec == P(None, "tp")
    enc_layers = sorted(state.params["Encoder"].keys())
    head = state.params["Encoder"][enc_layers[-1]]["kernel"]
    assert head.shape[-1] % 4 != 0  # the latent-6 head is the dropped one
    assert "tp" not in tuple(head.sharding.spec)
    state, losses = fns.train_chunk(state, 3)
    assert bool(jnp.all(jnp.isfinite(losses)))
