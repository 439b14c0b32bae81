"""Multi-host (multi-process) training tests — VERDICT r3 item 1.

Launches REAL separate processes on the CPU backend — 2 processes × 4
virtual devices each, wired together with ``jax.distributed.initialize``
(gloo collectives) through the actual ``run.py --multihost`` flag path —
and asserts the run is equivalent to the single-process 8-device run:

- the per-device RNG streams are identical (the mesh spans the same global
  device list), so the loss trajectory matches to collective
  reduction-order tolerance and the scalar eval stats are bit-exact;
- process 0 owns every artifact and console line (utils/process.is_primary)
  — process 1 writes nothing and prints no stats;
- the two-level ``dp_dcn=2,dp=4`` mesh places the DCN axis exactly on the
  process boundary (4 local devices per process), exercising the
  hierarchical ICI-then-DCN gradient reduction across processes.

Reference capability being scaled: the vestigial cross-device hook at
/root/reference/utils.py:215-221 per SURVEY §2.2's comm-backend row; the
reference itself is single-process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_ARGS = [
    "--dataset", "linear_gaussian", "--encoder_layer_sizes", "",
    "--layer_sizes", "", "--latent_dim", "20", "--padding_dim", "9",
    "-dd", "3", "--num_batches", "120", "--epsilon", "-1", "-tdv",
    "-ds", "2", "-lr", "1e-3", "--kernels", "xla", "--batch_size", "96",
]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env(n_devices: int, coord: dict | None = None) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    # a child must not inherit the parent pytest run's coordinator vars
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    if coord:
        env.update({k: str(v) for k, v in coord.items()})
    return env


def _run_single(name: str, data_dir: str, mesh: str,
                extra=(), base_args=None) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "run.py", name, *(base_args or BASE_ARGS), *extra,
         "--mesh", mesh, "--data_dir", data_dir],
        cwd=REPO, env=_child_env(8), capture_output=True, text=True,
        timeout=600,
    )


def _run_multihost(name: str, data_dir: str, mesh: str,
                   extra=(), base_args=None, mesh_flag=True):
    """2 processes × 4 local devices through run.py --multihost."""
    port = _free_port()
    procs = []
    for pid in (0, 1):
        coord = {
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": 2,
            "JAX_PROCESS_ID": pid,
        }
        argv = [sys.executable, "run.py", name, *(base_args or BASE_ARGS),
                *extra, "--multihost", "--data_dir", data_dir]
        if mesh_flag:
            argv += ["--mesh", mesh]
        procs.append(subprocess.Popen(
            argv, cwd=REPO, env=_child_env(4, coord),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        outs.append((p.returncode, stdout, stderr))
    return outs


def _assert_equivalent(mh_dir: str, sp_dir: str, exact_stats: bool = True):
    a = np.load(os.path.join(mh_dir, "losses.npz"))
    b = np.load(os.path.join(sp_dir, "losses.npz"))
    assert set(a.keys()) == set(b.keys())
    for k in a.keys():
        x, y = a[k], b[k]
        assert x.shape == y.shape, (k, x.shape, y.shape)
        if k == "VAE Loss" or not exact_stats:
            # the trajectory differs only by collective reduction order
            # (gloo cross-process pmean vs single-process XLA reduce);
            # observed max |diff| ~3e-5 at |loss| ~ 40. Longer runs
            # (exact_stats=False) accumulate that ulp-level noise into the
            # params, so eval stats drift a ulp too.
            np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-4, err_msg=k)
        else:
            # scalar eval stats computed from (replicated) params fetched
            # by process 0 — bit-exact in practice over short runs
            np.testing.assert_array_equal(x, y, err_msg=k)


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_two_process_dp_matches_single_process(tmp_path):
    out = str(tmp_path)
    results = _run_multihost("mh", out, mesh="dp=8")
    for rc, stdout, stderr in results:
        assert rc == 0, f"multihost child failed:\n{stdout}\n{stderr[-2000:]}"
    rc0, out0, _ = results[0]
    rc1, out1, _ = results[1]
    # process 0 speaks; process 1 is silent on the artifact channels
    assert "Batch |" in out0 and "Score for real data" in out0
    assert "Batch |" not in out1 and "Score for real data" not in out1

    sp = _run_single("sp", out, mesh="dp=8")
    assert sp.returncode == 0, sp.stderr[-2000:]

    _assert_equivalent(os.path.join(out, "mh"), os.path.join(out, "sp"))
    # artifacts written exactly once, by process 0
    for f in ("args.json", "losses.npz", "model.pkl", "ckpt.msgpack"):
        assert os.path.exists(os.path.join(out, "mh", f)), f


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_dp_dcn_axis_spans_processes(tmp_path):
    """dp_dcn=2,dp=4 on 2 procs × 4 devices: each dp_dcn row IS one
    process, so the hierarchical reduce's outer pmean crosses the process
    boundary — and the linearized key fold keeps the trajectory equal to
    the flat single-process dp=8 run."""
    out = str(tmp_path)
    results = _run_multihost("mh2l", out, mesh="dp_dcn=2,dp=4")
    for rc, stdout, stderr in results:
        assert rc == 0, f"multihost child failed:\n{stdout}\n{stderr[-2000:]}"

    sp = _run_single("sp8", out, mesh="dp=8")
    assert sp.returncode == 0, sp.stderr[-2000:]

    _assert_equivalent(os.path.join(out, "mh2l"), os.path.join(out, "sp8"))


GRID_SEEDS = [2, 3, 4, 5, 6, 7, 8, 9]


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_seed_grid_matches_single_process(tmp_path):
    """VERDICT r4 item 1: --multihost x --seed_grid is REAL. The seed axis
    shards across the 2-process dp=8 mesh; each process fetches only its
    addressable rows, writes only its own rows' artifacts, and prints its
    own rows' console lines (process-prefixed). Per-row losses.npz must be
    identical to the single-process grid run (the sharded grid chunk has
    zero collectives, so rows compute bit-identically on their owner)."""
    out = str(tmp_path)
    seeds_arg = ",".join(str(s) for s in GRID_SEEDS)
    extra = ["--seed_grid", seeds_arg]
    results = _run_multihost("mhg", out, mesh="dp=8", extra=extra)
    for rc, stdout, stderr in results:
        assert rc == 0, f"multihost grid child failed:\n{stdout}\n{stderr[-2000:]}"
    out0, out1 = results[0][1], results[1][1]
    # each row's console lines come from exactly ONE process, its owner,
    # tagged with the process index
    for pid, text in ((0, out0), (1, out1)):
        assert f"[p{pid}] [seed" in text
        assert f"[p{1 - pid}] [seed" not in text
    seen0 = {s for s in GRID_SEEDS if f"[seed {s}]" in out0}
    seen1 = {s for s in GRID_SEEDS if f"[seed {s}]" in out1}
    assert seen0 and seen1 and not (seen0 & seen1)
    assert seen0 | seen1 == set(GRID_SEEDS)

    sp = _run_single("spg", out, mesh="dp=8", extra=extra)
    assert sp.returncode == 0, sp.stderr[-2000:]

    for s in GRID_SEEDS:
        mh_dir = os.path.join(out, f"mhg_seed{s}")
        sp_dir = os.path.join(out, f"spg_seed{s}")
        a = np.load(os.path.join(mh_dir, "losses.npz"))
        b = np.load(os.path.join(sp_dir, "losses.npz"))
        assert set(a.keys()) == set(b.keys())
        for k in a.keys():
            np.testing.assert_array_equal(a[k], b[k], err_msg=(s, k))
        for f in ("args.json", "model.pkl", "ckpt.msgpack"):
            assert os.path.exists(os.path.join(mh_dir, f)), (s, f)


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_seed_grid_without_mesh_fails_fast(tmp_path):
    """A multi-process grid with no dp mesh cannot establish row ownership
    — it must die with a clear error before any artifact writes."""
    results = _run_multihost("mhgnomesh", str(tmp_path), mesh="",
                             extra=["--seed_grid", "2,3"], mesh_flag=False)
    for rc, stdout, stderr in results:
        assert rc != 0
        assert "requires a dp mesh" in stderr
    assert not os.path.exists(os.path.join(str(tmp_path), "mhgnomesh_seed2"))


def _popen_multihost(name, data_dir, extra, port):
    """Start the 2-process pair without waiting (for kill tests)."""
    procs = []
    for pid in (0, 1):
        coord = {
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": 2,
            "JAX_PROCESS_ID": pid,
        }
        procs.append(subprocess.Popen(
            [sys.executable, "run.py", name, *extra, "--multihost",
             "--data_dir", data_dir],
            cwd=REPO, env=_child_env(4, coord),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    return procs


PRE_ARGS = [
    "--dataset", "linear_gaussian", "--encoder_layer_sizes", "",
    "--layer_sizes", "", "--latent_dim", "8", "--padding_dim", "3",
    "-dd", "3", "--epsilon", "-1", "-tdv", "-ds", "2", "-lr", "1e-3",
    "--kernels", "xla", "--batch_size", "96", "--mesh", "dp=8",
    "--n_print", "40", "--checkpoint_every", "40",
]


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_preemption_sigkill_resume_matches_uninterrupted(tmp_path):
    """VERDICT r4 item 2: multihost fault tolerance e2e. SIGKILL BOTH
    processes mid-run after a --checkpoint_every save landed, relaunch the
    pair with --resume, and assert the final losses.npz is identical to an
    uninterrupted 2-process run of the same length (checkpoints carry the
    full host-side run state; the dp key streams are per-step fold_in and
    therefore kill-point independent). msgpack only BY DESIGN: orbax saves
    are collective across processes and deadlock against the primary-only
    write discipline — config.validate rejects that combination
    (test_multihost_orbax_backend_rejected)."""
    import json
    import signal
    import time

    out = str(tmp_path)
    procs = _popen_multihost(
        "mhpre", out, [*PRE_ARGS, "-ow", "--num_batches", "100000"],
        _free_port())
    ckpt_meta = os.path.join(out, "mhpre", "ckpt_meta.json")
    try:
        deadline, step = time.time() + 240, 0
        while time.time() < deadline:
            if any(p.poll() is not None for p in procs):
                break  # a child died early — fail below with its output
            if os.path.exists(ckpt_meta):
                try:
                    step = json.load(open(ckpt_meta))["step"]
                except Exception:
                    step = 0
                if step >= 120:
                    break
            time.sleep(0.5)
        for p in procs:
            assert p.poll() is None, (
                f"child exited early:\n{p.communicate()[1][-2000:]}")
        assert step >= 120, "no checkpoint appeared before the deadline"
        for p in procs:
            p.send_signal(signal.SIGKILL)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
            p.communicate()

    # the polled step can be stale; re-read now that both are dead
    step = json.load(open(ckpt_meta))["step"]
    target = step + 120

    results = _run_multihost(
        "mhpre", out, mesh="", mesh_flag=False,
        base_args=[*PRE_ARGS, "--num_batches", str(target),
                   "--resume", os.path.join(out, "mhpre")])
    for rc, stdout, stderr in results:
        assert rc == 0, f"resume child failed:\n{stdout}\n{stderr[-2000:]}"

    full = _run_multihost(
        "mhfull", out, mesh="", mesh_flag=False,
        base_args=[*PRE_ARGS, "-ow", "--num_batches", str(target)])
    for rc, stdout, stderr in full:
        assert rc == 0, f"full-run child failed:\n{stdout}\n{stderr[-2000:]}"

    a = np.load(os.path.join(out, "mhpre", "losses.npz"), allow_pickle=True)
    b = np.load(os.path.join(out, "mhfull", "losses.npz"), allow_pickle=True)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(
            np.asarray(a[k], dtype=np.float64),
            np.asarray(b[k], dtype=np.float64), err_msg=k)


CHECK_FS_SCRIPT = """
import os, sys
from vae_training_tpu._platform import honor_platform_env
honor_platform_env()
import jax
jax.distributed.initialize(
    coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
    num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
    process_id=int(os.environ["JAX_PROCESS_ID"]),
)
from vae_training_tpu.utils.process import check_shared_fs
try:
    check_shared_fs(jax.process_index() == 0, "/fake/run/dir")
    print("NO-RAISE")
except ValueError as e:
    ok = "SHARED" in str(e) and "NOT to [1]" in str(e)
    print("RAISED-OK" if ok else f"RAISED-BAD {e}")
"""


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_restore_shared_fs_guard():
    """When checkpoint visibility disagrees across processes, the restore
    path must fail on EVERY process with the shared-filesystem requirement
    named — not crash process 1 with a file-not-found."""
    port = _free_port()
    procs = []
    for pid in (0, 1):
        coord = {
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": 2,
            "JAX_PROCESS_ID": pid,
        }
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHECK_FS_SCRIPT],
            cwd=REPO, env=_child_env(4, coord),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, stderr[-2000:]
        assert "RAISED-OK" in stdout, (stdout, stderr[-1000:])


CONV_ARGS = [
    "--dataset", "image", "--image_source", "synthetic", "--image_size",
    "12", "--num_images", "256", "--num_epochs", "3", "--batch_size", "64",
    "--arch", "conv", "--conv_channels", "8", "--latent_dim", "8",
    "-lr", "1e-3", "--epsilon", "-1", "-tdv", "-ow",
]


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_epoch_conv_matches_single_process(tmp_path):
    """VERDICT r4 item 3a: epoch-mode conv training under a 2-process dp
    mesh (the dp path shards each minibatch inside the compiled epoch
    program, train/step.py make_epoch_chunk) is equivalent to the
    single-process 8-device run."""
    out = str(tmp_path)
    results = _run_multihost("mhconv", out, mesh="dp=8",
                             base_args=CONV_ARGS)
    for rc, stdout, stderr in results:
        assert rc == 0, f"conv multihost child failed:\n{stdout}\n{stderr[-2000:]}"
    rc0, out0, _ = results[0]
    rc1, out1, _ = results[1]
    assert "Completed Epoch" in out0 and "Completed Epoch" not in out1

    sp = _run_single("spconv", out, mesh="dp=8", base_args=CONV_ARGS)
    assert sp.returncode == 0, sp.stderr[-2000:]

    a = np.load(os.path.join(out, "mhconv", "losses.npz"), allow_pickle=True)
    b = np.load(os.path.join(out, "spconv", "losses.npz"), allow_pickle=True)
    assert set(a.files) == set(b.files)
    for k in a.files:
        x = np.asarray(a[k], dtype=np.float64)
        y = np.asarray(b[k], dtype=np.float64)
        assert x.shape == y.shape, (k, x.shape, y.shape)
        # gloo cross-process reductions vs single-process XLA reductions:
        # reduction-order float noise only
        np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-4, err_msg=k)
    # per-epoch figures written once, by process 0
    assert os.path.exists(os.path.join(out, "mhconv", "output_0.png"))


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_tp_spans_processes(tmp_path):
    """VERDICT r4 item 3b: a dp x tp GSPMD mesh over 2 processes — the
    SPMD partitioner's activation/gradient collectives run over gloo —
    trains equivalently to the single-process run on the same mesh."""
    out = str(tmp_path)
    results = _run_multihost("mhtp", out, mesh="dp=4,tp=2")
    for rc, stdout, stderr in results:
        assert rc == 0, f"tp multihost child failed:\n{stdout}\n{stderr[-2000:]}"

    sp = _run_single("sptp", out, mesh="dp=4,tp=2")
    assert sp.returncode == 0, sp.stderr[-2000:]

    _assert_equivalent(os.path.join(out, "mhtp"), os.path.join(out, "sptp"))


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_plot_save_cadence_mid_run(tmp_path):
    """VERDICT r4 item 3c: a 2-process run long enough to cross plot/save
    cadences mid-run — every event fires on both processes simultaneously
    (the device sampling is collective) but only process 0 writes/prints."""
    out = str(tmp_path)
    extra = ["--n_print", "40", "--n_plot", "80", "--num_batches", "200"]
    results = _run_multihost("mhcad", out, mesh="dp=8", extra=extra)
    for rc, stdout, stderr in results:
        assert rc == 0, f"cadence child failed:\n{stdout}\n{stderr[-2000:]}"
    rc0, out0, _ = results[0]
    rc1, out1, _ = results[1]
    # stats fired at 0,40,...,160 and the final step — process 0 only
    for b in (0, 40, 80, 120, 160):
        assert f"Batch | {b} |" in out0, b
        assert f"Batch | {b} |" not in out1, b
    # mid-run plot/save events (80, 160) produced exactly one figure each
    for tag in (0, 80, 160, 199):
        assert os.path.exists(os.path.join(out, "mhcad", f"output_{tag}.png")), tag
    sp = _run_single("spcad", out, mesh="dp=8", extra=extra)
    assert sp.returncode == 0, sp.stderr[-2000:]
    # 200 steps accumulate reduction-order ulps into the params: tolerance
    # comparison for the eval channels too (see _assert_equivalent)
    _assert_equivalent(os.path.join(out, "mhcad"), os.path.join(out, "spcad"),
                       exact_stats=False)


PALLAS_GRID_SCRIPT = r'''
import os, sys
from vae_training_tpu._platform import honor_platform_env
honor_platform_env()
import jax
jax.distributed.initialize(
    coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
    num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
    process_id=int(os.environ["JAX_PROCESS_ID"]),
)
import jax.numpy as jnp
import numpy as np
from vae_training_tpu.config import RunConfig
from vae_training_tpu.train.grid import GridTrainer, fetch_grid_rows
from vae_training_tpu.kernels.linear_vae import (
    N, chunk_seed_and_t0, pack_state, run_fused_chunk, unpack_state)

N_STEPS, BATCH = 4, 32
SEEDS = [2, 3, 4, 5, 6, 7, 8, 9]
cfg = RunConfig(
    name="pmh", dataset="linear_gaussian", encoder_layer_sizes="",
    layer_sizes="", latent_dimension=6, padding_dim=3, dataset_dimension=3,
    dataset_intrinsic_dimension=3, num_batches=100, batch_size=BATCH,
    learning_rate=1e-3, epsilon=-1.0, tunable_decoder_var=True,
    overwrite=True, tqdm=False, data_dir=sys.argv[1], mesh="dp=8",
    kernels="auto").validate()
trainer = GridTrainer(cfg, SEEDS)
D, L = trainer.data_dim, trainer.latent_dim

# identical external noise on every process (np-seeded)
rng = np.random.RandomState(7)
rows = []
for _ in SEEDS:
    x = rng.randn(N_STEPS, BATCH, D).astype(np.float32)
    z1 = rng.randn(N_STEPS, BATCH, L).astype(np.float32)
    z2 = rng.randn(N_STEPS, BATCH, D).astype(np.float32)
    xp = np.zeros((N_STEPS, BATCH, N), np.float32); xp[..., :D] = x
    z1p = np.zeros((N_STEPS, BATCH, N), np.float32); z1p[..., :L] = z1
    z2p = np.zeros((N_STEPS, BATCH, N), np.float32); z2p[..., :D] = z2
    rows.append((jnp.asarray(xp), jnp.asarray(z1p), jnp.asarray(z2p)))
noise = tuple(jnp.stack([r[j] for r in rows]) for j in range(3))

fused = trainer._build_pallas_grid_chunk(interpret=True,
                                         external_noise=noise)
assert fused is not None, "interpret fused chunk must build on CPU"
init_rows = fetch_grid_rows(trainer.state_grid, trainer._owned_rows,
                            len(SEEDS))
new_grid, losses = fused(trainer.dataset_grid, trainer.state_grid, N_STEPS)
leaf = jax.tree_util.tree_leaves(new_grid.params)[0]
assert len(leaf.sharding.device_set) == 8, leaf.sharding
loss_rows = fetch_grid_rows(losses, trainer._owned_rows, len(SEEDS))
new_rows = fetch_grid_rows(new_grid, trainer._owned_rows, len(SEEDS))
for i in trainer._owned_rows:
    st = jax.tree_util.tree_map(jnp.asarray, init_rows[i])
    solo_bufs, solo_losses = run_fused_chunk(
        n_steps=N_STEPS, seed_and_t0=chunk_seed_and_t0(st),
        a_t=jnp.zeros((N, N), jnp.float32),
        buffers=pack_state(st, D, L, True),
        batch=BATCH, data_dim=D, latent_dim=L, intrinsic_dim=3,
        var_added=0.0, eps_const=-1.0, tdv=True, lr=1e-3,
        external_noise=tuple(n[i] for n in noise), interpret=True)
    np.testing.assert_array_equal(loss_rows[i], np.asarray(solo_losses),
                                  err_msg=f"row {i} losses")
    solo_state = unpack_state(st, solo_bufs, N_STEPS, D, L, True)
    got = jax.tree_util.tree_leaves_with_path(new_rows[i].params)
    want = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_leaves_with_path(solo_state.params)}
    for p, v in got:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(want[jax.tree_util.keystr(p)]),
            err_msg=f"row {i} {jax.tree_util.keystr(p)}")
print("PALLAS-GRID-OK", trainer._owned_rows, flush=True)
'''


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_pallas_grid_kernel_bitwise(tmp_path):
    """The REAL fused grid kernel body (interpret mode) sharded across a
    2-process mesh: each process's owned rows match solo-interpret kernel
    rows bitwise — the multihost analogue of test_grid_mesh_pallas. Also
    exercises the multi-process fused-chunk branch (donation, no XLA
    fallback wrapper) and fetch_grid_rows on kernel outputs."""
    port = _free_port()
    procs = []
    for pid in (0, 1):
        coord = {
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": 2,
            "JAX_PROCESS_ID": pid,
        }
        procs.append(subprocess.Popen(
            [sys.executable, "-c", PALLAS_GRID_SCRIPT, str(tmp_path)],
            cwd=REPO, env=_child_env(4, coord),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    owned = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, stderr[-3000:]
        assert "PALLAS-GRID-OK" in stdout, (stdout, stderr[-1000:])
        owned.append(stdout.split("PALLAS-GRID-OK")[1].strip())
    # the two processes owned disjoint halves of the grid
    assert owned[0] != owned[1]


GRID_PRE_ARGS = [
    "--dataset", "linear_gaussian", "--encoder_layer_sizes", "",
    "--layer_sizes", "", "--latent_dim", "8", "--padding_dim", "3",
    "-dd", "3", "--epsilon", "-1", "-tdv", "-ds", "2", "-lr", "1e-3",
    "--kernels", "xla", "--batch_size", "32", "--mesh", "dp=8",
    "--n_print", "50", "--n_plot", "100",
    "--seed_grid", ",".join(str(s) for s in GRID_SEEDS),
]


@pytest.mark.slow
@pytest.mark.skipif(sys.platform != "linux", reason="gloo CPU collectives")
def test_multihost_seed_grid_sigkill_resume_matches_uninterrupted(tmp_path):
    """Multihost GRID fault tolerance e2e: SIGKILL both processes of a
    --multihost --seed_grid run mid-training, --resume the pair, and every
    row's losses.npz equals an uninterrupted 2-process run's. The two
    processes flush their rows' checkpoints independently, so the kill can
    strand rows one save event apart — the retained .prev checkpoints plus
    GridTrainer.restore's rollback-to-common-step absorb that skew."""
    import json
    import signal
    import time

    out = str(tmp_path)
    row_dirs = [os.path.join(out, f"mhgp_seed{s}") for s in GRID_SEEDS]

    procs = _popen_multihost(
        "mhgp", out, [*GRID_PRE_ARGS, "-ow", "--num_batches", "100000"],
        _free_port())
    try:
        deadline, ok = time.time() + 300, False
        while time.time() < deadline:
            if any(p.poll() is not None for p in procs):
                break  # a child died early — fail below with its stderr
            steps = []
            for d in row_dirs:
                try:
                    with open(os.path.join(d, "ckpt_meta.json")) as f:
                        steps.append(json.load(f)["step"])
                except Exception:
                    steps = None
                    break
            # kill at an observed-consistent point: every row durable at
            # the SAME step. (Any skew that still slips in between this
            # read and the SIGKILL is what the rollback handles.)
            if steps and len(set(steps)) == 1 and steps[0] >= 100:
                ok = True
                break
            time.sleep(0.2)
        for p in procs:
            assert p.poll() is None, (
                f"grid child exited early:\n{p.communicate()[1][-3000:]}")
        assert ok, "rows never reached a common durable step >= 100"
        for p in procs:
            p.send_signal(signal.SIGKILL)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
            p.communicate()

    # resume target: 100 steps past the newest COMMON durable step
    steps = []
    for d in row_dirs:
        with open(os.path.join(d, "ckpt_meta.json")) as f:
            steps.append(json.load(f)["step"])
    common = min(steps)
    target = common + 100

    # Deterministically exercise the rollback machinery: fabricate on ONE
    # common-step row exactly what a skewed kill strands — its NEXT save
    # event durable (step+100) with the common-step trio retained as .prev
    # (save_checkpoint's retention layout). The resume must roll this row
    # back to the common step on every process, promote owner-side, and
    # still produce bit-identical artifacts.
    from flax import serialization as _ser

    skew_dir = row_dirs[steps.index(common)]
    with open(os.path.join(skew_dir, "ckpt.msgpack"), "rb") as f:
        raw = _ser.msgpack_restore(f.read())
    assert int(np.asarray(raw["step"]).reshape(-1)[0]) == common
    raw["step"] = np.asarray(raw["step"]) + 100
    for name in ("ckpt.msgpack", "ckpt_aux.pkl", "ckpt_meta.json"):
        pth = os.path.join(skew_dir, name)
        if os.path.exists(pth):
            os.replace(pth, pth + ".prev")
    with open(os.path.join(skew_dir, "ckpt.msgpack"), "wb") as f:
        f.write(_ser.msgpack_serialize(raw))
    with open(os.path.join(skew_dir, "ckpt_meta.json"), "w") as f:
        json.dump({"step": common + 100, "backend": "msgpack"}, f)

    results = _run_multihost(
        "mhgp", out, mesh="", mesh_flag=False,
        base_args=[*GRID_PRE_ARGS, "--num_batches", str(target),
                   "--resume", "rows"])
    for rc, stdout, stderr in results:
        assert rc == 0, f"grid resume child failed:\n{stdout}\n{stderr[-3000:]}"
        # every process detected the skewed row and rolled it back
        assert "rolling back from step" in stdout, stdout[-2000:]
    # the discarded fake save must not wedge later checkpoints: the final
    # save landed at the run length
    with open(os.path.join(skew_dir, "ckpt_meta.json")) as f:
        assert json.load(f)["step"] == target

    full = _run_multihost(
        "mhgf", out, mesh="", mesh_flag=False,
        base_args=[*GRID_PRE_ARGS, "-ow", "--num_batches", str(target)])
    for rc, stdout, stderr in full:
        assert rc == 0, f"grid full child failed:\n{stdout}\n{stderr[-3000:]}"

    for s in GRID_SEEDS:
        a = np.load(os.path.join(out, f"mhgp_seed{s}", "losses.npz"),
                    allow_pickle=True)
        b = np.load(os.path.join(out, f"mhgf_seed{s}", "losses.npz"),
                    allow_pickle=True)
        assert set(a.files) == set(b.files), s
        for k in a.files:
            np.testing.assert_array_equal(
                np.asarray(a[k], dtype=np.float64),
                np.asarray(b[k], dtype=np.float64), err_msg=(s, k))


def test_multihost_orbax_backend_rejected():
    """--ckpt_backend orbax must fail fast under --multihost: orbax's save
    protocol is collective (every process enters the save; its barrier
    waits for the rest), which deadlocks against the engine's process-0-
    only artifact writes — observed as a run that trains forever and never
    lands a checkpoint. The guard fires at config validation, BEFORE
    jax.distributed.initialize."""
    from vae_training_tpu.config import RunConfig

    with pytest.raises(ValueError, match="orbax does not compose"):
        RunConfig(name="x", dataset="linear_gaussian", multihost=True,
                  ckpt_backend="orbax").validate()
    # either alone stays valid
    RunConfig(name="x", dataset="linear_gaussian",
              ckpt_backend="orbax").validate()
    RunConfig(name="x", dataset="linear_gaussian", multihost=True).validate()
