"""End-to-end preemption resilience: SIGTERM a real CLI training run
mid-flight, resume from its checkpoint, and verify the resumed run
continues exactly where the killed one stopped (bit-exact key streams)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=240, **popen_kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, "run.py"] + args,
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        **popen_kw,
    )


def communicate_checked(proc, timeout):
    """communicate() that never leaks a still-running child on timeout."""
    try:
        out, _ = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        raise
    return out


BASE = ["--dataset", "linear_gaussian", "--encoder_layer_sizes", "",
        "--layer_sizes", "", "-ow", "--latent_dim", "6", "--padding_dim",
        "3", "-dd", "3", "--batch_size", "32", "-tdv", "--epsilon", "-1",
        "-ds", "2", "-lr", "1e-3"]


@pytest.mark.slow
def test_sigterm_then_resume_completes(tmp_path):
    data_dir = str(tmp_path)
    # Frequent checkpoints so the kill lands after at least one.
    proc = run_cli(
        ["pre", *BASE, "--num_batches", "60000",
         "--checkpoint_every", "2000", "--data_dir", data_dir])
    try:
        ckpt = os.path.join(data_dir, "pre", "ckpt_meta.json")
        deadline = time.time() + 180
        step = 0
        while time.time() < deadline:
            if os.path.exists(ckpt):
                try:
                    step = json.load(open(ckpt))["step"]
                except Exception:
                    step = 0
                if step >= 2000:
                    break
            time.sleep(1)
        assert step >= 2000, "no checkpoint appeared before the deadline"
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
    finally:
        # an assert above must not leak a 60000-batch child writing into
        # an undrained PIPE for the rest of the session
        if proc.poll() is None:
            proc.kill()
        proc.communicate()

    # The polled step can be stale: under load the child may checkpoint
    # several more times before the SIGTERM lands. Now that it is dead,
    # re-read the meta so resume_target provably exceeds the checkpoint
    # the resume will actually restore from.
    step = json.load(open(ckpt))["step"]

    # Resume to a short final target and verify completion from >= ckpt step.
    resume_target = step + 3000
    proc2 = run_cli(
        ["pre_resumed", *BASE, "--num_batches", str(resume_target),
         "--resume", os.path.join(data_dir, "pre"), "--data_dir", data_dir])
    out = communicate_checked(proc2, 240)
    assert proc2.returncode == 0, out.decode()[-2000:]
    z = np.load(os.path.join(data_dir, "pre_resumed", "losses.npz"),
                allow_pickle=True)
    meta = json.load(open(os.path.join(data_dir, "pre_resumed",
                                       "ckpt_meta.json")))
    assert meta["step"] == resume_target
    assert np.all(np.isfinite(z["VAE Loss"]))

    # Artifact equality: an uninterrupted run to the same target produces
    # an IDENTICAL losses.npz (checkpoints carry the full host-side run
    # state — recorder history, eval-key counter, host key chain).
    proc3 = run_cli(
        ["pre_full", *BASE, "--num_batches", str(resume_target),
         "--data_dir", data_dir])
    out = communicate_checked(proc3, 240)
    assert proc3.returncode == 0, out.decode()[-2000:]
    zf = np.load(os.path.join(data_dir, "pre_full", "losses.npz"),
                 allow_pickle=True)
    assert set(zf.files) == set(z.files)
    for k in zf.files:
        np.testing.assert_array_equal(
            np.asarray(zf[k], dtype=np.float64),
            np.asarray(z[k], dtype=np.float64), err_msg=k)
