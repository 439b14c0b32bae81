"""The background artifact writer: ordering, failure surfacing, and
submit-time snapshot isolation of the grid trainer's async saves."""

import os
import threading
import time

import numpy as np
import pytest

from vae_training_tpu.runio.background import ArtifactWriter, get_artifact_writer
from vae_training_tpu.runio.outdir import make_output_dir
from vae_training_tpu.train.grid import GridTrainer

from tests.test_grid import make_cfg


def test_writer_runs_jobs_in_fifo_order():
    w = ArtifactWriter()
    seen = []
    for i in range(20):
        w.submit(lambda i=i: seen.append(i))
    w.drain()
    assert seen == list(range(20))


def test_writer_drain_waits_for_slow_job():
    w = ArtifactWriter()
    done = []

    def slow():
        time.sleep(0.2)
        done.append(1)

    w.submit(slow)
    w.drain()
    assert done == [1]


def test_writer_failure_surfaces_on_drain_and_next_submit():
    w = ArtifactWriter()
    w.submit(lambda: (_ for _ in ()).throw(ValueError("disk full")))
    with pytest.raises(RuntimeError, match="artifact write failed") as ei:
        w.drain()
    assert isinstance(ei.value.__cause__, ValueError)
    # the error is consumed by the raise — the writer keeps working after
    w.submit(lambda: None)
    w.drain()

    # also surfaces on submit (without an intervening drain)
    w.submit(lambda: (_ for _ in ()).throw(OSError("boom")))
    w._q.join()  # job finished, error stored, nothing raised yet
    with pytest.raises(RuntimeError, match="artifact write failed"):
        w.submit(lambda: None)


def test_drain_quietly_logs_the_swallowed_failure(capsys):
    """drain_quietly (crash-path flush) must not mask the in-flight error —
    but it must LOG the stored write failure before discarding it: it can be
    the only trace that a checkpoint never hit disk."""
    w = ArtifactWriter()
    w.submit(lambda: (_ for _ in ()).throw(OSError("disk full")))
    w.drain_quietly()  # no raise
    err = capsys.readouterr().err
    assert "background write failed" in err
    assert "disk full" in err  # the chained original is in the traceback


def test_writer_failure_does_not_stop_later_jobs():
    w = ArtifactWriter()
    seen = []
    w.submit(lambda: (_ for _ in ()).throw(ValueError("x")))
    w.submit(lambda: seen.append("after"))
    with pytest.raises(RuntimeError):
        w.drain()
    assert seen == ["after"]


def test_writer_queue_is_bounded_backpressure():
    """Producers outrunning the disk must block (bounded queue), not pile
    up an unbounded chain of host state snapshots."""
    w = ArtifactWriter()
    gate = threading.Event()
    w.submit(gate.wait)  # occupy the worker
    cap = w._q.maxsize
    assert cap > 0
    for _ in range(cap):  # fill the queue behind it
        w.submit(lambda: None)
    blocked = threading.Event()

    def producer():
        w.submit(lambda: None)  # must block until the worker frees a slot
        blocked.set()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    assert not blocked.wait(0.3)  # still blocked while the queue is full
    gate.set()
    assert blocked.wait(5.0)
    t.join(5.0)
    w.drain()


def test_process_writer_is_a_singleton():
    assert get_artifact_writer() is get_artifact_writer()


def test_grid_save_all_snapshots_at_submit_time(tmp_outdir):
    """save_all enqueues host IO; the written losses.npz must reflect the
    recorder AT SUBMIT TIME even if training appends more losses while the
    write is still queued (the live-mutation hazard async saves introduce)."""
    cfg = make_cfg(tmp_outdir, num_batches=120)
    trainer = GridTrainer(cfg, seeds=[2])
    out = make_output_dir("snap_seed2", True, cfg, data_dir=tmp_outdir)

    trainer.compute_and_write_stats()
    n_at_submit = len(trainer.recorders[0].loss_trace())

    gate = threading.Event()
    writer = get_artifact_writer()
    writer.submit(gate.wait)  # hold the queue: save job can't start yet
    trainer.save_all([out])
    # mutate AFTER submit, BEFORE the queued write executes
    trainer.recorders[0].append_train_losses(np.full(64, 123.0, np.float32))
    gate.set()
    writer.drain()

    z = np.load(os.path.join(out, "losses.npz"), allow_pickle=True)
    assert z["VAE Loss"].shape[0] == n_at_submit
    assert not np.any(z["VAE Loss"] == 123.0)
    # checkpoint aux carries the same submit-time snapshot
    import pickle

    with open(os.path.join(out, "ckpt_aux.pkl"), "rb") as f:
        aux = pickle.load(f)
    assert sum(len(np.asarray(x).reshape(-1))
               for x in aux["recorder"]["vae_losses"]) == n_at_submit


def test_solo_save_snapshots_at_submit_time(tmp_outdir):
    """Trainer.save() enqueues host IO; the written losses.npz must reflect
    the recorder AT SUBMIT TIME even if training appends more losses while
    the write is still queued."""
    from tests.test_train_loop import build_trainer

    trainer, out = build_trainer(tmp_outdir, num_batches=120)
    trainer.write_stats(trainer.compute_stats())
    n_at_submit = len(trainer.recorder.loss_trace())

    gate = threading.Event()
    writer = get_artifact_writer()
    writer.submit(gate.wait)  # hold the queue: save job can't start yet
    trainer.save()
    trainer.recorder.append_train_losses(np.full(64, 123.0, np.float32))
    gate.set()
    writer.drain()

    z = np.load(os.path.join(out, "losses.npz"), allow_pickle=True)
    assert z["VAE Loss"].shape[0] == n_at_submit
    assert not np.any(z["VAE Loss"] == 123.0)


def test_solo_train_failure_still_flushes_queued_artifacts(tmp_outdir):
    """A crash inside the training loop must not strand queued saves: the
    exception propagates unmasked AND previously-enqueued artifacts land on
    disk (they are the newest durable checkpoint a supervised retry
    resumes from)."""
    from tests.test_train_loop import build_trainer

    trainer, out = build_trainer(tmp_outdir, num_batches=120)
    trainer.write_stats(trainer.compute_stats())
    trainer.save()  # queued artifact write

    def boom():
        raise RuntimeError("device lost")

    trainer.train_distribution = boom  # linear_gaussian ⇒ distribution mode
    with pytest.raises(RuntimeError, match="device lost"):
        trainer.train()
    # the pre-crash save is durable without any drain by the caller
    files = set(os.listdir(out))
    assert "losses.npz" in files and "model.pkl" in files
    assert any(f.startswith("ckpt") for f in files)


@pytest.mark.slow  # full grid train e2e (~45 s on 1 core)
def test_grid_train_returns_with_artifacts_durable(tmp_outdir):
    """train() drains the writer: every in-loop artifact (figures included)
    is on disk by the time it returns."""
    cfg = make_cfg(tmp_outdir, num_batches=120, n_print=60, n_plot=60)
    trainer = GridTrainer(cfg, seeds=[2, 3])
    outs = [make_output_dir(f"dur_seed{s}", True, cfg, data_dir=tmp_outdir)
            for s in (2, 3)]
    trainer.train(outs)
    for out in outs:
        files = set(os.listdir(out))
        assert "losses.npz" in files and "model.pkl" in files
        assert any(f.startswith("ckpt") for f in files)
        assert any(f.startswith("output_") and f.endswith(".png")
                   for f in files)
