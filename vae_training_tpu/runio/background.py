"""Background host-artifact writer for grid/sweep runs.

At every plot cadence a grid run writes, PER ROW, a matplotlib figure
(~140 ms), a full checkpoint (~160 ms), model.pkl and losses.npz — ~320 ms
of pure host IO per row-event, which for an 18-row sweep family was ~37 s
of an 88 s one-launch wall time (docs/architecture.md, sweep accounting).
None of it is on the training-math critical path: the tensors are fetched
to host first, so the writes can overlap the next train chunks running on
the device.

One process-wide worker thread (FIFO queue) does all of it:

  - ONE thread, not a pool: ``plot_batch`` uses matplotlib's pyplot API,
    which is not safe to drive from multiple threads. Confining every
    in-loop figure write to this single thread keeps pyplot effectively
    single-threaded (the solo ``Trainer``'s in-loop plots/saves ride this
    writer too; its end-of-run plotting happens on the main thread only
    after ``train``/``save(final=True)`` have drained the queue, so the
    two never drive pyplot concurrently).
  - FIFO order preserves the per-directory write sequence (losses.npz →
    model.pkl → checkpoint), so the checkpoint step-ordering guard in
    ``runio/checkpoint.py`` sees monotone steps exactly as before.
  - Callers snapshot mutable state at submit time (``StatsRecorder.
    to_state()`` — shallow list copies; appended entries are immutable),
    so training can keep appending while the write is in flight.

Failure semantics match the async checkpoint machinery: the first worker
exception is stored and re-raised (chained) on the next ``submit`` or at
``drain`` — a failed artifact write fails the run loudly, never silently.

Durability contract: ``drain()`` at the end of every grid/sweep ``train``
and inside ``final=True`` saves means "train returned ⇒ all in-loop
artifacts are durable". A preemption mid-flight can lose the newest
enqueued event's files, falling back to the previous event's checkpoint —
the same exposure as the async off-cadence checkpoints, and resume from
any event checkpoint reproduces identical artifacts (tests/
test_preemption.py).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable


class ArtifactWriter:
    def __init__(self):
        # Bounded: each queued job closes over a full host snapshot of a
        # run's state (params+opt+history). Epoch-mode loops can produce
        # jobs ~60× faster than ~175 ms writes drain, so an unbounded
        # queue is an unbounded pile of state copies; at the bound,
        # ``submit`` blocks — natural backpressure once the writes, not
        # the device, are the true bottleneck.
        self._q: queue.Queue = queue.Queue(maxsize=8)
        self._err: BaseException | None = None
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None

    def _ensure_thread(self) -> None:
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(
                target=self._run, daemon=True, name="artifact-writer"
            )
            self._thread.start()

    def _run(self) -> None:
        while True:
            job = self._q.get()
            try:
                job()
            except BaseException as e:  # surfaced on submit/drain
                with self._lock:
                    if self._err is None:
                        self._err = e
            finally:
                self._q.task_done()

    def submit(self, job: Callable[[], None]) -> None:
        """Enqueue a host-IO closure; raises if a previous job failed."""
        self._raise_if_failed()
        self._ensure_thread()
        self._q.put(job)

    def drain(self) -> None:
        """Block until every enqueued job finished; re-raise any failure."""
        self._q.join()
        self._raise_if_failed()

    def drain_quietly(self) -> None:
        """Drain without raising — for finally-style flushes where an
        in-flight exception must not be masked. Pending jobs still run
        (e.g. the last durable checkpoint before a supervised retry).
        A stored write failure is LOGGED before being discarded: this is
        often the crash path's last chance to tell the user an artifact
        (possibly the checkpoint a retry will resume from) never hit disk."""
        try:
            self.drain()
        except Exception:
            import sys
            import traceback

            print("[artifact-writer] background write failed during "
                  "crash-path drain (not masking the in-flight error):",
                  file=sys.stderr, flush=True)
            traceback.print_exc(file=sys.stderr)

    def _raise_if_failed(self) -> None:
        with self._lock:
            err, self._err = self._err, None
        if err is not None:
            raise RuntimeError(
                "background artifact write failed (first failure chained)"
            ) from err


_writer: ArtifactWriter | None = None


def get_artifact_writer() -> ArtifactWriter:
    """The process-wide writer (one thread for all grid groups in a sweep)."""
    global _writer
    if _writer is None:
        _writer = ArtifactWriter()
    return _writer
