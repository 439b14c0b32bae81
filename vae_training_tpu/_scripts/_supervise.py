"""Shared child-process supervisor for TPU entry points.

``bench.py`` (the driver's one-shot capture) and ``sweep.py --isolate``
both wrap their real work in a watched subprocess because ~1 in 10 process
starts hangs in axon PJRT init before ``jax.devices()`` returns, with zero
output (CLAUDE.md). Both need the same machinery — pipe reader threads, an
init deadline separate from the run deadline, SIGTERM-first termination
with the SIGKILL/device-grant cooldown — and it previously existed twice
with diverging init-detection semantics (the sweep copy keyed on "any
stdout", which a healthy ``run.py`` child doesn't produce until after its
first remote compiles). One implementation, parameterized by the init
marker, keeps the two from drifting.

Stdlib-only on purpose: the supervising parent must never import jax (the
whole point is to observe a child whose jax import may wedge).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
import time
from dataclasses import dataclass


@dataclass
class Outcome:
    """What happened to one supervised attempt."""

    returncode: int | None  # child's own exit code; None if we killed it
    hung: bool              # a deadline fired and we terminated the child
    init_hang: bool         # the deadline that fired was the init deadline
    stdout: str             # captured stdout ("" in forward mode)


def run_supervised(
    argv: list[str],
    *,
    init_timeout: float,
    total_timeout: float,
    env: dict | None = None,
    init_marker: str = "devices:",
    stdout_mode: str = "forward",  # "forward" | "capture"
    label: str = "supervisor",
    note: str = "",
    cooldown_after_kill: bool = True,
) -> Outcome:
    """Run ``argv`` once under supervision; never raises on child trouble.

    Liveness ("init seen") is ANY stdout line, or a stderr line containing
    ``init_marker`` (``run.py`` and the bench child both print a
    ``devices: [...]`` marker to stderr right after ``jax.devices()``
    returns). Until it is seen, ``init_timeout`` applies; afterwards only
    ``total_timeout`` does. stderr is always forwarded live; stdout is
    forwarded live (``"forward"``) or collected and returned
    (``"capture"`` — for callers with a stdout contract of their own, like
    bench.py's one-JSON-line rule).

    Termination discipline (both deadlines, and any parent exit path —
    the child must never be orphaned holding the device grant): SIGTERM,
    wait 30 s, then SIGKILL as a last resort. SIGKILLing a live TPU client
    wedges the grant for ~5 min, so when ``cooldown_after_kill`` (i.e. the
    caller will retry) the kill is followed by a ``VAE_TPU_KILL_COOLDOWN``
    (300 s) sleep so the retry doesn't inherit the wedge.
    """
    proc = subprocess.Popen(
        argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        env=env, text=True,
    )
    init_seen = threading.Event()
    captured: list[str] = []

    def read_stderr(stream=proc.stderr):
        for line in stream:
            if init_marker in line:
                init_seen.set()
            sys.stderr.write(line)
            sys.stderr.flush()

    def read_stdout(stream=proc.stdout):
        for line in stream:
            init_seen.set()  # any stdout ⇒ the child is past init
            if stdout_mode == "capture":
                captured.append(line)
            else:
                sys.stdout.write(line)
                sys.stdout.flush()

    readers = [
        threading.Thread(target=read_stderr, daemon=True),
        threading.Thread(target=read_stdout, daemon=True),
    ]
    for r in readers:
        r.start()
    start = time.monotonic()
    hung = init_hang = False
    try:
        while proc.poll() is None:
            elapsed = time.monotonic() - start
            if not init_seen.is_set() and elapsed > init_timeout:
                print(f"[{label}] no output after {init_timeout:.0f}s "
                      f"(init hang){note}; terminating",
                      file=sys.stderr, flush=True)
                hung = init_hang = True
                break
            if elapsed > total_timeout:
                print(f"[{label}] run exceeded {total_timeout:.0f}s"
                      f"{note}; terminating", file=sys.stderr, flush=True)
                hung = True
                break
            time.sleep(1.0)
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                if cooldown_after_kill:
                    cooldown = float(
                        os.environ.get("VAE_TPU_KILL_COOLDOWN", "300"))
                    print(f"[{label}] SIGKILLed a wedged child; cooling "
                          f"down {cooldown:.0f}s (grant release)",
                          file=sys.stderr, flush=True)
                    time.sleep(cooldown)
        for r in readers:
            r.join(timeout=30)
        proc.stdout.close()
        proc.stderr.close()
    return Outcome(
        returncode=None if hung else proc.returncode,
        hung=hung, init_hang=init_hang, stdout="".join(captured),
    )
