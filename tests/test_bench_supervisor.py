"""The bench.py supervisor: the driver captures the benchmark exactly once
per round, so a 1-in-10 axon init hang (CLAUDE.md) must be retried, a
healthy child must pass through untouched, and stdout must stay exactly
one JSON line."""

import json
import os
import subprocess
import sys
import textwrap

import pytest

import bench

# wall-clock child-process supervision tests (timeout sleeps dominate)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child_script(tmp_path, body):
    fn = os.path.join(tmp_path, "fake_child.py")
    with open(fn, "w") as f:
        f.write(textwrap.dedent(body))
    return [sys.executable, fn]


def test_healthy_child_passes_through(tmp_path, capfd):
    argv = child_script(
        tmp_path,
        """
        import sys
        print("devices: [FakeDevice(0)]", file=sys.stderr)
        print("working noise", file=sys.stderr)
        print('{"metric": "m", "value": 1.0}')
        """,
    )
    rc = bench.supervise(argv, init_timeout=30, total_timeout=60, attempts=2)
    out, err = capfd.readouterr()
    assert rc == 0
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1  # the one-JSON-line stdout contract survives
    assert json.loads(lines[0])["metric"] == "m"
    assert "devices:" in err  # child stderr forwarded live


def test_init_hang_is_terminated_and_retried(tmp_path, capfd, monkeypatch):
    """First start hangs before device init (no `devices:` marker); the
    supervisor must SIGTERM it and the retry must succeed."""
    monkeypatch.setenv("VAE_BENCH_RETRY_DELAY", "0")
    marker = os.path.join(tmp_path, "attempted_once")
    argv = child_script(
        tmp_path,
        f"""
        import os, sys, time
        if not os.path.exists({marker!r}):
            open({marker!r}, "w").close()
            time.sleep(600)   # axon init hang: no marker, no output
        print("devices: [FakeDevice(0)]", file=sys.stderr)
        print('{{"metric": "m", "value": 2.0}}')
        """,
    )
    # init_timeout must cover child startup under full-suite load (observed
    # >5 s) or the healthy RETRY gets classified as a hang too — flaky.
    rc = bench.supervise(argv, init_timeout=12, total_timeout=300, attempts=2)
    out, err = capfd.readouterr()
    assert rc == 0
    assert json.loads(out.strip())["value"] == 2.0
    assert "init hang" in err
    assert os.path.exists(marker)


def test_crashing_child_exhausts_attempts(tmp_path, capfd, monkeypatch):
    monkeypatch.setenv("VAE_BENCH_RETRY_DELAY", "0")
    argv = child_script(
        tmp_path,
        """
        import sys
        print("devices: [FakeDevice(0)]", file=sys.stderr)
        sys.exit(7)
        """,
    )
    rc = bench.supervise(argv, init_timeout=30, total_timeout=60, attempts=2)
    out, err = capfd.readouterr()
    assert rc == 7  # the child's real exit code, not a synthetic one
    assert out.strip() == ""  # no fake JSON on failure
    assert err.count("child exited 7") == 2


def test_usage_error_is_not_retried(tmp_path, capfd, monkeypatch):
    """argparse failures (exit 2) are deterministic; the supervisor must
    fail fast instead of re-printing the usage message three times."""
    monkeypatch.setenv("VAE_BENCH_RETRY_DELAY", "0")
    argv = child_script(
        tmp_path,
        """
        import sys
        print("usage: bench.py [--config ...]", file=sys.stderr)
        sys.exit(2)
        """,
    )
    rc = bench.supervise(argv, init_timeout=30, total_timeout=60, attempts=3)
    out, err = capfd.readouterr()
    assert rc == 2
    assert err.count("usage:") == 1  # one attempt, not three


def test_min_floor_violation_fails_fast_with_json(tmp_path, capfd,
                                                  monkeypatch):
    """--min regressions (exit 3) are a successful measurement below the
    floor: the supervisor must re-emit the JSON line, not retry, and
    propagate the nonzero exit."""
    monkeypatch.setenv("VAE_BENCH_RETRY_DELAY", "0")
    argv = child_script(
        tmp_path,
        """
        import sys
        print("devices: [FakeDevice(0)]", file=sys.stderr)
        print('{"metric": "m", "value": 3.0}')
        print("PERF REGRESSION: below floor", file=sys.stderr)
        sys.exit(3)
        """,
    )
    rc = bench.supervise(argv, init_timeout=30, total_timeout=60, attempts=3)
    out, err = capfd.readouterr()
    assert rc == 3
    assert json.loads(out.strip())["value"] == 3.0  # measurement preserved
    assert err.count("child exited 3") == 1  # no pointless retries


def test_non_json_stdout_passes_through(tmp_path, capfd):
    """--help-style output (multi-line, no JSON) must reach the caller
    verbatim, not be collapsed to its last line."""
    argv = child_script(
        tmp_path,
        """
        print("usage: bench.py [--config CONFIG]")
        print("")
        print("options:")
        print("  --config   which workload")
        """,
    )
    rc = bench.supervise(argv, init_timeout=30, total_timeout=60, attempts=1)
    out, _ = capfd.readouterr()
    assert rc == 0
    assert "usage: bench.py" in out and "--config   which workload" in out


def test_sigterm_deaf_child_is_sigkilled(tmp_path, capfd, monkeypatch):
    """A child that traps SIGTERM and keeps running must be SIGKILLed as
    the last resort (and with no retries pending, no grant cooldown)."""
    import time as time_mod

    from _supervise import run_supervised

    monkeypatch.setenv("VAE_TPU_KILL_COOLDOWN", "1")
    argv = child_script(
        tmp_path,
        """
        import signal, sys, time
        signal.signal(signal.SIGTERM, signal.SIG_IGN)
        print("devices: [FakeDevice(0)]", file=sys.stderr, flush=True)
        time.sleep(600)
        """,
    )
    start = time_mod.monotonic()
    outcome = run_supervised(
        argv, init_timeout=60, total_timeout=5,
        label="t", cooldown_after_kill=False)
    assert outcome.hung and not outcome.init_hang
    assert outcome.returncode is None
    # SIGTERM grace (30 s) + margins, nowhere near the 600 s sleep
    assert time_mod.monotonic() - start < 90
    err = capfd.readouterr().err
    assert "run exceeded" in err
    assert "cooling down" not in err  # cooldown_after_kill=False


def test_cli_child_mode_bypasses_supervision(tmp_path):
    """VAE_BENCH_CHILD=1 must run main() directly (no recursive
    re-exec) — probed via --help, which exits before touching devices."""
    env = dict(os.environ, VAE_BENCH_CHILD="1", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "bench.py", "--help"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=240,
    )
    assert res.returncode == 0
    assert "--config" in res.stdout
