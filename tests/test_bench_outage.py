"""bench.py must survive a backend outage with a structured JSON record.

Round-2 lost its whole perf record to a relay outage (BENCH_r02.json rc=1,
bare traceback). These tests simulate the two observed failure modes of the
axon relay — fast init error and wedge (hang inside backend init) — and
assert bench.py exits 0 with a parseable one-line failure JSON.
"""

import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run_bench(env_extra, timeout=120):
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        # clean env: no axon sitecustomize, fast knobs for the retry loop
        "PYTHONPATH": str(ROOT),
        "BENCH_INIT_TIMEOUT": "3",
        "BENCH_INIT_RETRIES": "2",
        "BENCH_INIT_BACKOFF": "0",
    }
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )


def _parse_last_json(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert lines, "bench printed nothing"
    return json.loads(lines[-1])


def test_bench_fast_init_failure():
    """Unknown backend: probe subprocess errors immediately -> failure JSON."""
    r = _run_bench({"JAX_PLATFORMS": "bogus_backend"})
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _parse_last_json(r.stdout)
    assert "backend unavailable" in rec["error"]
    assert rec["value"] == 0.0 and rec["unit"] == "GDOF-steps/s"


def test_bench_wedged_backend_hang(tmp_path):
    """Relay wedge: backend init HANGS (client retry loop) instead of raising.
    Simulated with a sitecustomize that sleeps in `python -c` children (the
    probe) — the probe timeout must bound it and produce the failure JSON."""
    (tmp_path / "sitecustomize.py").write_text(
        "import sys, time\n"
        "if sys.argv and sys.argv[0] == '-c':\n"
        "    time.sleep(300)\n"
    )
    r = _run_bench(
        {"PYTHONPATH": f"{tmp_path}{os.pathsep}{ROOT}", "JAX_PLATFORMS": "cpu"}
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _parse_last_json(r.stdout)
    assert "backend unavailable" in rec["error"]
    assert "hang" in rec["error"]
