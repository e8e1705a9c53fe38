"""The bench's headline must survive an external watchdog (VERDICT r3 #1).

Round 3's driver run was killed mid-suite (rc=124) and the machine-parsed
"last JSON line" was a mid-suite family row — a 6x phantom regression in
the round record. bench.py now prints the headline FIRST and re-emits it
after every suite row, so the last complete JSON line is the headline no
matter where a kill lands. This test runs the real bench.py on CPU with a
tiny protocol, kills it mid-suite, and asserts the parse the driver does
still yields the headline.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _parse_last_json(stdout: str):
    for ln in reversed(stdout.splitlines()):
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue  # a partially-written line (the kill mid-print)
    return None


@pytest.mark.slow
def test_headline_survives_midsuite_kill(tmp_path):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "NERF_TPU_PLATFORM": "cpu",
        "NERF_TPU_BENCH_SUITE": "1",     # force the suite despite knobs
        # one cheap suite row (it inherits the tiny knobs below)
        "NERF_TPU_BENCH_SUITE_ROWS": "train_nerf_dp8cpu",
        # tiny protocol so the CPU headline lands in seconds
        "NERF_TPU_BENCH_RAYS": "64",
        "NERF_TPU_BENCH_SAMPLES": "8",
        "NERF_TPU_BENCH_ITERS": "1",
        "NERF_TPU_BENCH_SCAN": "2",
    })
    proc = subprocess.Popen(
        [sys.executable, BENCH], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        bufsize=1,
    )
    lines = []
    deadline = time.time() + 600
    try:
        # read until the headline printed, a suite row followed it, and the
        # post-row RE-EMITTED headline landed — i.e. genuinely mid-suite
        saw_headline = saw_row = saw_reemit = False
        while time.time() < deadline:
            ln = proc.stdout.readline()
            if not ln:
                break
            lines.append(ln)
            if ln.startswith("{"):
                row = json.loads(ln)
                if row.get("headline"):
                    saw_reemit = True
                elif row.get("metric") == "rays_per_sec_per_chip" and \
                        row.get("config") == "train_nerf":
                    saw_headline = True
                elif saw_headline:
                    saw_row = True
            if saw_reemit:
                break
        assert saw_headline, f"headline never printed: {lines}"
        assert saw_row and saw_reemit, f"no row+re-emit before kill: {lines}"
        # the watchdog strikes mid-suite
        proc.send_signal(signal.SIGKILL)
    finally:
        try:
            rest, _ = proc.communicate(timeout=60)
            lines.append(rest)
        except Exception:
            proc.kill()

    parsed = _parse_last_json("".join(lines))
    assert parsed is not None
    # what the driver records must be the headline, never a family row
    assert parsed["metric"] == "rays_per_sec_per_chip", parsed
    assert parsed.get("config", "").startswith("train_nerf"), parsed
    assert "error" not in parsed, parsed
