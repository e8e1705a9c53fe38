#!/usr/bin/env python
"""Digest a tools/tpu_measurements.sh log into a markdown table.

    python tools/digest_measurements.py [/tmp/tpu_measure.log]

Each sweep entry is an `=== <command> ===` header followed by the
command's output (one bench.py JSON line, or a microbench's own rows)
and `--- exit=N ---`. This prints a | command | metric | value | table
for the JSON lines and flags failures — paste-ready for BENCH_NOTES.
"""

from __future__ import annotations

import json
import re
import sys


def digest(text: str) -> list[dict]:
    rows = []
    blocks = re.split(r"^=== (.+?) ===$", text, flags=re.M)
    # blocks: [preamble, cmd1, body1, cmd2, body2, ...]
    for cmd, body in zip(blocks[1::2], blocks[2::2]):
        exit_m = re.search(r"^--- exit=(\d+) ---$", body, flags=re.M)
        row = {"cmd": cmd.strip(),
               "exit": int(exit_m.group(1)) if exit_m else None}
        for line in body.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    row.update(json.loads(line))
                except json.JSONDecodeError:
                    pass
        rows.append(row)
    return rows


def _short(cmd: str) -> str:
    """Compress 'NERF_TPU_X=1 ... python bench.py' to its distinguishing
    knobs."""
    knobs = re.findall(r"NERF_TPU_(\w+)=(\S+)", cmd)
    skip = {"BENCH_ITERS", "BENCH_SKIP_PROBE"}
    parts = [f"{k.replace('BENCH_', '').lower()}={v}" for k, v in knobs
             if k not in skip]
    tool = "bench" if "bench.py" in cmd else cmd.split()[-1]
    return f"{tool} {' '.join(parts)}".strip()


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_measure.log"
    with open(path) as f:
        rows = digest(f.read())
    if not rows:
        print(f"no sweep entries found in {path}")
        return
    print("| run | metric | value | vs_baseline | platform | exit |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {_short(r['cmd'])} "
              f"| {r.get('metric', '—')} "
              f"| {r.get('value', '—')} {r.get('unit', '')} "
              f"| {r.get('vs_baseline', '—')} "
              f"| {r.get('platform', '—')} "
              f"| {r['exit']} |")
    bad = [r for r in rows if r["exit"] not in (0, None)]
    if bad:
        print(f"\n{len(bad)} run(s) FAILED — see the log for their output.")


if __name__ == "__main__":
    main()
