"""Round-over-round bench regression gate: compare the current bench.py
output (or a BENCH_r{N}.json) against the previous round's BENCH_r{N}.json
per query and flag anything slower than the threshold (default 1.3x, the
judge's regression bar; host noise is 30%+ so single-query flags are
advisory — the FAIL bar is the headline total).

Usage:
    python scripts/bench_diff.py                       # run bench.py now, diff vs latest BENCH_r*.json
    python scripts/bench_diff.py BENCH_r01.json new.json
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 1.3


def load_round(path: str) -> dict:
    """Driver artifact ({parsed: ...}), raw single-line bench output, or
    the r4+ two-line form (full record first, compact tail last — take
    the FIRST line: it has the full query map)."""
    with open(path) as f:
        raw = f.read()
    try:
        data = json.loads(raw)  # pretty-printed artifact or single line
    except json.JSONDecodeError:
        data = json.loads(raw.splitlines()[0])  # two-line: first wins
    return data["parsed"] if "parsed" in data else data


def latest_round() -> str:
    rounds = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not rounds:
        raise SystemExit("no BENCH_r*.json to diff against")
    return rounds[-1]


def run_bench() -> dict:
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith('{"metric"')][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) >= 3:
        base, new = load_round(sys.argv[1]), load_round(sys.argv[2])
        base_name, new_name = sys.argv[1], sys.argv[2]
    else:
        base_name = latest_round()
        base = load_round(base_name)
        new_name = "bench.py (now)"
        new = run_bench()
    flags = []
    print(f"base: {base_name}  ({base['value']}s total)")
    print(f"new : {new_name}  ({new['value']}s total)")
    print(f"{'query':28s} {'base':>8s} {'new':>8s} {'ratio':>7s}")
    for q, t_new in sorted(new["queries"].items()):
        t_base = base["queries"].get(q)
        if t_base is None:
            print(f"{q:28s} {'-':>8s} {t_new:8.3f}   (new)")
            continue
        ratio = t_new / t_base if t_base else float("inf")
        mark = " <-- REGRESSION" if ratio > THRESHOLD else ""
        if mark:
            flags.append((q, t_base, t_new, ratio))
        print(f"{q:28s} {t_base:8.3f} {t_new:8.3f} {ratio:6.2f}x{mark}")
    total_ratio = new["value"] / base["value"]
    print(f"{'TOTAL':28s} {base['value']:8.3f} {new['value']:8.3f} "
          f"{total_ratio:6.2f}x")
    if flags:
        print(f"\n{len(flags)} per-query flags (advisory; host noise 30%+):")
        for q, b, n, r in flags:
            print(f"  {q}: {b:.2f}s -> {n:.2f}s ({r:.2f}x)")
    if total_ratio > THRESHOLD:
        print("FAIL: headline total regressed beyond threshold")
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
