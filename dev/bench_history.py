"""Round-over-round bench history (VERDICT r01 #9).

Collects every BENCH_r*.json in the repo root (driver-recorded, one per
round) plus an optional fresh local run passed on stdin, and prints a
per-query markdown delta table so regressions are one diff away.

Usage:
    python dev/bench_history.py                       # table from artifacts
    python bench.py | python dev/bench_history.py -   # include a live run
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_rounds() -> dict[str, dict]:
    rounds: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        m = re.search(r"BENCH_(r\d+)\.json$", path)
        if not m:
            continue
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        parsed = data.get("parsed") if isinstance(data, dict) else None
        if parsed is None and isinstance(data, dict) and "queries" in data:
            parsed = data
        if parsed and "queries" in parsed:
            rounds[m.group(1)] = parsed
    return rounds


def main() -> int:
    rounds = _load_rounds()
    if len(sys.argv) > 1 and sys.argv[1] == "-":
        for line in sys.stdin:
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "queries" in parsed:
                    rounds["local"] = parsed
    if not rounds:
        print("no BENCH_r*.json artifacts found")
        return 1
    names = list(rounds)
    queries: list[str] = []
    for r in rounds.values():
        for q in r["queries"]:
            if q not in queries:
                queries.append(q)
    prev = names[-2] if len(names) > 1 else None
    last = names[-1]
    header = "| query | " + " | ".join(names) + " | delta |"
    print(header)
    print("|" + "---|" * (len(names) + 2))
    for q in queries:
        cells = []
        for n in names:
            v = rounds[n]["queries"].get(q)
            cells.append(f"{v:.3f}" if v is not None else "—")
        delta = "—"
        if prev is not None:
            a = rounds[prev]["queries"].get(q)
            b = rounds[last]["queries"].get(q)
            if a and b:
                delta = f"{(b - a) / a * 100:+.0f}%"
        print(f"| {q} | " + " | ".join(cells) + f" | {delta} |")
    tot = [f"{rounds[n].get('value', 0):.2f}" for n in names]
    print("| **total** | " + " | ".join(tot) + " | |")
    thr = [f"{rounds[n].get('kg_triples_per_sec', 0):,.0f}" for n in names]
    print("| kg triples/s | " + " | ".join(thr) + " | |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
