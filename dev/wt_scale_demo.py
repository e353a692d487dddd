"""Web-table extraction at crawl scale + two-parallelism scaling.

Synthesizes N crawl pages EACH carrying one 20-row x 4-column listing
table (~1.5 KB of HTML with surrounding markup), runs the JVM-only
walker (sources/htmltable.extract_tables -> tables_to_attr_values), and
counts attribute-value pairs — the throughput record for the web-tables
front door, run at two parallelism levels (local[N] vs local[4N]) on
the same input for the north-rule scaling-efficiency evidence (a real
cluster is not available in this sandbox; cores stand in for
executors).

Unlike the structured-data trio (Python walkers in mapInPandas), this
path never leaves the JVM — regexp_extract_all + posexplode inside
whole-stage codegen — so it doubles as the measured case for keeping
walkers JVM-side when the grammar allows.

Protocol: the repo's standard (dev/sd_scale_demo.py) — each level in a
CHILD process pinned to exactly N CPUs via ``taskset``, levels
interleaved per repeat, efficiency from best-of throughput.  Cell and
pair counts are closed-form asserted (21 rows x 4 cols per page).

Run: python dev/wt_scale_demo.py [n_pages]   (env WT_REPEATS, default 3)
Prints one JSON line: WTSCALE {...}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from i2o_transform_spark.session import get_spark  # noqa: E402

ROWS, COLS = 20, 4


def _pages(spark, n: int):
    k = F.col("id").cast("string")
    row = F.transform(
        F.sequence(F.lit(0), F.lit(ROWS - 1)),
        lambda r: F.concat(
            F.lit("<tr><td>E"), k, F.lit("-"), r.cast("string"),
            F.lit("</td><td>name &amp; co "), r.cast("string"),
            F.lit("</td><td>2024-01-"),
            F.lpad((r % 28 + 1).cast("string"), 2, "0"),
            F.lit("</td><td><b>"), ((r * 7) % 100).cast("string"),
            F.lit(".50</b></td></tr>"),
        ),
    )
    return spark.range(n).select(
        F.concat(F.lit("https://crawl.example/t/"), k).alias("url"),
        F.concat(
            F.lit("<html><head><title>listing</title></head><body>"
                  "<p>intro text, no data</p>"
                  '<table class="listing">'
                  "<tr><th>id</th><th>name</th><th>date</th>"
                  "<th>price</th></tr>"),
            F.array_join(row, ""),
            F.lit("</table><p>footer</p></body></html>"),
        ).alias("html"),
    )


def _run(master: str, n_pages: int, cores: int) -> dict:
    from i2o_transform_spark.sources.htmltable import (
        extract_attr_values,
        extract_tables,
        tables_to_attr_values,
    )

    spark = get_spark(f"wt-scale-{cores}", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    pages = (
        _pages(spark, n_pages)
        .repartition(cores * 4)
        .localCheckpoint(eager=True)
    )
    n = pages.count()
    single_pass = os.environ.get("WT_SINGLE_PASS", "1") == "1"
    # bench.py's methodology: run 1 pays plan compile + whole-stage-codegen
    # JIT (a per-plan FIXED cost a long-running cluster amortizes to zero),
    # runs 2-3 are steady state.  Reporting the cold run as the level's
    # throughput would tax the fast configuration disproportionately (the
    # same ~2 s compile against a 4x shorter wall) and understate scaling —
    # measured 0.64 cold vs 0.85 steady on the same boot.  Both are
    # reported; efficiency uses steady.
    runs = []
    for _ in range(3):
        t0 = time.time()
        if single_pass:
            pairs = extract_attr_values(pages, keep=["url"]).count()
        else:
            cells = extract_tables(pages, keep=["url"])
            pairs = tables_to_attr_values(cells, keep=["url"]).count()
        runs.append(time.time() - t0)
        assert pairs == n * ROWS * COLS, (pairs, n)
    wall = min(runs[1:])
    spark.stop()
    return {
        "pages": n,
        "attr_value_pairs": pairs,
        "sec": round(wall, 2),
        "cold_sec": round(runs[0], 2),
        "pages_per_s": round(n / wall),
        "cold_pages_per_s": round(n / runs[0]),
        "pairs_per_s": round(pairs / wall),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        cores, n_pages = int(sys.argv[2]), int(sys.argv[3])
        res = _run(f"local[{cores}]", n_pages, cores)
        print("CHILD " + json.dumps(res))
        return
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    levels = (4, 16)
    repeats = int(os.environ.get("WT_REPEATS", "3"))
    have_taskset = shutil.which("taskset") is not None
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    for _ in range(repeats):
        for cores in levels:
            cmd = (
                ["taskset", "-c", f"0-{cores - 1}"] if have_taskset else []
            ) + [sys.executable, os.path.abspath(__file__), "--child",
                 str(cores), str(n_pages)]
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))),
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("CHILD ")][-1]
            res = json.loads(line[6:])
            runs[cores].append(res)
            print(f"local[{cores}]: {res}", flush=True)
    small, big = levels
    best = {c: max(r["pages_per_s"] for r in runs[c]) for c in levels}
    out = {
        "n_pages": n_pages,
        "path": ("single_pass" if os.environ.get("WT_SINGLE_PASS", "1")
                 == "1" else "join"),
        "levels": list(levels),
        "pages_per_s": {str(c): [r["pages_per_s"] for r in runs[c]]
                        for c in levels},
        "best_pages_per_s": best,
        "scaling_efficiency": round(
            (best[big] / best[small]) / (big / small), 3
        ),
    }
    print("WTSCALE " + json.dumps(out))


if __name__ == "__main__":
    main()
