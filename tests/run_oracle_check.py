"""CLI: run every registered query against its DuckDB oracle and report.

Usage: python tests/run_oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from i2o_transform_spark.queries import ORACLES, QUERIES  # noqa: E402
from i2o_transform_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, run_oracle  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in ORACLES:
                pdf = run_oracle(sf_dir, ORACLES[name])
                ok, detail = compare(df, pdf)
            else:
                n = df.count()
                ok, detail = True, f"rows-only ({n} rows, no oracle)"
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION: {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "PASS" if ok else "FAIL"
        print(f"{status:4s} {name:28s} {dt:6.2f}s  {detail[:400]}")
        if not ok:
            failures.append(name)
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} pass")
    if failures:
        print("failures:", ", ".join(failures))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
