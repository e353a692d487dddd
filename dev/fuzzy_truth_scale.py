"""Scale + scaling-efficiency evidence for the round-3 operators:
fuzzy entity linking (operators/fuzzy.py) and truth discovery
(operators/truth.py).

Synthesizes deterministic inputs with Spark `range` expressions (no data
files), runs each operator pinned to N and 4N cores in fresh-JVM
subprocesses (the bench.py --scaling method), and prints throughput at both
plus efficiency (thr_4N / thr_N) / 4.

Usage:
  python dev/fuzzy_truth_scale.py                    # parent: both ops, 4 vs 16
  python dev/fuzzy_truth_scale.py --child fuzzy 16   # (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MENTIONS = int(os.environ.get("FTS_MENTIONS", 4_000_000))
N_DICT = 100_000
N_CLAIMS = int(os.environ.get("FTS_CLAIMS", 40_000_000))
N_SOURCES = 1_000


def _spark(cpus: str):
    from i2o_transform_spark.session import get_spark

    s = get_spark("fuzzy-truth-scale", master=f"local[{cpus}]")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _dictionary(spark):
    from pyspark.sql import functions as F

    return spark.range(N_DICT).select(
        F.col("id").alias("entity_id"),
        F.format_string("entity_%06d", F.col("id")).alias("entity_name"),
    )


def _mentions(spark):
    """Deterministic typo'd mentions: exact / one deletion / one append,
    entity chosen by a Knuth-hash of the mention id."""
    from pyspark.sql import functions as F

    eid = (F.col("id") * 2654435761) % N_DICT
    name = F.format_string("entity_%06d", eid)
    pos = (F.col("id") % F.length(name)).cast("int")
    mention = (
        F.when((F.col("id") % 3) == 0, name)
        .when(
            (F.col("id") % 3) == 1,
            F.concat(
                name.substr(F.lit(1), pos),
                name.substr(pos + 2, F.length(name)),
            ),
        )
        .otherwise(F.concat(name, F.lit("X")))
    )
    return spark.range(N_MENTIONS).select(
        F.col("id").alias("mention_id"), mention.alias("mention")
    )


def _claims(spark):
    """One claim per (source, subject); every 5th source lies on 2/3 of its
    claims with a value that never collides with the truth."""
    from pyspark.sql import functions as F

    src = F.col("id") % N_SOURCES
    subj = F.col("id") / F.lit(N_SOURCES)
    subj = F.floor(subj).cast("long")
    truth = subj % 7
    lie = ((src % 5) == 0) & ((F.col("id") % 3) < 2)
    obj = F.when(lie, (truth + 1 + src % 3) % 7 + 7).otherwise(truth)
    return spark.range(N_CLAIMS).select(
        src.alias("src"), subj.alias("subj"), obj.cast("long").alias("obj")
    )


def run_child(op: str, cpus: str) -> None:
    spark = _spark(cpus)
    if op == "fuzzy":
        from i2o_transform_spark.operators.fuzzy import fuzzy_link

        t0 = time.time()
        out = fuzzy_link(_mentions(spark), _dictionary(spark))
        n = out.count()
        dt = time.time() - t0
        print(json.dumps({"op": op, "cpus": cpus, "rows": n,
                          "items": N_MENTIONS, "sec": round(dt, 2),
                          "items_per_sec": round(N_MENTIONS / dt)}))
        assert n == N_MENTIONS, f"every planted mention must link, got {n}"
    elif op == "truth":
        from i2o_transform_spark.operators.truth import resolve_conflicts

        from pyspark.sql import functions as F

        t0 = time.time()
        res = resolve_conflicts(_claims(spark), ["subj"], "obj", "src", 2)
        row = res.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((res.obj >= 7).cast("long")).alias("wrong"),
        ).collect()[0]
        n, wrong = row.n, int(row.wrong)
        dt = time.time() - t0
        print(json.dumps({"op": op, "cpus": cpus, "rows": n, "wrong": wrong,
                          "items": N_CLAIMS, "sec": round(dt, 2),
                          "items_per_sec": round(N_CLAIMS / dt)}))
        assert wrong == 0, "weighted vote must reject every planted lie"
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        run_child(sys.argv[2], sys.argv[3])
        return
    levels = ("4", "16")
    have_taskset = shutil.which("taskset") is not None
    results: dict[str, dict[str, dict]] = {}
    ops = tuple(os.environ.get("FTS_OPS", "fuzzy,truth").split(","))
    repeats = int(os.environ.get("FTS_REPEATS", "3"))
    for op in ops:
        results[op] = {c: [] for c in levels}
        # interleaved repeats (the bench.py --scaling method): alternating
        # levels inside each round cancels slow drift in machine state
        for _ in range(repeats):
            for cpus in levels:
                cmd = (
                    ["taskset", "-c", f"0-{int(cpus) - 1}"]
                    if have_taskset else []
                ) + [sys.executable, os.path.abspath(__file__),
                     "--child", op, cpus]
                out = subprocess.run(
                    cmd, capture_output=True, text=True, check=True,
                    cwd=os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))),
                )
                line = [l for l in out.stdout.splitlines()
                        if l.startswith("{")][-1]
                results[op][cpus].append(json.loads(line))
                print(line, flush=True)
        small, large = levels
        factor = int(large) / int(small)
        best = {
            c: max(r["items_per_sec"] for r in results[op][c])
            for c in levels
        }
        eff = (best[large] / best[small]) / factor
        print(json.dumps({
            "op": op, "metric": f"scaling_{small}_to_{large}",
            "efficiency": round(eff, 3),
            "best_items_per_sec": best,
            "all_items_per_sec": {
                c: [r["items_per_sec"] for r in results[op][c]]
                for c in levels
            },
        }), flush=True)


if __name__ == "__main__":
    main()
