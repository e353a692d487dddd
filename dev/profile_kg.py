"""Per-stage scaling profiler: find which KG stage does not scale 8->32.

Usage: python dev/profile_kg.py --cpus 8 --n-pages 500000 --pages-dir /tmp/kgprof
Each invocation is one fresh JVM at one parallelism level; prints per-stage
wall times as one JSON line prefixed PROF.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="8")
    ap.add_argument("--n-pages", type=int, default=500000)
    ap.add_argument("--pages-dir", default="/tmp/kgprof")
    ap.add_argument("--mem", default=None)
    ap.add_argument("--gc", default=None)
    ap.add_argument("--repartition-sents", type=int, default=0)
    ap.add_argument("--only-mentions", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from i2o_transform_spark.datagen import generate
    from i2o_transform_spark.plans import kg as kgp
    from i2o_transform_spark.session import get_spark

    shuffle = max(32, int(args.cpus) * 4)
    extra = {"spark.sql.shuffle.partitions": str(shuffle)}
    if args.mem:
        extra["spark.driver.memory"] = args.mem
    if args.gc == "g1":
        extra["spark.driver.extraJavaOptions"] = "-XX:+UseG1GC -verbose:gc"
    elif args.gc == "parallel":
        extra["spark.driver.extraJavaOptions"] = "-XX:+UseParallelGC -verbose:gc"
    elif args.gc:
        extra["spark.driver.extraJavaOptions"] = args.gc
    spark = get_spark(
        "prof",
        master=f"local[{args.cpus}]",
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    pages_path = os.path.join(args.pages_dir, "pages")
    d = generate(spark, args.n_pages)
    if not os.path.exists(pages_path):
        os.makedirs(args.pages_dir, exist_ok=True)
        n_files = max(64, min(512, args.n_pages // 2000))
        d["pages"].repartition(n_files).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    t: dict[str, float] = {}

    def clock(name):
        t0 = time.time()

        def done():
            v = round(time.time() - t0, 3)
            t[name] = min(t.get(name, 1e9), v)

        return done

    # warmup python workers at FULL parallelism (limit(2000) spawns only 1-2
    # workers; the real stage then pays 32 pandas imports inside the timing)
    kgp.extract_text(pages.limit(20000).repartition(int(args.cpus))).count()

    n = 0
    for _rep in range(args.repeats):
        done = clock("crosswalk+canon")
        cw = kgp.compile_crosswalk(d["surface_vocab"], d["concept"], d["concept_rel"])
        cw = cw.persist()
        cw.count()
        cm = kgp.canonicalize_concepts(cw).persist()
        cm.count()
        done()

        done = clock("extract+split+persist")
        sents = kgp.split_sentences(
            kgp.extract_text(pages).where(F.col("lang") == "en")
        )
        if args.repartition_sents:
            sents = sents.repartition(args.repartition_sents)
        sents = sents.persist()
        sents.count()
        done()

        done = clock("detect_mentions")
        mentions = kgp.detect_mentions(sents, cw).persist()
        mentions.count()
        done()

        if not args.only_mentions:
            done = clock("extract_qualifiers")
            quals = kgp.extract_qualifiers(sents, d["modifier_config"]).persist()
            quals.count()
            done()

            done = clock("assemble")
            asm = kgp.assemble_triples(mentions, quals).persist()
            asm.count()
            done()

            done = clock("link_and_emit")
            triples = kgp.link_and_emit(asm, cw, cm)
            n = triples.count()
            done()
            asm.unpersist()
            quals.unpersist()
        sents.unpersist()
        mentions.unpersist()
        cw.unpersist()
        cm.unpersist()

    t["total"] = round(sum(t.values()), 3)
    print("PROF " + json.dumps({"cpus": args.cpus, "n_pages": args.n_pages, "triples": n, "stages": t}))
    spark.stop()


if __name__ == "__main__":
    main()
