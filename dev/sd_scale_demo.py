"""Structured-data ingest at crawl scale + two-parallelism scaling.

Synthesizes N crawl pages EACH carrying all three schema.org syntaxes
(an ld+json script, a microdata itemscope, RDFa markup — the
sd_unified_ingest fixture shape, ~1.4 KB of HTML per page), then runs
the full trio extraction (sources/jsonld + microdata + rdfa, union) and
counts triples.  The two walkers are Python-side (stdlib html.parser in
mapInPandas) — the honest hot path for this stage — so this demo is the
throughput record for the crawl front door, and it runs the SAME job at
two parallelism levels (local[N] and local[4N]) on the same input for
the north-rule scaling-efficiency evidence (a real cluster is not
available in this sandbox; cores stand in for executors).

Protocol (the repo's established scaling method, dev/fuzzy_truth_scale
and bench.py --scaling): each level runs in a CHILD process pinned to
exactly N CPUs with ``taskset -c 0-(N-1)``, levels interleave inside
each repeat round (cancels machine-state drift), efficiency is computed
from best-of throughput.  Run on an otherwise idle box.

Run: python dev/sd_scale_demo.py [n_pages]   (env SD_REPEATS, default 3)
Prints one JSON line: SDSCALE {...}
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


def _pages(spark, n: int):
    k = F.col("id").cast("string")
    sid = F.concat(F.lit("http://ex.org/cust/"), k)
    return spark.range(n).select(
        F.concat(F.lit("https://crawl.example/u/"), k).alias("url"),
        F.concat(
            F.lit('<html><head><script type="application/ld+json">'
                  '{"@context": "https://schema.org", "@id": "'),
            sid, F.lit('", "@type": "Person", "name": "Entity '),
            k, F.lit('", "memberOf": "LVL'),
            (F.col("id") % 3).cast("string"),
            F.lit('"}</script></head><body lang="en" '
                  'vocab="https://schema.org/">'
                  '<span property="name">Crawl '), k, F.lit("</span>"),
            F.lit('<div itemscope itemtype="https://schema.org/Person" '
                  'itemid="'), sid, F.lit('">'
                  '<meta itemprop="identifier" content="C'), k,
            F.lit('"><span itemprop="jobTitle">J'),
            (F.col("id") % 5).cast("string"), F.lit("</span>"),
            F.lit('<time itemprop="birthDate" datetime="1970-01-'),
            F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0"),
            F.lit('">b</time>'),
            F.lit('<span itemprop="address" itemscope '
                  'itemtype="https://schema.org/PostalAddress">'
                  '<span itemprop="addressCountry" lang="fr">N'),
            (F.col("id") % 25).cast("string"),
            F.lit("</span></span></div>"),
            F.lit('<p resource="'), sid,
            F.lit('"><span property="award">A'),
            (F.col("id") % 11).cast("string"),
            F.lit("</span></p></body></html>"),
        ).alias("html"),
    )


def _run(master: str, n_pages: int, cores: int,
         fused: bool = True) -> dict:
    from i2o_transform_spark.sources.jsonld import (
        extract_jsonld_scripts,
        jsonld_to_triples,
    )
    from i2o_transform_spark.sources.microdata import microdata_to_triples
    from i2o_transform_spark.sources.rdfa import rdfa_to_triples
    from i2o_transform_spark.sources.unified import (
        structured_data_to_triples,
    )

    spark = get_spark(f"sd-scale-{cores}", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    pages = (
        _pages(spark, n_pages)
        .repartition(cores * 4)
        .localCheckpoint(eager=True)
    )
    n = pages.count()
    t0 = time.time()
    if fused:
        total = structured_data_to_triples(pages).count()
    else:
        jl = jsonld_to_triples(extract_jsonld_scripts(pages))
        md = microdata_to_triples(pages)
        rd = rdfa_to_triples(pages)
        pick = ["doc_key", "subj", "pred", "obj"]
        total = (
            jl.select(*pick).unionByName(md.select(*pick))
            .unionByName(rd.select(*pick)).count()
        )
    wall = time.time() - t0
    spark.stop()
    return {
        "pages": n,
        "triples": total,
        "sec": round(wall, 2),
        "pages_per_s": round(n / wall),
        "triples_per_s": round(total / wall),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        cores, n_pages = int(sys.argv[2]), int(sys.argv[3])
        fused = os.environ.get("SD_FUSED", "1") == "1"
        res = _run(f"local[{cores}]", n_pages, cores, fused=fused)
        print("CHILD " + json.dumps(res))
        return
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    levels = (4, 16)
    repeats = int(os.environ.get("SD_REPEATS", "3"))
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
        "levels": list(levels),
        "pages_per_s": {str(c): [r["pages_per_s"] for r in runs[c]]
                        for c in levels},
        "best_pages_per_s": best,
        "triples_per_page": runs[big][0]["triples"] // n_pages,
        "scaling_efficiency": round(
            (best[big] / best[small]) / (big / small), 3
        ),
    }
    print("SDSCALE " + json.dumps(out))


if __name__ == "__main__":
    main()
