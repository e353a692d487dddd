"""Stage-DAG orchestrator: manifest-checkpointed, resumable, lineage-tracked.

Reference lifecycle analogue (SURVEY.md §3.1): `OMOPloader` runs a fixed
dependency-ordered DAG of INSERT-SELECTs with RAISERROR stage flags
(MSSQL/OMOPLoader.sql:1934-1988) over full-refresh tables (`OMOPclear`,
:1870-1890).  Here each stage is a pure DataFrame function whose output is
written once (idempotent overwrite); a manifest JSON records, per stage, a
fingerprint of (stage code version, params, upstream fingerprints) plus row
counts and wall time.  Re-running with an existing manifest skips every
stage whose fingerprint matches and whose output exists — the north_rule's
"resumable from checkpoint".

Lineage (i2oreport analogue, MSSQL/OMOPLoader.sql:511-515, 2085-2095): a
``lineage`` table with one row per (run, stage, output partition) and a
``metrics`` table with per-stage rows/entities/wall — both persisted next to
the outputs.

Run as a module for the CLI:
    python -m i2o_transform_spark.plans.runner --n-pages 2000 --out /tmp/kg
On a cluster the same file ships via spark-submit --py-files and the
``pages`` stage is replaced by the Iceberg scan.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from i2o_transform_spark.datagen import generate
from i2o_transform_spark.plans import kg

CODE_VERSION = "1"  # bump to invalidate every checkpoint


def _fingerprint(stage: str, params: dict, upstream: list[str]) -> str:
    payload = json.dumps(
        {"stage": stage, "v": CODE_VERSION, "params": params, "up": sorted(upstream)},
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class Runner:
    def __init__(self, spark: SparkSession, out_dir: str, params: dict | None = None):
        self.spark = spark
        self.out_dir = out_dir
        self.params = params or {}
        self.manifest_path = os.path.join(out_dir, "_manifest.json")
        self.manifest: dict[str, dict] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
        self.run_id = int(time.time() * 1000)
        self.lineage_rows: list[tuple] = []
        self.metrics_rows: list[tuple] = []
        self.executed: list[str] = []
        self.skipped: list[str] = []

    def _save_manifest(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        upstream: list[str] = (),
        entity_col: str | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume-skip) one stage; returns the stage output DF
        (always read back from the persisted table so downstream plans never
        recompute upstream work — the reference's temp-table materialization,
        MSSQL/OMOPLoader.sql:1011)."""
        up_fps = [self.manifest[u]["fingerprint"] for u in upstream]
        fp = _fingerprint(name, self.params, up_fps)
        path = os.path.join(self.out_dir, name)
        entry = self.manifest.get(name)
        if entry and entry.get("fingerprint") == fp and os.path.exists(path):
            self.skipped.append(name)
            return self.spark.read.parquet(path)

        t0 = time.time()
        df = fn()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        out = self.spark.read.parquet(path)

        # lineage: per-output-partition row counts (per-partition lineage rows
        # per north_rule); metrics: stage totals
        part_counts = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        rows = 0
        for r in part_counts:
            self.lineage_rows.append((self.run_id, name, int(r[0]), int(r[1])))
            rows += int(r[1])
        n_entities = (
            out.select(F.count_distinct(F.col(entity_col)).alias("n")).collect()[0][0]
            if entity_col and entity_col in out.columns
            else None
        )
        wall = time.time() - t0
        self.metrics_rows.append((self.run_id, name, rows, n_entities, round(wall, 3)))
        self.manifest[name] = {
            "fingerprint": fp,
            "rows": rows,
            "wall_s": round(wall, 3),
            "path": path,
        }
        self._save_manifest()
        self.executed.append(name)
        return out

    def finish(self) -> None:
        lineage = self.spark.createDataFrame(
            self.lineage_rows or [(self.run_id, "_empty", -1, 0)],
            "run_id long, stage string, partition_id int, rows long",
        )
        lineage.write.mode("append").parquet(os.path.join(self.out_dir, "_lineage"))
        metrics = self.spark.createDataFrame(
            self.metrics_rows or [(self.run_id, "_empty", 0, None, 0.0)],
            "run_id long, stage string, rows long, distinct_entities long, wall_s double",
        )
        metrics.write.mode("append").parquet(os.path.join(self.out_dir, "_metrics"))


def run_pipeline(
    spark: SparkSession,
    out_dir: str,
    n_pages: int = 2000,
    seed: int = 42,
    broadcast_vocab: bool = True,
    fused: bool = True,
    stop_after: str | None = None,
    disambiguate: bool = False,
    web_extras: bool = False,
) -> dict[str, DataFrame]:
    """Full KG pipeline over synthesized pages (tests/bench) — on a cluster
    the pages stage is the Iceberg scan instead.  ``stop_after`` aborts the
    run after the named stage (kill-and-resume testing).

    ``disambiguate`` turns on embedding entity-link scoring: datagen plants
    the ambiguous surface + cue phrases, assembly emits the sentence context
    embedding, and link_and_emit resolves entity surfaces by argmax cosine
    against the entity_embeddings stage instead of 1->many fan-out.

    ``web_extras`` adds the web-source families to the DAG (the r04
    endurance ask): pages enriched with deterministic structured-data
    blocks (datagen.enrich_pages_web), then the fused JSON-LD/Microdata/
    RDFa trio (ONE Arrow pass), the single-pass web-table walker, and the
    hash term dictionary + encoded-triples projection — each a lineage-
    carrying checkpointed stage like the rest of the DAG."""
    params = {
        "n_pages": n_pages,
        "seed": seed,
        "broadcast_vocab": broadcast_vocab,
        "disambiguate": disambiguate,
    }
    r = Runner(spark, out_dir, params)
    d = generate(spark, n_pages, seed, with_ambiguity=disambiguate)
    ctx_dim = kg.CTX_DIM if disambiguate else None

    outputs: dict[str, DataFrame] = {}

    def _run(name, fn, **kw):
        outputs[name] = r.stage(name, fn, **kw)
        if stop_after == name:
            r.finish()
            raise _StopRun(name)
        return outputs[name]

    try:
        pages = _run("pages", lambda: d["pages"], entity_col="url")
        vocab = _run("surface_vocab", lambda: d["surface_vocab"])
        concept = _run("concept", lambda: d["concept"])
        rel = _run("concept_rel", lambda: d["concept_rel"])
        modcfg = _run("modifier_config", lambda: d["modifier_config"])

        crosswalk = _run(
            "crosswalk",
            lambda: kg.compile_crosswalk(vocab, concept, rel),
            upstream=["surface_vocab", "concept", "concept_rel"],
            entity_col="concept_id",
        )
        canon_map = _run(
            "canon_map",
            lambda: kg.canonicalize_concepts(crosswalk),
            upstream=["crosswalk"],
            entity_col="canon_id",
        )
        extracted = _run(
            "extracted",
            lambda: kg.extract_text(pages),
            upstream=["pages"],
            entity_col="url",
        )
        _run(
            "extraction_validation",
            lambda: kg.validation_report(pages, extracted),
            upstream=["pages", "extracted"],
        )
        if fused and broadcast_vocab:
            # the fused/broadcast paths hard-require a broadcast-sized vocab
            # (plans/kg.MAX_BROADCAST_VOCAB); past the threshold, auto-switch
            # to the salted modular path instead of failing mid-pipeline
            n_vocab = crosswalk.select("surface_form").distinct().count()
            if n_vocab > kg.MAX_BROADCAST_VOCAB:
                fused = False
                broadcast_vocab = False
        ent_emb = None
        if fused and broadcast_vocab:
            # fully-fused narrow path (extract_and_assemble): html -> assembled
            # rows in one Arrow stage, zero shuffles, one materialization.
            # Reads the raw pages table (not the extracted stage) — the
            # extracted stage still exists for the byte-identity validation.
            # With disambiguate the entity-link election ALSO runs in this
            # kernel (entity_candidates=): ctx never exists as a column, the
            # assembled stage lands with elected subj_id/obj_id.
            if disambiguate:
                ent_emb = _run(
                    "entity_embeddings",
                    lambda: d["entity_embeddings"],
                    entity_col="concept_id",
                )
            assembled = _run(
                "assembled",
                lambda: kg.extract_and_assemble(
                    pages.where(F.col("lang") == "en"), crosswalk, modcfg,
                    ctx_dim=ctx_dim,
                    entity_candidates=(
                        kg.entity_candidate_frame(crosswalk, canon_map, ent_emb)
                        if disambiguate else None
                    ),
                ),
                upstream=["pages", "crosswalk", "modifier_config"]
                + (["entity_embeddings", "canon_map"] if disambiguate else []),
                entity_col="url",
            )
        else:
            mentions = _run(
                "mentions",
                lambda: kg.detect_mentions(
                    kg.split_sentences(extracted.where(F.col("lang") == "en")),
                    crosswalk,
                    broadcast_vocab=broadcast_vocab,
                ),
                upstream=["extracted", "crosswalk"],
                entity_col="url",
            )
            qualifiers = _run(
                "qualifiers",
                lambda: kg.extract_qualifiers(
                    kg.split_sentences(extracted.where(F.col("lang") == "en")), modcfg
                ),
                upstream=["extracted", "modifier_config"],
                entity_col="url",
            )
            kinds = tuple(r.kind for r in modcfg.select("kind").collect())
            assembled = _run(
                "assembled",
                lambda: kg.assemble_triples(mentions, qualifiers, kinds),
                upstream=["mentions", "qualifiers"],
                entity_col="url",
            )
        ctx_frame = None
        if disambiguate and ent_emb is None:
            ent_emb = _run(
                "entity_embeddings",
                lambda: d["entity_embeddings"],
                entity_col="concept_id",
            )
            if "ctx" not in assembled.columns:
                # modular path: the context embedding is its own narrow
                # stage over the sentence frame (fused assembly emits it
                # in-line instead)
                from i2o_transform_spark.operators.entity_link import (
                    hashing_trick_embed,
                )

                ctx_frame = _run(
                    "sentence_ctx",
                    lambda: kg.split_sentences(
                        extracted.where(F.col("lang") == "en")
                    ).select(
                        "url",
                        "sent_idx",
                        hashing_trick_embed(F.col("tokens"), kg.CTX_DIM).alias(
                            "ctx"
                        ),
                    ),
                    upstream=["extracted"],
                    entity_col="url",
                )
        triples = _run(
            "triples",
            lambda: kg.link_and_emit(
                assembled, crosswalk, canon_map,
                entity_embeddings=ent_emb, ctx=ctx_frame,
            ),
            upstream=["assembled", "crosswalk", "canon_map"]
            + (["entity_embeddings"] if disambiguate else []),
            entity_col="subj_id",
            partition_by=["pred_id"],
        )
        _run(
            "nodes",
            lambda: kg.materialize_nodes(crosswalk, canon_map),
            upstream=["crosswalk", "canon_map"],
            entity_col="node_id",
        )
        if web_extras:
            from i2o_transform_spark.datagen import enrich_pages_web
            from i2o_transform_spark.operators.dictenc import (
                build_term_dictionary,
                encode_triples,
            )
            from i2o_transform_spark.sources.htmltable import (
                extract_attr_values,
            )
            from i2o_transform_spark.sources.unified import (
                structured_data_to_triples,
            )

            enriched = _run(
                "web_enriched",
                lambda: enrich_pages_web(pages),
                upstream=["pages"],
                entity_col="url",
            )
            _run(
                "web_table_pairs",
                lambda: extract_attr_values(enriched, keep=["url"]),
                upstream=["web_enriched"],
                entity_col="url",
            )
            sd = _run(
                "sd_triples",
                lambda: structured_data_to_triples(enriched).select(
                    "syntax", "doc_key", "subj", "pred", "obj",
                    "obj_is_iri", "obj_lang",
                ),
                upstream=["web_enriched"],
                entity_col="doc_key",
                partition_by=["syntax"],
            )
            _run(
                "web_term_dict",
                lambda: build_term_dictionary(
                    sd.select("subj", "pred", "obj"), method="hash"
                ),
                upstream=["sd_triples"],
                entity_col="term",
            )
            _run(
                "sd_triples_encoded",
                lambda: encode_triples(sd.select("subj", "pred", "obj")),
                upstream=["sd_triples"],
                entity_col="s_id",
            )
        r.finish()
    except _StopRun:
        pass
    outputs["_runner"] = r  # type: ignore[assignment]
    return outputs


class _StopRun(Exception):
    pass


def main() -> None:
    from i2o_transform_spark.session import get_spark

    ap = argparse.ArgumentParser(description="KG pipeline runner")
    ap.add_argument("--n-pages", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-broadcast-vocab", action="store_true")
    ap.add_argument("--disambiguate", action="store_true",
                    help="embedding entity-link scoring over planted ambiguity")
    ap.add_argument("--web-extras", action="store_true",
                    help="add web-source stages: enriched html -> fused "
                         "JSON-LD/Microdata/RDFa trio, single-pass web "
                         "tables, term dictionary + encoded triples")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("kg-runner", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    outs = run_pipeline(
        spark,
        args.out,
        n_pages=args.n_pages,
        seed=args.seed,
        broadcast_vocab=not args.no_broadcast_vocab,
        disambiguate=args.disambiguate,
        web_extras=args.web_extras,
    )
    r: Runner = outs["_runner"]  # type: ignore[assignment]
    n_triples = outs["triples"].count()
    print(
        json.dumps(
            {
                "n_pages": args.n_pages,
                "n_triples": n_triples,
                "executed": r.executed,
                "skipped": r.skipped,
                "wall_s": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
