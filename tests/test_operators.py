"""Operator-level tests: interval merge goldens (FIXTURES B4), near-dup
operators vs exact ground truth, ANN recall, connected components, salted
join equivalence."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from i2o_transform_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    preference_dedup,
    simhash_near_dupes,
)
from i2o_transform_spark.operators.graph import (
    blocked_connected_components,
    label_propagation_components,
)
from i2o_transform_spark.operators.intervals import merge_intervals
from i2o_transform_spark.operators.joins import salted_join
from i2o_transform_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk

D = datetime.date


def test_interval_merge_golden(spark):
    """B4: overlapping / gap<=30 / gap>30 / null-end cases — golden output of
    the era algorithm (MSSQL/OMOPLoader.sql:1508-1565)."""
    rows = [
        (1, D(2020, 1, 1), D(2020, 1, 10)),
        (1, D(2020, 1, 5), D(2020, 1, 20)),   # overlap -> same era
        (1, D(2020, 2, 19), None),            # null end; gap exactly 30 -> same era
        (1, D(2020, 4, 1), D(2020, 4, 2)),    # gap 42 > 30 -> new era
        (2, D(2020, 1, 1), None),             # separate entity
    ]
    df = spark.createDataFrame(rows, "entity_id int, start_date date, end_date date")
    got = {
        (r.entity_id, r.era_start.isoformat(), r.era_end.isoformat(), r.era_count)
        for r in merge_intervals(df, ["entity_id"], gap_days=30).collect()
    }
    assert got == {
        (1, "2020-01-01", "2020-02-19", 3),
        (1, "2020-04-01", "2020-04-02", 1),
        (2, "2020-01-01", "2020-01-01", 1),
    }


def test_interval_merge_gap_boundary(spark):
    """start exactly gap+1 days after previous end -> NEW era."""
    rows = [(1, D(2020, 1, 1), D(2020, 1, 1)), (1, D(2020, 2, 1), D(2020, 2, 1))]
    df = spark.createDataFrame(rows, "entity_id int, start_date date, end_date date")
    assert merge_intervals(df, ["entity_id"], gap_days=30).count() == 2
    assert merge_intervals(df, ["entity_id"], gap_days=31).count() == 1


def test_preference_dedup_priority_order(spark):
    df = spark.createDataFrame(
        [(1, "LOINC:x", 1), (1, "LAB_NAME:y", 0), (2, "other", 2)],
        "code int, parent string, pri int",
    )
    got = preference_dedup(df, ["code"], [F.col("pri").asc()]).collect()
    winners = {r.code: r.parent for r in got}
    assert winners == {1: "LAB_NAME:y", 2: "other"}


def _dup_corpus(spark):
    """Docs with known near-dup structure: pairs (i, i+100) share most
    tokens; unrelated docs share almost none."""
    rows = []
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    for i in range(20):
        base = [words[(i * 3 + j) % 10] + str(i * 41 + j) for j in range(40)]
        rows.append((i, " ".join(base)))
        near = list(base)
        near[0] = "changed"  # one-token edit -> high jaccard twin
        rows.append((i + 100, " ".join(near)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_jaccard_exact(spark):
    docs = _dup_corpus(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert pairs == {(i, i + 100) for i in range(20)}


def test_minhash_lsh_recall(spark):
    """LSH candidates must recover (almost) all true near-dup pairs and the
    signature-estimated jaccard must be close to exact."""
    docs = _dup_corpus(spark)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.4).collect()
    }
    recall = len(set(exact) & set(lsh)) / len(exact)
    assert recall >= 0.9
    for pair in set(exact) & set(lsh):
        assert abs(exact[pair] - lsh[pair]) < 0.35  # 32-hash estimator noise


def test_simhash_finds_twins(spark):
    docs = _dup_corpus(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_near_dupes(docs, "doc_id", "text", n=3, max_hamming=16).collect()
    }
    twins = {(i, i + 100) for i in range(20)}
    assert len(pairs & twins) / len(twins) >= 0.9


def test_ann_lsh_recall_vs_brute_force(spark, request):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, q, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in lsh_bucketed_topk(
            emb, q, k=10, dim=64, num_planes=4, num_tables=8
        ).collect()
    }
    # random near-orthogonal vectors are LSH's worst case; theory for this
    # (p^4 per table, 8 tables) predicts ~0.6 recall — require >= 0.5
    assert len(exact & approx) / len(exact) >= 0.5


def test_ann_ivf_recall_vs_brute_force(spark):
    """IVF coarse quantizer: probing 8 of 16 cells on worst-case random
    embeddings must recover >= 50% of the exact top-10 (same bar as LSH),
    and the full-probe configuration (n_probe == n_centroids) must be EXACT
    — every corpus row is scored, so IVF degrades gracefully to brute
    force."""
    from i2o_transform_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, q, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, q, k=10, n_centroids=16, n_probe=8).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.5

    full = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, q, k=10, n_centroids=16, n_probe=16).collect()
    }
    assert full == exact


def test_blocked_cc(spark):
    edges = spark.createDataFrame(
        [("b1", 1, 2), ("b1", 2, 3), ("b2", 10, 11), ("b2", 3, 4)],
        "block string, src long, dst long",
    )
    roots = {r.node: r.root for r in blocked_connected_components(edges).collect()}
    assert roots == {1: 1, 2: 1, 3: 1, 4: 3, 10: 10, 11: 10}
    # NB: 4 joins 3's component only through block b2 (root=min within
    # reachable merge) — blocking must cover component edges by design


def test_label_propagation_cc(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (12, 12)],
        "src long, dst long",
    )
    roots = {r.node: r.root for r in label_propagation_components(edges).collect()}
    assert roots[1] == roots[2] == roots[3] == roots[4] == 1
    assert roots[10] == roots[11] == 10
    assert roots[12] == 12


def test_salted_join_equivalence(spark):
    """Salted repartition join must produce exactly the plain join's rows."""
    big = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(i, f"name{i}") for i in range(7)], "k long, name string"
    )
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, "k", salt_buckets=8).select("k", "v", "name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


# --- real image header parsing (operators/multimodal.py) ----------------------

# Well-known minimal real files (public domain byte sequences): a 1x1
# transparent PNG and a 1x1 GIF, as produced by standard encoders.
_PNG_1x1 = __import__("base64").b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
    "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
)
_GIF_1x1 = __import__("base64").b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def test_parse_image_header_real_files():
    from i2o_transform_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_PNG_1x1) == ("png", 1, 1)
    assert parse_image_header(_GIF_1x1) == ("gif", 1, 1)


def test_parse_image_header_synth_roundtrip():
    from i2o_transform_spark.operators.multimodal import (
        parse_image_header,
        synth_image_bytes,
    )

    for fmt in ("png", "jpeg", "gif"):
        for w, h in [(1, 1), (640, 480), (65535, 1), (1920, 1080)]:
            assert parse_image_header(synth_image_bytes(fmt, w, h)) == (fmt, w, h)


def test_parse_image_header_jpeg_segment_walk():
    """SOF dims must be found even behind extra APPn/COM segments, and a
    stream with no SOF (or corrupt markers) must return None."""
    import struct

    from i2o_transform_spark.operators.multimodal import (
        parse_image_header,
        synth_image_bytes,
    )

    base = synth_image_bytes("jpeg", 321, 123)
    # splice two extra segments (COM and APP2) between APP0 and SOF0
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    app2 = b"\xff\xe2" + struct.pack(">H", 6) + b"ICCP"
    spliced = base[:20] + com + app2 + base[20:]
    assert parse_image_header(spliced) == ("jpeg", 321, 123)
    # no SOF before stream end -> None
    assert parse_image_header(b"\xff\xd8" + com + b"\xff\xd9") is None
    # corrupt marker stream -> None
    assert parse_image_header(b"\xff\xd8\x00\x00\x00\x00") is None


def test_parse_image_header_rejects_non_images():
    from i2o_transform_spark.operators.multimodal import parse_image_header

    assert parse_image_header(b"") is None
    assert parse_image_header(b"plain text payload, definitely not an image") is None
    assert parse_image_header(_PNG_1x1[:10]) is None  # truncated header


def test_extract_media_metadata_real_parse(spark):
    """End-to-end: synthesized real headers through the Arrow metadata pass;
    video payloads (unparseable) fall back to the documented stub."""
    from i2o_transform_spark.operators.multimodal import (
        extract_media_metadata,
        synth_image_media,
    )

    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    meta = extract_media_metadata(synth_image_media(docs))
    rows = {r.doc_id: r for r in meta.collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        assert r.media_type == ["png", "jpeg", "gif"][i % 3]
        assert (r.width, r.height, r.n_frames) == (i % 640 + 1, i % 480 + 1, 1)
    # unparseable payload keeps declared type + stub dims
    vid = spark.createDataFrame(
        [(1, b"notanimage" * 3, "video")],
        "doc_id long, media binary, media_type string",
    )
    r = extract_media_metadata(vid).collect()[0]
    assert r.media_type == "video" and r.n_frames == 30 % 250 + 1


# --- global re-keying (operators/rekey.py) ------------------------------------


def test_rekey_strict_gate(spark):
    """Full mapping swaps every table; partial mapping raises (the
    reference's all-or-nothing migration gate)."""
    import pytest as _pytest

    from i2o_transform_spark.operators.rekey import rekey_tables

    t1 = spark.createDataFrame([(1, "a"), (2, "b")], "pid long, v string")
    t2 = spark.createDataFrame([(1, 10.0), (1, 11.0), (2, 12.0)], "pid long, x double")
    full = spark.createDataFrame([(1, 101), (2, 102)], "old_key long, new_key long")
    out, report = rekey_tables({"t1": t1, "t2": t2}, "pid", full)
    assert {r.pid for r in out["t1"].collect()} == {101, 102}
    assert out["t2"].where(F.col("pid") == 101).count() == 2
    assert all(r.complete == 1 for r in report.collect())
    partial = full.where(F.col("old_key") == 1)
    with _pytest.raises(ValueError, match="refusing swap"):
        rekey_tables({"t1": t1, "t2": t2}, "pid", partial)
    # non-strict: drops unmapped, report says so
    out2, rep2 = rekey_tables({"t1": t1}, "pid", partial, strict=False)
    assert {r.pid for r in out2["t1"].collect()} == {101}
    assert {(r.table_name, r.n_unmapped) for r in rep2.collect()} == {("t1", 1)}


def test_compose_mapping_two_hop(spark):
    from i2o_transform_spark.operators.rekey import compose_mapping

    a = spark.createDataFrame(
        [(1, "mrn1", "F1"), (2, "mrn2", "F1")], "old_key long, mrn string, fac string"
    )
    b = spark.createDataFrame(
        [("mrn1", "F1", 900), ("mrn2", "F1", 901), ("mrn2", "F2", 999)],
        "mrn string, fac string, new_key long",
    )
    m = {r.old_key: r.new_key for r in
         compose_mapping(a, b, ["mrn", "fac"], "old_key", "new_key").collect()}
    assert m == {1: 900, 2: 901}  # facility must match (F2 row ignored)


def test_label_propagation_chain_converges():
    """Pointer doubling must resolve a long chain in O(log d) rounds —
    plain hash-min would need `length` rounds and time out max_iter."""
    from i2o_transform_spark.operators.graph import label_propagation_components
    from i2o_transform_spark.session import get_spark

    spark = get_spark(master="local[8]")
    n = 3000
    edges = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
    roots = label_propagation_components(edges, max_iter=30)
    agg = roots.groupBy("root").count().collect()
    assert len(agg) == 1 and agg[0]["root"] == 0 and agg[0]["count"] == n


def test_blocked_cc_oversized_block_spills_to_global(spark):
    """VERDICT r01 #5: a pathological block (here: a 10^5-node chain under
    ONE blocking key) must not land on a single union-find task — it is
    carved out and resolved by the distributed iterative algorithm, and the
    result still composes with normal blocks via min-root."""
    from i2o_transform_spark.operators.graph import blocked_connected_components

    n = 100_000
    hot = spark.range(n - 1).selectExpr(
        "'hot' AS block", "id AS src", "id + 1 AS dst"
    )
    normal = spark.createDataFrame(
        [("b1", 1_000_000, 1_000_001), ("b2", 2_000_000, 2_000_001)],
        "block string, src long, dst long",
    )
    roots = blocked_connected_components(
        hot.unionByName(normal), max_block_edges=1_000
    )
    got = roots.groupBy("root").count().collect()
    by_root = {r["root"]: r["count"] for r in got}
    assert by_root[0] == n            # the whole chain collapsed to node 0
    assert by_root[1_000_000] == 2 and by_root[2_000_000] == 2


def test_embedding_disambiguate_paths_agree(spark):
    """JVM array-fold path == Arrow matmul path, incl. deterministic
    lowest-id tie-break and argmax correctness on planted geometry."""
    from i2o_transform_spark.operators.entity_link import (
        embedding_disambiguate,
        embedding_disambiguate_pandas,
    )

    mentions = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0, 0.0]),
            (2, "a", [0.0, 1.0, 0.0]),
            (3, "b", [0.5, 0.5, 0.0]),
            (4, "oov", [1.0, 1.0, 1.0]),  # no candidates -> dropped
        ],
        "doc_id long, surface string, ctx array<double>",
    )
    cands = spark.createDataFrame(
        [
            ("a", 10, [1.0, 0.1, 0.0]),
            ("a", 11, [0.1, 1.0, 0.0]),
            ("b", 20, [1.0, 0.0, 0.0]),
            ("b", 21, [0.0, 0.0, 1.0]),
        ],
        "surface string, entity_id long, emb array<double>",
    )
    jvm = embedding_disambiguate(mentions, cands).orderBy("doc_id").collect()
    arrow = (
        embedding_disambiguate_pandas(mentions, cands).orderBy("doc_id").collect()
    )
    assert [(r.doc_id, r.entity_id) for r in jvm] == [(1, 10), (2, 11), (3, 20)]
    assert [tuple(r) for r in jvm] == [tuple(r) for r in arrow]

    # exact tie -> lowest entity id, both paths
    m2 = spark.createDataFrame(
        [(1, "t", [1.0, 0.0])], "doc_id long, surface string, ctx array<double>"
    )
    c2 = spark.createDataFrame(
        [("t", 7, [1.0, 0.0]), ("t", 3, [1.0, 0.0])],
        "surface string, entity_id long, emb array<double>",
    )
    assert embedding_disambiguate(m2, c2).collect()[0].entity_id == 3
    assert embedding_disambiguate_pandas(m2, c2).collect()[0].entity_id == 3


def test_embedding_disambiguate_random_equivalence(spark):
    """Property check: on random float32 vectors the two physical paths
    elect the same entity for every mention (scores differ at O(0.1),
    far beyond double error)."""
    import numpy as np

    from i2o_transform_spark.operators.entity_link import (
        embedding_disambiguate,
        embedding_disambiguate_pandas,
    )

    rng = np.random.default_rng(11)
    surfaces = [f"s{i}" for i in range(8)]
    cand_rows = [
        (s, 100 * i + j, rng.standard_normal(16).astype(np.float32).tolist())
        for i, s in enumerate(surfaces)
        for j in range(4)
    ]
    men_rows = [
        (k, surfaces[k % 8], rng.standard_normal(16).astype(np.float32).tolist())
        for k in range(200)
    ]
    cands = spark.createDataFrame(
        cand_rows, "surface string, entity_id long, emb array<float>"
    )
    mentions = spark.createDataFrame(
        men_rows, "doc_id long, surface string, ctx array<float>"
    )
    a = {
        r.doc_id: r.entity_id
        for r in embedding_disambiguate(mentions, cands).collect()
    }
    b = {
        r.doc_id: r.entity_id
        for r in embedding_disambiguate_pandas(mentions, cands).collect()
    }
    assert len(a) == 200
    assert a == b


def test_candidate_table_broadcast_bound_raises(spark, monkeypatch):
    """Error contract: an oversized candidate dictionary raises a loud
    ValueError (not a stripped-under-``-O`` assert), and the driver collect
    is capped at bound+1 rows so the failure mode can never be an unbounded
    collect.  Mirrors the MAX_BROADCAST_VOCAB contract in plans/kg.py."""
    import i2o_transform_spark.operators.entity_link as el

    cands = spark.createDataFrame(
        [("s", i, [1.0, 0.0]) for i in range(5)],
        "surface string, entity_id long, emb array<double>",
    )
    monkeypatch.setattr(el, "MAX_CANDIDATE_TABLE_ROWS", 4)
    with pytest.raises(ValueError, match="broadcast"):
        el._collect_candidate_table(cands, "surface", "entity_id", "emb")
    # at the bound it still works
    monkeypatch.setattr(el, "MAX_CANDIDATE_TABLE_ROWS", 5)
    table = el._collect_candidate_table(cands, "surface", "entity_id", "emb")
    assert list(table["s"][0]) == [0, 1, 2, 3, 4]


def test_embedding_disambiguate_dual_equals_sequential(spark):
    """Round-3 one-pass dual (subj+obj) kernel == two sequential expression
    folds: same elections, same inner-join drop semantics, same tie-break."""
    import numpy as np

    from i2o_transform_spark.operators.entity_link import (
        embedding_disambiguate,
        embedding_disambiguate_dual_pandas,
    )

    rng = np.random.default_rng(23)
    surfaces = [f"s{i}" for i in range(6)]
    cand_rows = [
        (s, 100 * i + j, rng.standard_normal(16).astype(np.float32).tolist())
        for i, s in enumerate(surfaces)
        for j in range(3)
    ]
    men_rows = [
        (
            k,
            surfaces[k % 6],
            # every 7th row has an OOV object surface -> row dropped
            "oov" if k % 7 == 0 else surfaces[(k * 3 + 1) % 6],
            rng.standard_normal(16).astype(np.float32).tolist(),
        )
        for k in range(150)
    ]
    cands = spark.createDataFrame(
        cand_rows, "surface string, entity_id long, emb array<float>"
    )
    mentions = spark.createDataFrame(
        men_rows,
        "doc_id long, subj_surface string, obj_surface string, ctx array<float>",
    )
    dual = {
        r.doc_id: (r.subj_id, r.obj_id)
        for r in embedding_disambiguate_dual_pandas(
            mentions, cands, surface_col="surface"
        ).collect()
    }
    seq1 = embedding_disambiguate(
        mentions,
        cands.select(
            F.col("surface").alias("subj_surface"),
            F.col("entity_id"),
            "emb",
        ),
        surface_col="subj_surface",
        out_col="subj_id",
        drop_ctx=False,
    )
    seq = {
        r.doc_id: (r.subj_id, r.obj_id)
        for r in embedding_disambiguate(
            seq1,
            cands.select(
                F.col("surface").alias("obj_surface"),
                F.col("entity_id"),
                "emb",
            ),
            surface_col="obj_surface",
            out_col="obj_id",
        ).collect()
    }
    assert len(dual) == len([m for m in men_rows if m[0] % 7 != 0])
    assert dual == seq


def test_degrees_and_pagerank_vs_numpy(spark):
    """pagerank (fixed-iteration, dangling-corrected) matches a dense numpy
    power iteration to 1e-9, ranks sum to 1, degrees exact."""
    import numpy as np

    from i2o_transform_spark.operators.graph import degrees, pagerank

    # small digraph incl. a dangling node (3) and a 2-cycle
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 0), (4, 3)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")

    deg = {r.node: (r.out_deg, r.in_deg) for r in degrees(edges).collect()}
    assert deg[0] == (2, 2) and deg[3] == (0, 2) and deg[4] == (2, 0)

    K, d, n = 12, 0.85, 5
    got = {r.node: r.rank for r in pagerank(edges, iterations=K, damping=d).collect()}
    A = np.zeros((n, n))
    for s, t in edge_list:
        A[t, s] = 1.0
    out = A.sum(axis=0)
    P = np.zeros((n, n))
    np.divide(A, out, out=P, where=out > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(K):
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (P @ r + dang / n)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])


def test_embedding_disambiguate_salted_equals_broadcast(spark):
    """The big-vocab salted path (salted join + two hash-agg argmax) elects
    exactly the entities the broadcast fold elects, incl. ties -> lowest id,
    and carries the non-key mention columns through."""
    import numpy as np

    from i2o_transform_spark.operators.entity_link import (
        embedding_disambiguate,
        embedding_disambiguate_salted,
    )

    rng = np.random.default_rng(5)
    surfaces = [f"s{i}" for i in range(6)]
    cands = spark.createDataFrame(
        [
            (s, 50 * i + j, rng.standard_normal(8).astype(np.float64).tolist())
            for i, s in enumerate(surfaces)
            for j in range(3)
        ],
        "surface string, entity_id long, emb array<double>",
    )
    mentions = spark.createDataFrame(
        [
            (k, f"u{k % 7}", surfaces[k % 6],
             rng.standard_normal(8).astype(np.float64).tolist())
            for k in range(120)
        ],
        "mid long, extra string, surface string, ctx array<double>",
    )
    a = {
        (r.mid, r.extra): r.entity_id
        for r in embedding_disambiguate(mentions, cands).collect()
    }
    b = {
        (r.mid, r.extra): r.entity_id
        for r in embedding_disambiguate_salted(
            mentions, cands, mention_key_cols=["mid"], salt_buckets=4
        ).collect()
    }
    assert len(a) == 120 and a == b

    # exact tie -> lowest id on the salted path too
    m2 = spark.createDataFrame(
        [(1, "t", [1.0, 0.0])], "mid long, surface string, ctx array<double>"
    )
    c2 = spark.createDataFrame(
        [("t", 9, [2.0, 0.0]), ("t", 4, [1.0, 0.0])],
        "surface string, entity_id long, emb array<double>",
    )
    got = embedding_disambiguate_salted(m2, c2, mention_key_cols=["mid"]).collect()
    assert got[0].entity_id == 4


def test_asof_join_golden(spark):
    """Hand-built golden for asof_join: ties at equal ts, exact-match
    boundary (inclusive vs strict), tolerance cutoff, unmatched key."""
    from i2o_transform_spark.operators.joins import asof_join

    T = datetime.datetime
    quotes = spark.createDataFrame(
        [
            # key u1: two quotes at the SAME ts (tie -> max qid wins), one later
            ("u1", T(2024, 1, 1, 10, 0, 0), 1, "a"),
            ("u1", T(2024, 1, 1, 10, 0, 0), 2, "b"),
            ("u1", T(2024, 1, 1, 12, 0, 0), 3, "c"),
            # key u2: a single old quote (outside 1h tolerance of the trade)
            ("u2", T(2024, 1, 1, 0, 0, 0), 4, "d"),
        ],
        "k string, ts timestamp, qid long, tag string",
    )
    trades = spark.createDataFrame(
        [
            ("u1", T(2024, 1, 1, 10, 0, 0), 100),  # exactly at the tie pair
            ("u1", T(2024, 1, 1, 11, 59, 59), 101),
            ("u1", T(2024, 1, 1, 12, 30, 0), 102),
            ("u2", T(2024, 1, 1, 9, 0, 0), 103),  # only match is 9h old
            ("u3", T(2024, 1, 1, 9, 0, 0), 104),  # key absent from quotes
        ],
        "k string, ts timestamp, tid long",
    )

    out = {
        r["tid"]: (r["asof_qid"], r["asof_tag"])
        for r in asof_join(
            trades, quotes, on="k", left_ts="ts", right_ts="ts",
            right_cols=["qid", "tag"], tie_col="qid",
        ).collect()
    }
    assert out == {
        100: (2, "b"),   # inclusive boundary, tie broken to max qid
        101: (2, "b"),
        102: (3, "c"),
        103: (4, "d"),
        104: (None, None),
    }

    strict = {
        r["tid"]: r["asof_qid"]
        for r in asof_join(
            trades, quotes, on="k", left_ts="ts", right_ts="ts",
            right_cols=["qid"], tie_col="qid", allow_exact_matches=False,
        ).collect()
    }
    assert strict[100] is None  # equal-ts quote excluded under strict <

    tol = {
        r["tid"]: r["asof_qid"]
        for r in asof_join(
            trades, quotes, on="k", left_ts="ts", right_ts="ts",
            right_cols=["qid"], tie_col="qid", tolerance="INTERVAL 1 HOUR",
        ).collect()
    }
    assert tol[103] is None      # match exists but is older than the window
    assert tol[101] is None      # 10:00 quote is ~2h before an 11:59 trade
    assert tol[102] == 3         # 12:00 quote within 1h of a 12:30 trade


def test_asof_join_single_shuffle_plan(spark):
    """The as-of join must plan exactly one exchange (the window partition),
    never a range-join fan-out or cartesian."""
    from i2o_transform_spark.operators.joins import asof_join

    left = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id") * 37).alias("ts"),
        F.col("id").alias("rid"),
    )
    plan = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_cols=["rid"], tie_col="rid",
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_parse_wav_header_roundtrip_and_chunk_walk():
    """synth -> parse roundtrip, chunk-walk past a leading LIST chunk, and
    rejection of non-RIFF payloads."""
    import struct

    from i2o_transform_spark.operators.multimodal import (
        parse_wav_header,
        synth_wav_bytes,
    )

    for rate, ch, bits, n in [(8000, 1, 16, 1), (44100, 2, 16, 49999),
                              (22050, 2, 8, 123)]:
        assert parse_wav_header(synth_wav_bytes(rate, ch, bits, n)) == (
            rate, ch, bits, n
        )

    # a LIST metadata chunk before fmt — the walker must skip it
    body = synth_wav_bytes(16000, 1, 16, 10)
    list_chunk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    with_list = body[:12] + list_chunk + body[12:]
    riff = b"RIFF" + struct.pack("<I", len(with_list) - 8) + with_list[8:]
    assert parse_wav_header(riff) == (16000, 1, 16, 10)

    assert parse_wav_header(b"") is None
    assert parse_wav_header(b"RIFFxxxxAVI LIST" + b"\x00" * 40) is None
    assert parse_wav_header(b"notawav" * 10) is None


def test_extract_media_metadata_wav(spark):
    """Mixed-media pass: wav rows carry real parsed (rate, channels,
    n_frames); image rows keep NULL audio fields."""
    from i2o_transform_spark.operators.multimodal import (
        extract_media_metadata,
        synth_mixed_media,
    )

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    rows = {
        r.doc_id: r
        for r in extract_media_metadata(synth_mixed_media(docs)).collect()
    }
    rates = (8000, 16000, 22050, 44100)
    for i, r in rows.items():
        if i % 4 == 3:
            assert r.media_type == "wav" and r.width is None
            assert (r.sample_rate, r.n_channels, r.n_frames) == (
                rates[(i // 4) % 4], i % 2 + 1, i % 50000 + 1
            )
        else:
            assert r.sample_rate is None and r.n_channels is None
            assert r.n_frames == 1


def test_triangle_count_vs_bruteforce(spark):
    """Degree-oriented triangle count equals the itertools brute force on a
    seeded random graph (with duplicate/reversed/self-loop noise)."""
    import itertools
    import random

    from i2o_transform_spark.operators.graph import triangle_count

    rng = random.Random(7)
    n = 40
    edges = {(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.15}
    noisy = [(a, b) for a, b in edges]
    noisy += [(b, a) for a, b in list(edges)[:30]]      # reversed dupes
    noisy += [(a, a) for a in range(5)]                  # self loops
    df = spark.createDataFrame(noisy, "src long, dst long")

    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    expected = sum(
        1 for a, b, c in itertools.combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    got = triangle_count(df).collect()[0]["n_triangles"]
    assert got == expected and expected > 0


def test_asof_join_equals_pandas_merge_asof(spark):
    """Randomized equivalence vs the authoritative reference implementation
    (pandas.merge_asof, backward direction), including deliberate timestamp
    collisions, all (allow_exact_matches, tolerance) combinations."""
    import random

    import pandas as pd

    from i2o_transform_spark.operators.joins import asof_join

    rng = random.Random(13)
    base = datetime.datetime(2024, 1, 1)

    def mk(n, id0):
        # coarse second granularity forces ts collisions within and across sides
        return [
            (f"k{rng.randrange(5)}",
             base + datetime.timedelta(seconds=rng.randrange(120)),
             id0 + i)
            for i in range(n)
        ]

    left = spark.createDataFrame(mk(300, 0), "k string, ts timestamp, lid long")
    right = spark.createDataFrame(
        mk(300, 1000), "k string, ts timestamp, rid long"
    )
    lp = left.toPandas()
    rp = right.toPandas()

    for exact, tol in [(True, None), (False, None),
                       (True, "INTERVAL 30 SECOND"), (False, "INTERVAL 30 SECOND")]:
        got = {
            r["lid"]: r["asof_rid"]
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="ts",
                right_cols=["rid"], tie_col="rid",
                allow_exact_matches=exact, tolerance=tol,
            ).collect()
        }
        # pandas picks the LAST matching row in sort order; sorting the right
        # side by (ts, rid) makes that the max-rid row — the operator's
        # documented tie-break
        exp_df = pd.merge_asof(
            lp.sort_values(["ts", "lid"], kind="stable"),
            rp.sort_values(["ts", "rid"], kind="stable"),
            on="ts", by="k", direction="backward",
            allow_exact_matches=exact,
            tolerance=pd.Timedelta(seconds=30) if tol else None,
        )
        exp = {
            int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in exp_df.itertuples()
        }
        assert got == exp, f"mismatch at exact={exact} tol={tol}"


def test_prefix_jaccard_equals_bruteforce(spark):
    """Lossless prefix filtering: output must equal a pure-python exact
    Jaccard over trigram shingle sets — pairs AND values."""
    from i2o_transform_spark.operators.dedup import prefix_jaccard_pairs

    docs = _dup_corpus(spark)
    rows = docs.collect()

    def sh(text):
        w = text.split()
        if len(w) <= 3:
            return {" ".join(w)}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {r.doc_id: sh(r.text) for r in rows}
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.5:
                expected[(a, b)] = round(j, 6)

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert got == expected and len(expected) == 20


# ---------------------------------------------------------------------------
# CDC / incremental merge (operators/cdc.py)
# ---------------------------------------------------------------------------


def test_cdc_snapshot_tiebreak_prefers_delete(spark):
    """A delete and an upsert with the SAME sequence number must not
    resurrect the key (retry safety)."""
    from i2o_transform_spark.operators.cdc import cdc_latest_snapshot

    log = spark.createDataFrame(
        [
            (1, 10, "U", "a"),
            (1, 20, "U", "b"),
            (1, 20, "D", None),   # same seq as the 'b' upsert
            (2, 5, "D", None),
            (2, 7, "U", "z"),     # later upsert revives key 2
            (3, 1, "U", "x"),
        ],
        "k int, seq int, op string, v string",
    )
    snap = cdc_latest_snapshot(log, keys=["k"], seq_col="seq", op_col="op")
    got = {r.k: r.v for r in snap.collect()}
    assert got == {2: "z", 3: "x"}  # key 1 stays deleted on the tie


def test_scd2_history_collapses_replays(spark):
    """At-least-once redelivery of an unchanged state must not lengthen
    history; intervals chain with lead() and exactly one is current."""
    from i2o_transform_spark.operators.cdc import scd2_history

    log = spark.createDataFrame(
        [(1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "B"), (1, 5, "A")],
        "k int, seq int, attr string",
    )
    h = scd2_history(log, keys=["k"], attr_cols=["attr"], seq_col="seq")
    rows = sorted(
        (r.attr, r.valid_from, r.valid_to, r.is_current) for r in h.collect()
    )
    assert rows == [("A", 1, 3, False), ("A", 5, None, True),
                    ("B", 3, 5, False)]


def test_merge_into_bucketed_prunes_untouched_buckets(spark, tmp_path):
    """The merge must (a) equal a full recompute and (b) leave the files of
    unaffected buckets untouched on disk (partition-pruned rewrite)."""
    import os

    from i2o_transform_spark.operators.cdc import merge_into_bucketed
    from i2o_transform_spark.sources.tables import bucketed_write

    base = str(tmp_path)
    n_buckets = 16
    target = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    bucketed_write(target, base, "snap", key_col="k", n_buckets=n_buckets)

    # capture per-file mtimes before the merge
    def file_mtimes():
        out = {}
        for root, _dirs, files in os.walk(os.path.join(base, "snap")):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.stat(p).st_mtime_ns
        return out

    before = file_mtimes()
    changes = spark.createDataFrame(
        [(5, 1, "U", 999), (5, 2, "U", 555),   # update k=5 (last wins)
         (7, 1, "D", None),                     # delete k=7
         (1000, 1, "U", 42)],                   # insert new key
        "k long, seq int, op string, v long",
    )
    touched = merge_into_bucketed(
        spark, base, "snap", changes, key_col="k", seq_col="seq",
        op_col="op", n_buckets=n_buckets,
    )
    assert 0 < len(touched) <= 3
    after = file_mtimes()
    changed_dirs = {f"_bucket={b}" for b in touched}
    for p, m in before.items():
        if p in after and not any(c in p for c in changed_dirs):
            assert after[p] == m, f"untouched bucket rewritten: {p}"

    merged = spark.read.parquet(os.path.join(base, "snap"))
    got = {r.k: r.v for r in merged.collect()}
    expect = {i: i * 10 for i in range(200)}
    expect[5] = 555
    del expect[7]
    expect[1000] = 42
    assert got == expect


def test_k_hop_min_distance(spark):
    """BFS must report MIN hop distance when a node is reachable at several
    depths, and never leave the k-ball."""
    from i2o_transform_spark.operators.graph import k_hop_neighbors

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.hops
           for r in k_hop_neighbors(edges, seeds, k=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}  # e is 3 hops: excluded


def test_deterministic_walks_golden(spark):
    """Walks follow hash-argmin edges: verify against a brute-force python
    recomputation of the same md5-argmin rule, and that a dead-end node
    simply ends the walk."""
    import hashlib

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "e")]
    # 'e' is a dead end
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("d",)], "node string")
    from i2o_transform_spark.operators.graph import deterministic_walks

    got = {
        (r.walk_id, r.step, r.node)
        for r in deterministic_walks(df, seeds, length=3).collect()
    }

    adj: dict[str, list[str]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)

    def nxt(u: str, t: int) -> str | None:
        outs = adj.get(u)
        if not outs:
            return None
        key = lambda v: hashlib.md5(f"{u}:{t}:{v}".encode()).hexdigest()  # noqa: E731
        return min(outs, key=key)

    want = set()
    for seed in ("a", "d"):
        cur: str | None = seed
        want.add((seed, 0, seed))
        for t in range(1, 4):
            cur = nxt(cur, t)
            if cur is None:
                break
            want.add((seed, t, cur))
    assert got == want
    # walker 'd' reached dead-end 'e' at step 1 and stopped
    assert ("d", 1, "e") in got
    assert not any(w == "d" and s > 1 for w, s, _ in got)


def test_deterministic_walks_reproducible_across_partitionings(spark):
    """Same walks regardless of input partitioning (determinism is data-only)."""
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(30)]
    edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(200)})
    df1 = spark.createDataFrame(edges, "src string, dst string")
    df8 = df1.repartition(8)
    seeds = spark.createDataFrame([(n,) for n in nodes[:10]], "node string")
    from i2o_transform_spark.operators.graph import deterministic_walks

    a = sorted(map(tuple, deterministic_walks(df1, seeds, length=4).collect()))
    b = sorted(map(tuple, deterministic_walks(df8, seeds, length=4).collect()))
    assert a == b and len(a) > 10


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction: 32 small files -> ceil(bytes/target) files, identical
    row multiset, original left intact on disk until the atomic swap."""
    import glob
    import os

    from pyspark.sql import functions as F

    from i2o_transform_spark.sources.tables import compact_parquet

    path = str(tmp_path / "t")
    spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(
        32
    ).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before == 32
    want = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.sum("id"), F.sum("v")
    ).first()

    stats = compact_parquet(spark, path, target_file_bytes=10**9)
    assert stats["files_before"] == 32
    assert stats["files_after"] == 1
    got = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.sum("id"), F.sum("v")
    ).first()
    assert tuple(got) == tuple(want)
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__compact__")

    # idempotent re-run: already-compact input stays one file
    stats2 = compact_parquet(spark, path, target_file_bytes=10**9)
    assert stats2["files_after"] == 1


def test_compact_parquet_recovers_interrupted_swap(spark, tmp_path):
    """ADVICE r02: a crash between the two swap renames leaves the data at
    `.__old__` and no live `path`; entry must restore it (and clear any
    stale `.__compact__`) instead of failing every subsequent run."""
    import glob
    import os

    from pyspark.sql import functions as F

    from i2o_transform_spark.sources.tables import compact_parquet

    path = str(tmp_path / "t")
    spark.range(1_000).withColumn("v", F.col("id") * 3).repartition(
        4
    ).write.parquet(path)
    want = spark.read.parquet(path).agg(F.sum("id"), F.sum("v")).first()

    # Simulate the crash window: data moved to .__old__, new layout half
    # staged at .__compact__, nothing at `path`.
    os.rename(path, path + ".__old__")
    os.makedirs(path + ".__compact__")
    with open(os.path.join(path + ".__compact__", "part-junk.tmp"), "w") as f:
        f.write("partial")

    stats = compact_parquet(spark, path, target_file_bytes=10**9)
    got = spark.read.parquet(path).agg(F.sum("id"), F.sum("v")).first()
    assert tuple(got) == tuple(want)
    assert stats["files_after"] == 1
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__compact__")

    # Debris ALONGSIDE a live path (crash before first rename) is discarded.
    os.makedirs(path + ".__old__")
    stats2 = compact_parquet(spark, path, target_file_bytes=10**9)
    assert stats2["files_after"] == 1
    assert not os.path.exists(path + ".__old__")
    assert glob.glob(os.path.join(path, "*.parquet"))


def test_compact_parquet_rejects_hive_partitioned(spark, tmp_path):
    """ADVICE r02: partitioned layouts must be rejected, not silently
    flattened into one file with total=0 sizing."""
    import pytest
    from pyspark.sql import functions as F

    from i2o_transform_spark.sources.tables import compact_parquet

    path = str(tmp_path / "part")
    spark.range(100).withColumn("k", F.col("id") % 3).write.partitionBy(
        "k"
    ).parquet(path)
    with pytest.raises(ValueError, match="Hive-partitioned"):
        compact_parquet(spark, path)
    # untouched input still reads back
    assert spark.read.parquet(path).count() == 100


def test_zorder_by_preserves_user_z_column(spark):
    """ADVICE r02: a user column literally named `_z` must survive
    zorder_by instead of being clobbered by the temp Morton column."""
    from pyspark.sql import functions as F

    from i2o_transform_spark.functions.zorder import zorder_by

    df = spark.range(100).select(
        F.col("id").alias("x"),
        (F.col("id") * 7 % 100).alias("y"),
        (F.col("id") + 42).alias("_z"),
    )
    out = zorder_by(df, ["x", "y"], num_partitions=4)
    assert set(out.columns) == {"x", "y", "_z"}
    rows = {r["x"]: r["_z"] for r in out.collect()}
    assert rows[0] == 42 and rows[99] == 141 and len(rows) == 100


def test_drug_era_composed_descendants_collapse(spark):
    """W4 golden (round-3): ancestor rollup INSIDE era merge
    (MSSQL/OMOPLoader.sql:1567-1630).  Overlapping exposures of DIFFERENT
    descendant drugs of ONE ingredient must collapse to a single era whose
    exposure_count counts exposure rows (dedup-across-descendants), while a
    >30-day gap still splits eras and a different ingredient stays apart."""
    import datetime as dt

    from pyspark.sql import functions as F

    from i2o_transform_spark.operators.intervals import merge_intervals

    D = dt.date
    # closure: drugs 101,102 -> ingredient A; drug 201 -> ingredient B
    closure = spark.createDataFrame(
        [(101, "A"), (102, "A"), (201, "B")], "descendant long, ingredient string"
    )
    exposures = spark.createDataFrame(
        [
            # person 1: two DIFFERENT descendants of A, overlapping -> 1 era
            (1, 101, D(2020, 1, 1), D(2020, 1, 20)),
            (1, 102, D(2020, 1, 10), D(2020, 2, 5)),
            # within 30-day pad of the chain end -> same era (3rd exposure)
            (1, 101, D(2020, 3, 5), D(2020, 3, 9)),
            # >30-day gap -> second era
            (1, 102, D(2020, 6, 1), D(2020, 6, 10)),
            # same window but ingredient B -> its own era
            (1, 201, D(2020, 1, 5), D(2020, 1, 25)),
        ],
        "person_id long, drug_id long, start_date date, end_date date",
    )
    rolled = exposures.join(
        F.broadcast(closure), exposures.drug_id == closure.descendant
    ).select("person_id", "ingredient", "start_date", "end_date")
    eras = merge_intervals(rolled, ["person_id", "ingredient"], gap_days=30)
    got = {
        (r["person_id"], r["ingredient"], r["era_start"], r["era_end"]): r["era_count"]
        for r in eras.collect()
    }
    assert got == {
        (1, "A", D(2020, 1, 1), D(2020, 3, 9)): 3,
        (1, "A", D(2020, 6, 1), D(2020, 6, 10)): 1,
        (1, "B", D(2020, 1, 5), D(2020, 1, 25)): 1,
    }


def test_lm_quality_stupid_backoff_golden(spark):
    """Hand-computed stupid-backoff scores on a 3-doc corpus: trigram hit,
    bigram backoff (0.4), unigram backoff (0.16), OOV zero — exact
    integer-quantized values."""
    from i2o_transform_spark.operators.lm import (
        lm_quality_score,
        train_ngram_counts,
    )

    ref = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e")], "doc_id long, text string"
    )
    # train counts: c3(a,b,c)=2, c2(a,b)=2, (b,c)=2, (c,d)=1, (c,e)=1
    # unigrams: a2 b2 c2 d1 e1, N=8
    counts = train_ngram_counts(ref)
    assert counts["total"] == 8

    target = spark.createDataFrame(
        [
            (10, "a b c"),    # trigram hit: (2*1e6) div c2p(a,b)=2 -> 1_000_000
            (11, "x b c"),    # no trigram (x,b,c); bigram (b,c)=2, c1p(b)=2
                              #   -> (4 * ((2*1e6) div 2)) div 10 = 400_000
            (12, "x y c"),    # no tri, no bigram (y,c); unigram c=2, N=8
                              #   -> (16 * ((2*1e6) div 8)) div 100 = 40_000
            (13, "x y z"),    # fully OOV -> 0
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_trigrams, r.score_sum, r.avg_q)
        for r in lm_quality_score(target, counts).collect()
    }
    assert got == {
        10: (1, 1_000_000, 1_000_000),
        11: (1, 400_000, 400_000),
        12: (1, 40_000, 40_000),
        13: (1, 0, 0),
    }


def test_line_dedup_boilerplate_and_duplicates(spark):
    """Hand-checked line election: a boilerplate line shared by three docs
    survives only in the first (doc 1, line 0); a fully-duplicated doc keeps
    nothing; unique prose survives; n_lines counts chunks of 4 tokens."""
    from i2o_transform_spark.operators.dedup import line_dedup

    boiler = "accept all cookies now"
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique prose one here"),
            (2, boiler + " different words entirely again"),
            (3, boiler + " unique prose one here"),  # full dup of doc 1
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_lines, r.n_kept, r.clean_md5)
        for r in line_dedup(docs, tokens_per_line=4).collect()
    }
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[1] == (2, 2, md5(boiler + "\nunique prose one here"))
    assert out[2] == (2, 1, md5("different words entirely again"))
    assert out[3] == (2, 0, md5(""))


def test_line_dedup_within_doc_repeat(spark):
    """A line repeated INSIDE one doc keeps only its first occurrence."""
    from i2o_transform_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(7, "x y x y z w")], "doc_id long, text string"
    )
    rows = line_dedup(docs, tokens_per_line=2).collect()
    assert rows[0].n_lines == 3 and rows[0].n_kept == 2  # 'x y' dup dropped


def test_semantic_dedup_planted_pairs(spark):
    """Planted exact duplicates in orthogonal-ish clusters: pairs found via
    the cell-blocked path equal the exact pair set; survivors drop the
    higher id of each duplicate pair."""
    import numpy as np

    from i2o_transform_spark.operators.similarity import (
        semantic_dedup_pairs,
        semantic_dedup_survivors,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16)).astype(float)
    rows = [(i, base[i].tolist()) for i in range(20)]
    rows += [(100 + i, base[i].tolist()) for i in range(0, 20, 4)]  # 5 dups
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(corpus, tau=0.99, n_centroids=4).collect()
    }
    assert pairs == {(i, 100 + i) for i in range(0, 20, 4)}
    kept = {
        r.vec_id
        for r in semantic_dedup_survivors(corpus, tau=0.99, n_centroids=4).collect()
    }
    assert kept == set(range(20))


def test_personalized_pagerank_vs_numpy(spark):
    """PPR (restart to seeds, dangling mass to seeds) matches a dense numpy
    reference to 1e-9; mass conserved; unreachable nodes get exactly 0."""
    import numpy as np

    from i2o_transform_spark.operators.graph import personalized_pagerank

    # 5 covers the seed-reachable component {0,1,2,3}; node 4 only POINTS
    # into it (unreachable FROM the seeds -> rank 0); 3 dangles.
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 0), (4, 3)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")

    K, d, n = 12, 0.85, 5
    got = {
        r.node: r.rank
        for r in personalized_pagerank(
            edges, seeds, iterations=K, damping=d
        ).collect()
    }
    A = np.zeros((n, n))
    for s, t in edge_list:
        A[t, s] = 1.0
    out = A.sum(axis=0)
    P = np.zeros((n, n))
    np.divide(A, out, out=P, where=out > 0)
    t_vec = np.zeros(n)
    t_vec[[0, 1]] = 0.5
    r = t_vec.copy()
    for _ in range(K):
        dang = r[out == 0].sum()
        r = (1 - d) * t_vec + d * (P @ r + dang * t_vec)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])
    assert got[4] == 0.0


def test_biased_walks_second_order_classes(spark):
    """node2vec-style election: with return_cost=9 the walker never
    backtracks when an alternative exists; with inout_cost>1 a
    triangle-closing (distance-1) candidate beats every distance-2
    candidate regardless of hash order; elections match a pure-Python
    replication of the composite key on every step."""
    import hashlib

    from i2o_transform_spark.operators.graph import biased_walks

    # path a-b with a triangle b-c-a and a distance-2 tail b-d-e
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("d", "e")]
    und = edges + [(y, x) for x, y in edges]
    df = spark.createDataFrame(und, "src string, dst string").repartition(7)
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        (r["walk_id"], r["step"]): r["node"]
        for r in biased_walks(df, seeds, length=3).collect()
    }

    adj: dict = {}
    for x, y in und:
        adj.setdefault(x, set()).add(y)

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    # python replication
    prev, cur = None, "a"
    walk = {("a", 0): "a"}
    for t in range(1, 4):
        cands = sorted(adj[cur])
        if t == 1:
            nxt = min(cands, key=lambda w: md5(f"{cur}:{t}:{w}"))
        else:
            def key(w):
                c = 9 if w == prev else (1 if w in adj[prev] else 3)
                return f"{c}:{md5(f'{cur}:{t}:{w}')}:{w}"
            nxt = min(cands, key=key)
        walk[("a", t)] = nxt
        prev, cur = cur, nxt
    assert got == walk
    # step 1 from 'a' lands on b or c by hash; at the following step the
    # distance-1 triangle move must be taken and backtracking avoided
    s1, s2 = got[("a", 1)], got[("a", 2)]
    assert s2 != "a" or sorted(adj[s1]) == ["a"]
    if s1 == "b":
        assert s2 == "c"          # triangle (cost 1) beats d (cost 3)
    # determinism across partitionings
    again = {
        (r["walk_id"], r["step"]): r["node"]
        for r in biased_walks(df.repartition(2), seeds, length=3).collect()
    }
    assert again == got


def test_biased_walks_cost_contract(spark):
    import pytest as _pytest

    from i2o_transform_spark.operators.graph import biased_walks

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    with _pytest.raises(ValueError, match="single digit"):
        biased_walks(df, seeds, length=2, return_cost=10)


def test_lpa_communities_split_vs_cc(spark):
    """Two 6-cliques + a bridge: CC reports ONE component, LPA splits at
    the sparse cut; deterministic across partitionings; early exit."""
    from i2o_transform_spark.operators.graph import (
        label_propagation_communities,
    )

    cl_a = [(f"a{i}", f"a{j}") for i in range(6) for j in range(i + 1, 6)]
    cl_b = [(f"b{i}", f"b{j}") for i in range(6) for j in range(i + 1, 6)]
    edges = spark.createDataFrame(
        cl_a + cl_b + [("a0", "b0")], "src string, dst string"
    )
    got = {r["node"]: r["community"]
           for r in label_propagation_communities(edges).collect()}
    assert got == {f"a{i}": "a0" for i in range(6)} | \
                  {f"b{i}": "b0" for i in range(6)}
    # CC would merge everything (contrast)
    roots = {r.node: r.root
             for r in label_propagation_components(edges).collect()}
    assert len(set(roots.values())) == 1
    # partitioning invariance
    got2 = {r["node"]: r["community"]
            for r in label_propagation_communities(
                edges.repartition(5)).collect()}
    assert got2 == got


def test_lpa_communities_plurality_beats_id_order(spark):
    """A node bridged to a clique with SMALLER ids still joins its own
    denser side: plurality wins over lexicographic pull."""
    from i2o_transform_spark.operators.graph import (
        label_propagation_communities,
    )

    # clique z0..z4 (large ids), clique a0..a2 (small ids), bridge z0-a0
    cl_z = [(f"z{i}", f"z{j}") for i in range(5) for j in range(i + 1, 5)]
    cl_a = [(f"a{i}", f"a{j}") for i in range(3) for j in range(i + 1, 3)]
    edges = spark.createDataFrame(
        cl_z + cl_a + [("z0", "a0")], "src string, dst string"
    )
    got = {r["node"]: r["community"]
           for r in label_propagation_communities(edges).collect()}
    assert all(got[f"z{i}"] == "z0" for i in range(5))
    assert all(got[f"a{i}"] == "a0" for i in range(3))


def test_ktruss_cascade_and_bounds(spark):
    """Triangle strip cascades to empty at k=4 (each removal erodes the
    next edge's support — the fixpoint matters); clique survives up to
    its truss number and vanishes past it; k<3 contract."""
    from i2o_transform_spark.operators.graph import k_truss

    strip = spark.createDataFrame(
        [(i, i + 1) for i in range(5)] + [(i, i + 2) for i in range(4)],
        "src long, dst long",
    )
    # interior edges start at support 2 but boundary peeling cascades
    assert k_truss(strip, k=4).count() == 0
    assert k_truss(strip, k=3).count() > 0      # every edge in a triangle

    clique6 = spark.createDataFrame(
        [(i, j) for i in range(6) for j in range(i + 1, 6)],
        "src long, dst long",
    )
    got = k_truss(clique6, k=6)
    assert got.count() == 15
    assert all(r["support"] == 4 for r in got.collect())
    assert k_truss(clique6, k=7).count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k >= 3"):
        k_truss(clique6, k=2)


def test_ktruss_bridge_and_pendant_pruned(spark):
    from i2o_transform_spark.operators.graph import k_truss

    clique5 = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    extra = [("c0", "p0"), ("p0", "p1"), ("p1", "p2"), ("p0", "p2")]
    df = spark.createDataFrame(clique5 + extra, "src string, dst string")
    surv = {(r["a"], r["b"]) for r in k_truss(df, k=4).collect()}
    assert surv == {(f"c{i}", f"c{j}")
                    for i in range(5) for j in range(i + 1, 5)}


def test_weighted_pagerank_vs_numpy(spark):
    """pagerank_converged(weight=) matches a dense numpy weighted power
    iteration; parallel (src, dst) rows sum their weights; uniform
    weights equal the unweighted fixpoint."""
    import numpy as np

    from i2o_transform_spark.operators.graph import pagerank_converged

    # weighted digraph with a dangling node (3) and a parallel edge
    # (0->1 appears twice: 1.5 + 0.5 == one edge of weight 2)
    rows = [(0, 1, 1.5), (0, 1, 0.5), (0, 2, 1.0), (1, 2, 4.0),
            (2, 0, 1.0), (2, 3, 3.0), (4, 0, 2.0), (4, 3, 6.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, w double")
    got_df, iters = pagerank_converged(
        edges, tol=1e-12, src="src", dst="dst", weight="w"
    )
    got = {r.node: r.rank for r in got_df.collect()}

    n, d = 5, 0.85
    W = np.zeros((n, n))
    for s, t, w in rows:
        W[t, s] += w
    out = W.sum(axis=0)
    P = np.zeros((n, n))
    np.divide(W, out, out=P, where=out > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (P @ r + dang / n)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-8, (i, got[i], r[i])

    # uniform weights == unweighted
    plain, _ = pagerank_converged(
        edges.select("src", "dst"), tol=1e-12, src="src", dst="dst"
    )
    uni, _ = pagerank_converged(
        edges.select("src", "dst").distinct().withColumn("w", F.lit(3.0)),
        tol=1e-12, src="src", dst="dst", weight="w",
    )
    p = {r.node: r.rank for r in plain.collect()}
    u = {r.node: r.rank for r in uni.collect()}
    assert all(abs(p[k] - u[k]) < 1e-9 for k in p)
