"""Streaming — deliberately out of scope.

The reference is strictly batch full-refresh (SURVEY.md §2.9: no watermarks,
no incremental state; `OMOPclear` + reload, MSSQL/run.sql:21-23).  The
north_rule's "resumable from checkpoint" is *batch* checkpointing —
stage-manifest markers + idempotent overwrites (plans/runner.py) — not a
Structured Streaming state store.

If an incremental ingest path is ever needed, the natural shape is
readStream over the pages table's append log -> the same stage functions
(they are pure DataFrame -> DataFrame) -> foreachBatch(write_table), because
every operator in this engine is expressible over micro-batches.
"""
