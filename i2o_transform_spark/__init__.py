"""i2o_transform_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of
i2b2-omop/i2o-transform (an ontology-driven schema-mapping ETL written as SQL
stored procedures) as an idiomatic PySpark pipeline:

* EAV fact scan + dictionary (ontology) broadcast joins  -> mention detection
* OMOP concept/'Maps to' two-hop vocabulary graph joins  -> entity/predicate
  canonical mapping (crosswalk compile)
* modifier reassembly / domain-routing CASE              -> qualifier assembly
  + predicate-domain routing
* DISTINCT + anti-join dedup, era interval merge         -> triple dedup +
  connected-component canonicalization
* i2oreport count reconciliation                         -> per-stage lineage
  and metrics tables

Reference semantics are cited per-function as ``/root/reference/<path>:<line>``.
Nothing is copied from the reference; it is a T-SQL/PLSQL system and this is a
Spark-first design (DataFrame API, Catalyst optimization, broadcast/salted
joins, Arrow-vectorized pandas UDFs).
"""

__version__ = "0.1.0"
