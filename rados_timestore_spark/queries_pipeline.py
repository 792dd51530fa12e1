"""Cross-family pipeline compositions: end-to-end corpus curation.

The individual operators (text filters, exact dedup, semantic dedup)
are each driver-checked in their own families; this module composes
them into the single retention decision an LLM training-data pipeline
actually materializes — and keeps the composition hash-checkable by
composing the SAME oracle SQL the parts are checked against (each
part's oracle rides as a derived-table subquery, so the composed
oracle can never drift from the parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Importing the part modules registers them AND exposes their oracle
# strings for composition (registry import order puts this module
# last, so these are idempotent re-imports).
from rados_timestore_spark import queries_similarity, queries_text  # noqa: F401
from rados_timestore_spark.queries_common import load_parallel
from rados_timestore_spark.queries_similarity import dedup_semantic
from rados_timestore_spark.queries_text import (
    _filter_pipeline_sql,
    text_filter_pipeline,
)
from rados_timestore_spark.registry import QUERIES, register

_SEM_SQL = QUERIES["dedup_semantic"].oracle


@register(
    "pipeline_corpus_curation",
    oracle=f"""
WITH fp AS (SELECT doc_id, reason AS fp_reason
            FROM ({_filter_pipeline_sql()}) t),
sem AS (SELECT vec_id AS doc_id, keep AS sem_keep
        FROM ({_SEM_SQL}) t),
ex AS (SELECT doc_id,
              min(doc_id) OVER (PARTITION BY md5(text)) AS rep
       FROM documents)
SELECT d.doc_id,
       CASE WHEN fp.fp_reason <> 'kept' THEN 'filtered_' || fp.fp_reason
            WHEN ex.rep <> d.doc_id THEN 'exact_dup'
            WHEN sem.sem_keep = 0 THEN 'semantic_dup'
            ELSE 'kept' END AS reason,
       CASE WHEN fp.fp_reason = 'kept' AND ex.rep = d.doc_id
             AND sem.sem_keep = 1 THEN 1 ELSE 0 END AS keep
FROM documents d
JOIN fp ON fp.doc_id = d.doc_id
JOIN sem ON sem.doc_id = d.doc_id
JOIN ex ON ex.doc_id = d.doc_id
""",
    tags=("pipeline", "dedup", "text"),
    priority=90,  # promoted very-late-r5 for first driver evidence (swapped in for an r3-green re-promotion)
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end curation decision: per document, ordered
    first-fail attribution across the three retention stages a
    training pipeline runs — quality filters (text_filter_pipeline's
    reason), exact dedup (md5 group representative), semantic dedup
    (dedup_semantic's cluster representative; documents pair 1:1 with
    embeddings by id in the fixture) — plus the final keep bit.  Each
    stage reuses the registered operator's own plan AND its own oracle
    SQL (as a subquery), so the composition is exactly as verified as
    its parts.  At 100 TB every join here is id-keyed and
    co-partitionable; the expensive stage (semantic dedup's LSH + CC)
    is shared work a real pipeline materializes once."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    fp = text_filter_pipeline(spark, sf_dir).select(
        "doc_id", F.col("reason").alias("fp_reason"))
    sem = dedup_semantic(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("keep").alias("sem_keep"))
    from pyspark.sql import Window
    ex = docs.select(
        "doc_id",
        F.min("doc_id").over(
            Window.partitionBy(F.md5("text"))).alias("rep"),
    )
    j = (
        docs.select("doc_id")
        .join(fp, "doc_id").join(sem, "doc_id").join(ex, "doc_id")
    )
    reason = (
        F.when(F.col("fp_reason") != "kept",
               F.concat(F.lit("filtered_"), F.col("fp_reason")))
        .when(F.col("rep") != F.col("doc_id"), "exact_dup")
        .when(F.col("sem_keep") == 0, "semantic_dup")
        .otherwise("kept")
    )
    return j.select(
        "doc_id", reason.alias("reason"),
        F.when(reason == "kept", 1).otherwise(0).alias("keep"),
    )
