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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Importing the part modules registers them AND exposes their oracle
# strings for composition (registry import order puts this module
# last, so these are idempotent re-imports).
from rados_timestore_spark import queries_similarity, queries_text  # noqa: F401
from rados_timestore_spark.queries_common import load_parallel
from rados_timestore_spark.queries_similarity import dedup_semantic
from rados_timestore_spark.queries_text import (
    _WORDS_SQL,
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
sem AS (SELECT vec_id AS doc_id, cluster_rep
        FROM ({_SEM_SQL}) t),
base AS (
  SELECT d.doc_id, fp.fp_reason,
         CASE WHEN fp.fp_reason = 'kept' THEN 1 ELSE 0 END AS fp_keep,
         md5(trim(lower(d.text))) AS ck, sem.cluster_rep
  FROM documents d
  JOIN fp ON fp.doc_id = d.doc_id
  JOIN sem ON sem.doc_id = d.doc_id),
ex AS (
  SELECT *, min(CASE WHEN fp_keep = 1 THEN doc_id END)
              OVER (PARTITION BY ck) AS ex_surv
  FROM base),
s2 AS (
  SELECT *, CASE WHEN fp_keep = 1 AND doc_id = ex_surv
                 THEN 1 ELSE 0 END AS exact_keep
  FROM ex),
s3 AS (
  SELECT *, min(CASE WHEN exact_keep = 1 THEN doc_id END)
              OVER (PARTITION BY cluster_rep) AS sem_surv
  FROM s2)
SELECT doc_id,
       CASE WHEN fp_keep = 0 THEN 'filtered_' || fp_reason
            WHEN doc_id <> ex_surv THEN 'exact_dup'
            WHEN doc_id <> sem_surv THEN 'semantic_dup'
            ELSE 'kept' END AS reason,
       CASE WHEN fp_keep = 1 AND doc_id = ex_surv AND doc_id = sem_surv
            THEN 1 ELSE 0 END AS keep
FROM s3
""",
    tags=("pipeline", "dedup", "text"),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end curation decision: per document, ordered
    first-fail attribution across the three retention stages a
    training pipeline runs — quality filters (text_filter_pipeline's
    reason), exact dedup (md5(trim(lower(text))) — the SAME
    normalization as the registered dedup_exact operator), semantic
    dedup (dedup_semantic's clusters; documents pair 1:1 with
    embeddings by id in the fixture) — plus the final keep bit.

    Stages are SURVIVOR-AWARE, like a real pipeline: each dedup stage
    elects its representative among the docs that survived the
    previous stages (min doc_id over the group restricted to
    survivors), so filtering one copy of duplicated content never
    drops the content entirely — the surviving copy inherits
    representative status (r5 review finding: the naive global-
    representative composition could lose every copy).

    The quality and semantic stages reuse the registered operators'
    own plans AND oracle SQL (as subqueries); the exact stage inlines
    only the survivor-restricted window over the shared content key.
    At 100 TB every join here is id-keyed and co-partitionable; the
    expensive stage (semantic dedup's LSH + CC) is shared work a real
    pipeline materializes once."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    fp = text_filter_pipeline(spark, sf_dir).select(
        "doc_id", F.col("reason").alias("fp_reason"))
    sem = dedup_semantic(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "cluster_rep")
    base = (
        docs.select(
            "doc_id",
            F.md5(F.trim(F.lower(F.col("text")))).alias("ck"),
        )
        .join(fp, "doc_id").join(sem, "doc_id")
        .withColumn(
            "fp_keep",
            F.when(F.col("fp_reason") == "kept", 1).otherwise(0))
    )
    ex_surv = F.min(
        F.when(F.col("fp_keep") == 1, F.col("doc_id"))
    ).over(Window.partitionBy("ck"))
    s2 = base.withColumn("ex_surv", ex_surv).withColumn(
        "exact_keep",
        F.when((F.col("fp_keep") == 1)
               & (F.col("doc_id") == F.col("ex_surv")), 1).otherwise(0))
    sem_surv = F.min(
        F.when(F.col("exact_keep") == 1, F.col("doc_id"))
    ).over(Window.partitionBy("cluster_rep"))
    s3 = s2.withColumn("sem_surv", sem_surv)
    reason = (
        F.when(F.col("fp_keep") == 0,
               F.concat(F.lit("filtered_"), F.col("fp_reason")))
        .when(F.col("doc_id") != F.col("ex_surv"), "exact_dup")
        .when(F.col("doc_id") != F.col("sem_surv"), "semantic_dup")
        .otherwise("kept")
    )
    return s3.select(
        "doc_id", reason.alias("reason"),
        F.when((F.col("fp_keep") == 1)
               & (F.col("doc_id") == F.col("ex_surv"))
               & (F.col("doc_id") == F.col("sem_surv")), 1)
        .otherwise(0).alias("keep"),
    )


_CURATION_SQL = QUERIES["pipeline_corpus_curation"].oracle
_WORDS_ON_D = _WORDS_SQL.replace("text", "d.text")


@register(
    "pipeline_curated_packing",
    oracle=f"""
WITH cur AS (
  SELECT doc_id FROM ({_CURATION_SQL}) t
  WHERE keep = 1),
toks AS (
  SELECT d.doc_id, len({_WORDS_ON_D}) AS n_tok
  FROM documents d JOIN cur ON cur.doc_id = d.doc_id),
cum AS (
  SELECT doc_id, n_tok,
         sum(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - n_tok AS cum_before
  FROM toks)
SELECT CAST(cum_before // 512 AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       CAST(sum(CASE WHEN (cum_before + n_tok - 1) // 512
                          > cum_before // 512
                THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
FROM cum GROUP BY 1
""",
    tags=("pipeline", "text", "llm"),
    priority=900,  # demoted in r11 after r10 driver green, to rotate the r10/r9 carve-out backlog into the window (verified locally by tools/check_correctness.py)
)
def pipeline_curated_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialization step AFTER the retention decision: pack
    only the documents :func:`pipeline_corpus_curation` kept (quality
    filters + exact dedup + semantic dedup survivors) into 512-token
    context windows, with the same concat-and-chunk semantics and
    per-bin report as ``text_pack_sequences``.  This is the actual
    training-shard writer's plan — curation feeds packing in ONE
    lineage, no intermediate table — and the oracle composes the
    curation oracle as a subquery, so the composition can never
    drift from the stage it builds on.

    Scale: the curation stages are id-keyed joins/windows (see
    pipeline_corpus_curation); packing adds one per-row token count
    and the one global cumulative window that concat-and-chunk
    requires (per-shard in production, global here so the oracle
    stays exact)."""
    from rados_timestore_spark.queries_text import _words_col

    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    kept = (pipeline_corpus_curation(spark, sf_dir)
            .filter(F.col("keep") == 1).select("doc_id"))
    toks = (
        docs.join(kept, "doc_id")
        .select("doc_id", F.size(_words_col()).alias("n_tok"))
    )
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.select(
        "doc_id", "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("cum_before"),
    )
    return cum.groupBy(
        F.expr("cum_before div 512").alias("bin_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum(
            F.when(
                F.expr("(cum_before + n_tok - 1) div 512")
                > F.expr("cum_before div 512"), 1
            ).otherwise(0)
        ).cast("long").alias("n_boundary_docs"),
    )
