"""Text-analysis operators over the ``documents`` table — the
language-ID / quality / token-count / fingerprint family a large-scale
training-data pipeline needs (BASELINE.json north star).

All hot-path computation uses built-in ``pyspark.sql.functions``
(split/regexp/array ops — JVM-side, codegen'd, no Python UDFs); the
DuckDB oracles use the matching list/regexp functions.  Cross-engine
hashing is md5 (bit-identical everywhere); 60-bit integer fingerprints
come from the first 15 hex digits (fits signed i64).

Scale notes (100 TB of documents): every query here is a single scan +
hash aggregate or per-row projection — no joins, no windows over the
full corpus; explode-based word statistics shuffle only (token, 1)
pairs after map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rados_timestore_spark.queries_common import load, load_parallel, pin
from rados_timestore_spark.core import one_slice_df
from rados_timestore_spark.registry import register

#: Tiny per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic (alphabetical language order = tie-break).
STOPWORDS = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "los", "las", "y", "es", "no", "una"),
    "fr": ("le", "les", "des", "et", "est", "pas", "une"),
}

#: BPE-ish tokenizer: letter runs, digit runs, single punctuation.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

_WORDS_SQL = "regexp_split_to_array(trim(lower(text)), '\\s+')"


def _words_col():
    return F.split(F.trim(F.lower(F.col("text"))), "\\s+")


@register(
    "text_stats",
    oracle=f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(len({_WORDS_SQL})) AS BIGINT) AS sum_words,
       CAST(sum(len(list_distinct({_WORDS_SQL}))) AS BIGINT)
         AS sum_distinct_words,
       max(len({_WORDS_SQL})) AS max_words
FROM documents GROUP BY lang
""",
    tags=("text",),
    bench=True,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language: doc/char/word/vocabulary counts
    in one scan + 5-group hash aggregate."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    w = _words_col()
    d = docs.select(
        "lang", "n_chars",
        F.size(w).alias("nw"),
        F.size(F.array_distinct(w)).alias("ndw"),
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("nw").alias("sum_words"),
        F.sum("ndw").alias("sum_distinct_words"),
        F.max("nw").alias("max_words"),
    )


@register(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens,
       len({_WORDS_SQL}) AS n_words,
       n_chars
FROM documents
""",
    tags=("text",),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex (letter runs / digit runs /
    punctuation singletons) next to whitespace word counts — the cost
    model a training pipeline budgets by."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                    F.lit(TOKEN_RE), 0)).alias("n_tokens"),
        F.size(_words_col()).alias("n_words"),
        "n_chars",
    )


def _langid_sql() -> str:
    scores = []
    for lang, words in sorted(STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        scores.append(
            f"len(list_intersect(list_distinct({_WORDS_SQL}), [{lst}]))"
            f" AS s_{lang}"
        )
    whens = " ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in sorted(STOPWORDS)
    )
    return f"""
WITH scored AS (SELECT doc_id, lang, {", ".join(scores)} FROM documents),
     top AS (SELECT *, greatest(s_de, s_en, s_es, s_fr) AS m FROM scored)
SELECT lang, CASE {whens} END AS pred_lang, count(*) AS n
FROM top GROUP BY lang, pred_lang
"""


@register(
    "text_lang_id", oracle=_langid_sql(), tags=("text",),
    priority=900,  # demoted in r14 after r13 driver green, to rotate the r13 certificate + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: score = |distinct words ∩ profile|
    per language, argmax with alphabetical tie-break; confusion counts
    against the labeled ``lang`` column."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    w = F.array_distinct(_words_col())
    scored = docs.select(
        "doc_id", "lang",
        *[
            F.size(F.array_intersect(w, F.array(*[F.lit(x) for x in words])))
                .alias(f"s_{lang}")
            for lang, words in sorted(STOPWORDS.items())
        ],
    )
    m = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(STOPWORDS)])
    expr = None
    for lang in sorted(STOPWORDS):
        cond = F.col(f"s_{lang}") == m
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return (
        scored.withColumn("m", m)
        .withColumn("pred_lang", expr)
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "text_quality_score",
    oracle=f"""
SELECT doc_id,
       len({_WORDS_SQL}) AS n_words,
       length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
         AS n_punct,
       len(list_intersect(list_distinct({_WORDS_SQL}),
           ['the','a','of','and','to','in','is'])) AS n_stop,
       CASE WHEN len({_WORDS_SQL}) >= 40
             AND len(list_intersect(list_distinct({_WORDS_SQL}),
                 ['the','a','of','and','to','in','is'])) >= 2
            THEN 'high'
            WHEN len({_WORDS_SQL}) >= 15 THEN 'medium'
            ELSE 'low' END AS quality
FROM documents
""",
    tags=("text",),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length / punctuation / stopword
    signals -> bucket), the usual pre-training corpus filter."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    w = _words_col()
    stop = F.array(*[F.lit(x) for x in STOPWORDS["en"]])
    d = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[.,!?;:]", ""))
        ).alias("n_punct"),
        F.size(F.array_intersect(F.array_distinct(w), stop)).alias("n_stop"),
    )
    quality = (
        F.when((F.col("n_words") >= 40) & (F.col("n_stop") >= 2), "high")
        .when(F.col("n_words") >= 15, "medium")
        .otherwise("low")
    )
    return d.withColumn("quality", quality)


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       ('0x' || substr(md5(trim(lower(text))), 1, 15))::BIGINT AS fp,
       substr(md5(trim(lower(text))), 1, 8) AS fp_hex
FROM documents
""",
    tags=("text",),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 60-bit integer fingerprint from the
    md5 of the normalized text (Spark ``conv`` == DuckDB hex cast)."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    norm = F.trim(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")
            .alias("fp"),
        F.substring(F.md5(norm), 1, 8).alias("fp_hex"),
    )


@register(
    "text_word_freq",
    oracle=f"""
SELECT w, count(*) AS n, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents) t
GROUP BY w ORDER BY n DESC, w LIMIT 25
""",
    tags=("text",),
    bench=True,
)
def text_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: explode words, count term and document
    frequency, top-25 — the shuffle carries (word, partial-count)
    pairs only (map-side combine), then TakeOrdered."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    words = docs.select(
        "doc_id", F.explode(_words_col()).alias("w")
    )
    agg = words.groupBy("w").agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return agg.orderBy(F.desc("n"), "w").limit(25)


@register(
    "text_split_assign",
    oracle="""
SELECT CASE WHEN pct < 80 THEN 'train'
            WHEN pct < 90 THEN 'val' ELSE 'test' END AS split,
       source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT source, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 AS pct
  FROM documents) t
GROUP BY 1, 2
""",
    tags=("text", "pipeline"),
    priority=900,  # demoted in r14 after r13 driver green, to rotate the r13 certificate + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment — the split every
    training-data pipeline needs to be REPRODUCIBLE and join-free:
    ``md5(doc_id) mod 100`` buckets into 80/10/10, so any engine (or a
    later incremental run) assigns identically with zero coordination.
    One scan + hash aggregate; per (split, source) doc and char
    budgets fall out of the same pass."""
    docs = load(spark, sf_dir, "documents")
    pct = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long") % 100
    )
    split = (
        F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test")
    )
    return docs.groupBy(split.alias("split"), "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


#: Context-length bins for sequence packing (tokens per document,
#: whitespace tokenization — matches text_token_count's ws_tokens).
_PACK_BINS = (16, 32, 64, 128, 256)


@register(
    "text_length_buckets",
    oracle=f"""
SELECT bin, count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS sum_tokens,
       CAST(sum(CAST(bin AS BIGINT) - nt) AS BIGINT) AS padding_waste
FROM (
  SELECT len({_WORDS_SQL}) AS nt,
         CASE
           WHEN len({_WORDS_SQL}) <= 16 THEN 16
           WHEN len({_WORDS_SQL}) <= 32 THEN 32
           WHEN len({_WORDS_SQL}) <= 64 THEN 64
           WHEN len({_WORDS_SQL}) <= 128 THEN 128
           ELSE 256 END AS bin
  FROM documents) t
GROUP BY bin
""",
    tags=("text", "pipeline"),
    priority=900,  # demoted in r14 after r13 driver green, to rotate the r13 certificate + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing planner: bucket documents into context-length
    bins and report per-bin token totals + padding waste (bin - len
    summed) — the aggregate a packing scheduler reads before sharding
    a tokenization job.  Single scan, one small hash aggregate."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    nt = F.size(_words_col())
    bin_col = F.when(nt <= 16, 16).when(nt <= 32, 32) \
        .when(nt <= 64, 64).when(nt <= 128, 128).otherwise(256)
    d = docs.select(nt.alias("nt"), bin_col.alias("bin"))
    return d.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("sum_tokens"),
        F.sum(F.col("bin").cast("long") - F.col("nt"))
            .alias("padding_waste"),
    )


@register(
    "text_repetition",
    oracle="""
SELECT doc_id,
       CAST(GREATEST(len(ws) - 2, 0) AS BIGINT) AS total_3g,
       CAST(len(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                 for i in generate_series(1, len(ws)-2)])) AS BIGINT)
         AS distinct_3g,
       CASE WHEN len(ws) - 2 > 0
             AND len(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in generate_series(1, len(ws)-2)])) * 10
                 < (len(ws) - 2) * 7
            THEN 1 ELSE 0 END AS repetitive
FROM (SELECT doc_id, {words} AS ws FROM documents) t
""".format(words=_WORDS_SQL),
    tags=("text", "pipeline"),
    priority=900,  # demoted in r14 after r13 driver green, to rotate the r13 certificate + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per-document distinct-vs-total
    3-gram counts and a ``repetitive`` flag when fewer than 70% of a
    doc's trigrams are distinct (heavy internal repetition is a
    classic low-quality-training-text signal).  Pure built-in array
    expressions, one scan, no shuffle at all; the threshold is an
    integer cross-multiplication."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    ws = _words_col()
    total = F.greatest(F.size(ws) - 2, F.lit(0)).cast("long")
    # Guarded: for docs with < 3 words, sequence(1, 0) yields the
    # DESCENDING [1, 0] in Spark and slice(ws, 0, 3) throws
    # INVALID_PARAMETER_VALUE.START (r5 code-review finding; the
    # fixture's shortest doc masks it but real corpora don't).
    tri = F.expr(
        "CASE WHEN size(split(trim(lower(text)), '\\\\s+')) >= 3 THEN "
        "transform(sequence(1, size(split(trim(lower(text)), "
        "'\\\\s+')) - 2), i -> concat_ws(' ', "
        "slice(split(trim(lower(text)), '\\\\s+'), i, 3))) "
        "ELSE cast(array() as array<string>) END"
    )
    distinct = F.size(F.array_distinct(tri)).cast("long")
    repetitive = F.when(
        (total > 0) & (distinct * 10 < total * 7), 1
    ).otherwise(0)
    return docs.select(
        "doc_id",
        total.alias("total_3g"),
        distinct.alias("distinct_3g"),
        repetitive.alias("repetitive"),
    )


def _filter_pipeline_sql() -> str:
    """Oracle for text_filter_pipeline: same ordered first-fail rules
    over the same signals, stopword coverage = max across the four
    language profiles (language-agnostic)."""
    lists = [
        "[" + ", ".join(f"'{w}'" for w in words) + "]"
        for _lang, words in sorted(STOPWORDS.items())
    ]
    stops = ", ".join(
        f"len(list_intersect(dw, {lst})) AS s{i}"
        for i, lst in enumerate(lists)
    )
    return f"""
WITH base AS (
  SELECT doc_id, {_WORDS_SQL} AS ws,
         list_distinct({_WORDS_SQL}) AS dw
  FROM documents),
sig AS (
  SELECT doc_id, len(ws) AS n_words,
         GREATEST(len(ws) - 2, 0) AS total_3g,
         len(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
             for i in generate_series(1, len(ws)-2)])) AS distinct_3g,
         {stops}
  FROM base),
dec AS (
  SELECT doc_id, n_words,
         GREATEST(s0, s1, s2, s3) AS max_stop,
         CASE WHEN n_words < 15 THEN 'too_short'
              WHEN total_3g > 0 AND distinct_3g * 10 < total_3g * 7
                THEN 'repetitive'
              WHEN GREATEST(s0, s1, s2, s3) < 2 THEN 'no_stopwords'
              ELSE 'kept' END AS reason
  FROM sig)
SELECT doc_id, n_words, max_stop, reason,
       CASE WHEN reason = 'kept' THEN 1 ELSE 0 END AS keep
FROM dec
"""


@register(
    "text_filter_pipeline",
    oracle=_filter_pipeline_sql(),
    tags=("text", "pipeline"),
    priority=900,  # demoted in r14 after r13 driver green, to rotate the r13 certificate + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed retention decision a C4/Gopher-style training-data
    pipeline actually runs: per document, ordered first-fail rules —
    too short (< 15 words), internally repetitive (< 70% distinct
    trigrams), no stopword coverage in ANY language profile (< 2 hits
    across de/en/es/fr) — else kept.  One scan, all built-in array/
    string expressions (no UDF, no shuffle); at 100 TB this is a pure
    map stage whose output feeds the dedup/tokenize stages."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    ws = _words_col()
    dw = F.array_distinct(ws)
    # Guarded: for docs with < 3 words, sequence(1, 0) yields the
    # DESCENDING [1, 0] in Spark and slice(ws, 0, 3) throws
    # INVALID_PARAMETER_VALUE.START (r5 code-review finding; the
    # fixture's shortest doc masks it but real corpora don't).
    tri = F.expr(
        "CASE WHEN size(split(trim(lower(text)), '\\\\s+')) >= 3 THEN "
        "transform(sequence(1, size(split(trim(lower(text)), "
        "'\\\\s+')) - 2), i -> concat_ws(' ', "
        "slice(split(trim(lower(text)), '\\\\s+'), i, 3))) "
        "ELSE cast(array() as array<string>) END"
    )
    sig = docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.greatest(F.size(ws) - 2, F.lit(0)).alias("total_3g"),
        F.size(F.array_distinct(tri)).alias("distinct_3g"),
        F.greatest(*[
            F.size(F.array_intersect(
                dw, F.array(*[F.lit(x) for x in words])))
            for _lang, words in sorted(STOPWORDS.items())
        ]).alias("max_stop"),
    )
    reason = (
        F.when(F.col("n_words") < 15, "too_short")
        .when((F.col("total_3g") > 0)
              & (F.col("distinct_3g") * 10 < F.col("total_3g") * 7),
              "repetitive")
        .when(F.col("max_stop") < 2, "no_stopwords")
        .otherwise("kept")
    )
    return sig.select(
        "doc_id", "n_words", "max_stop", reason.alias("reason"),
        F.when(reason == "kept", 1).otherwise(0).alias("keep"),
    )


# ------------------------------------------ duplicated-span detection


_SPAN_N = 8  # word-gram width (the Lee et al. exact-substring scale,
#              shrunk to the fixture's ~35-word documents)


@register(
    "text_dup_spans",
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
g AS (
  SELECT doc_id, u.gram FROM w,
    UNNEST(list_transform(generate_series(1, len(ws) - {_SPAN_N - 1}),
           i -> array_to_string(list_slice(ws, i, i + {_SPAN_N - 1}),
                                ' '))) AS u(gram)
  WHERE len(ws) >= {_SPAN_N}),
occ AS (SELECT gram, count(*) AS n_occ FROM g GROUP BY gram),
per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         CAST(sum(CASE WHEN o.n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_grams
  FROM g JOIN occ o ON g.gram = o.gram
  GROUP BY g.doc_id)
SELECT doc_id, n_grams, dup_grams,
       CAST(dup_grams AS DOUBLE) / n_grams AS dup_frac
FROM per_doc
""",
    tags=("text", "dedup"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication fraction ("Deduplicating Training
    Data Makes Language Models Better", Lee et al. 2022, shrunk from
    50-token to 8-word spans for the fixture): every word
    8-gram occurrence is counted corpus-wide, and each
    document reports how much of it is covered by spans that occur
    >= 2 times anywhere (including intra-document repeats) — the
    memorization-risk metric that decides span-level scrubbing.

    Plan: one scan -> gram explode (built-in ``transform``/``slice``,
    no Python) -> hash aggregate on the gram -> one equi-join of
    (doc, gram) occurrences against gram counts -> per-doc aggregate.
    At 100 TB the gram key would be md5-packed to 8 bytes before the
    shuffle; the fixture keeps the raw string so the oracle join key
    is byte-identical."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    w = docs.select("doc_id", _words_col().alias("ws")).filter(
        F.size("ws") >= _SPAN_N
    )
    grams = w.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(ws) - {_SPAN_N - 1}), "
                f"i -> concat_ws(' ', slice(ws, i, {_SPAN_N})))"
            )
        ).alias("gram"),
    )
    occ = grams.groupBy("gram").agg(F.count("*").alias("n_occ"))
    per_doc = (
        grams.join(occ, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("n_occ") >= 2, 1).otherwise(0))
            .cast("long").alias("dup_grams"),
        )
    )
    return per_doc.select(
        "doc_id", "n_grams", "dup_grams",
        (F.col("dup_grams").cast("double") / F.col("n_grams"))
        .alias("dup_frac"),
    )


# --------------------------------------------------- PII scrubbing


#: Conservative patterns that parse AND match identically in Java
#: regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@register(
    "text_pii_scrub",
    oracle=f"""
WITH enriched AS (
  SELECT doc_id,
         substr(text, 1, 40) || ' contact user' || doc_id ||
         '@example.com or +1-555-' ||
         lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now' AS body
  FROM documents),
scrub AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS BIGINT)
           AS n_emails,
         CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS BIGINT)
           AS n_phones,
         regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>',
                                       'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS body
  FROM enriched)
SELECT doc_id, n_emails, n_phones, md5(body) AS scrub_hash
FROM scrub
""",
    tags=("text", "pipeline"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every training-data pipeline
    runs before tokenization: detect and replace email addresses and
    phone numbers, reporting per-document match counts and a hash of
    the scrubbed text.  The fixture corpus contains no PII, so the
    query FABRICATES it deterministically from fixture columns
    (doc_id-derived address + number appended to a text prefix) —
    identical in both engines — making the scrub itself, not a no-op,
    the thing the driver hash-checks.  Patterns are the RE2/Java-
    common subset (no backrefs/lookaround) so both engines match the
    same spans.  One scan, all codegen'd string expressions."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    body = F.concat(
        F.substring("text", 1, 40), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    enriched = docs.select("doc_id", body.alias("body"))
    scrubbed = F.regexp_replace(
        F.regexp_replace("body", _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>",
    )
    return enriched.select(
        "doc_id",
        F.size(F.regexp_extract_all("body", F.lit(_EMAIL_RE), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("body", F.lit(_PHONE_RE), 0))
        .cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrub_hash"),
    )


# ------------------------------------------ unigram surprisal scoring


@register(
    "text_unigram_surprisal",
    oracle=f"""
WITH w AS (
  SELECT doc_id, u.word FROM
    (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents) t,
    UNNEST(ws) AS u(word)
  WHERE len(ws) > 0 AND ws[1] <> ''),
freq AS (SELECT word, count(*) AS f FROM w GROUP BY word),
tot AS (SELECT count(*) AS n FROM w),
scored AS (
  SELECT w.doc_id,
         length(format('{{:b}}', (SELECT n FROM tot)))
           - length(format('{{:b}}', freq.f)) AS bits
  FROM w JOIN freq ON w.word = freq.word)
SELECT doc_id, count(*) AS n_words,
       CAST(sum(bits) AS BIGINT) AS sum_bits,
       CAST(sum(bits) AS DOUBLE) / count(*) AS avg_surprisal
FROM scored GROUP BY doc_id
""",
    tags=("text", "quality"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-surprisal quality score — the KenLM-perplexity stand-in
    a pipeline uses to rank documents by how "surprising" their words
    are under the corpus unigram distribution.  -log2 p(word) is
    approximated with INTEGER bit lengths (bits(N) - bits(freq), both
    engines via the binary-format-length trick), so the whole score is
    exact integer arithmetic: no FP log whose last ULP could differ
    between libm and the JVM, and the distributed sum is order-
    independent.  Plan: one explode -> corpus-frequency hash aggregate
    -> equi-join back on the word -> per-doc aggregate; the corpus
    total rides in as a broadcast one-row aggregate (production would
    also persist the exploded word table across its three consumers).  Docs with no words are
    absent (both engines)."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    ws = _words_col()
    w = (
        docs.select("doc_id", ws.alias("ws"))
        .filter((F.size("ws") > 0) & (F.col("ws")[0] != ""))
        .select("doc_id", F.explode("ws").alias("word"))
    )
    freq = w.groupBy("word").agg(F.count("*").alias("f"))
    # Corpus total as a LAZY broadcast scalar (the oracle's scalar
    # subquery), not an eager count(): registry fns must stay
    # side-effect-free until the driver materializes them (r5 review).
    tot = w.agg(F.count("*").alias("n"))
    bits = F.length(F.bin(F.col("n"))) - F.length(F.bin(F.col("f")))
    scored = (
        w.join(freq, "word").crossJoin(F.broadcast(tot))
        .select("doc_id", bits.alias("bits"))
    )
    out = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("bits").cast("long").alias("sum_bits"),
    )
    return out.select(
        "doc_id", "n_words", "sum_bits",
        (F.col("sum_bits").cast("double") / F.col("n_words"))
        .alias("avg_surprisal"),
    )


#: Winnowing geometry: k-gram width (words) and window size.  With
#: window w, any shared run of at least k + w - 1 words between two
#: documents is GUARANTEED to produce a common fingerprint (the
#: winnowing guarantee of Schleimer/Wilkerson/Aiken, "Winnowing: Local
#: Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
#: algorithm), while only ~2/(w+1) of gram hashes are kept.
_WINNOW_K = 5
_WINNOW_W = 4



#: The winnow selection CTE chain (-> ``sel`` = DISTINCT
#: (doc_id, n_grams, wh)) — shared by the fingerprint and pair
#: oracles, mirroring the shared Spark ``_winnow_sel``.
_WINNOW_SEL_SQL = f"""w0 AS (
  SELECT doc_id, {_WORDS_SQL} AS words
  FROM documents),
g AS (
  SELECT doc_id, len(words) - {_WINNOW_K - 1} AS n_grams,
         unnest(generate_series(0, len(words) - {_WINNOW_K})) AS pos,
         words
  FROM w0),
h AS (
  SELECT doc_id, n_grams, pos,
         ('0x' || substr(md5(array_to_string(
            words[pos+1:pos+{_WINNOW_K}], ' ')), 1, 15))::BIGINT AS hv
  FROM g),
wm AS (
  SELECT doc_id, n_grams, pos,
         min(hv) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1}
                       FOLLOWING) AS wh
  FROM h),
sel AS (
  SELECT DISTINCT doc_id, n_grams, wh FROM wm
  WHERE pos <= greatest(n_grams - {_WINNOW_W}, 0))"""


def _winnow_sel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The winnow selection chain (doc_id, n_grams, wh), DISTINCT per
    (doc, fingerprint) — the ONE implementation behind both
    text_winnow_fingerprint and dedup_winnow_pairs (a drifting copy
    would hash-mismatch only one of them — the r5 review lesson)."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    w0 = docs.select("doc_id", words.alias("words")).filter(
        F.size("words") >= _WINNOW_K
    )
    grams = F.expr(
        f"transform(sequence(0, size(words) - {_WINNOW_K}), "
        f"i -> array_join(slice(words, i + 1, {_WINNOW_K}), ' '))"
    )
    g = w0.select(
        "doc_id",
        (F.size("words") - (_WINNOW_K - 1)).cast("long").alias("n_grams"),
        F.posexplode(grams).alias("pos", "gram"),
    )
    h = g.select(
        "doc_id", "n_grams", "pos",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long")
        .alias("hv"),
    )
    win = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(0, _WINNOW_W - 1)
    )
    wm = h.select(
        "doc_id", "n_grams", "pos", F.min("hv").over(win).alias("wh")
    )
    return wm.filter(
        F.col("pos") <= F.greatest(F.col("n_grams") - _WINNOW_W, F.lit(0))
    ).select("doc_id", "n_grams", "wh").distinct()


@register(
    "text_winnow_fingerprint",
    oracle=f"""
WITH {_WINNOW_SEL_SQL}
SELECT doc_id, CAST(max(n_grams) AS BIGINT) AS n_grams,
       count(*) AS n_fp, min(wh) AS fp_min, max(wh) AS fp_max
FROM sel GROUP BY doc_id
""",
    tags=("text", "dedup"),
    bench=True,  # gram explode + window min: the positional-fingerprint cost shape
    priority=90,  # new final-r5, bench-tagged => must be driver-visible (window invariant); tpch_q10 demoted in exchange
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS): hash every
    ``_WINNOW_K``-word gram, slide a ``_WINNOW_W``-wide window over
    the gram-hash sequence, keep the window minimum — a position-
    robust fingerprint set that localizes shared passages (unlike the
    whole-document :func:`text_fingerprint` and unlike minhash, which
    loses positions).  Returns per-doc fingerprint-set stats
    (count + min/max — all integers, hash-exact).

    Plan shape: one scan -> per-doc gram explode (JVM built-ins:
    transform/sequence/slice, no Python) -> window min partitioned by
    doc_id (the shuffle key is doc_id, so 100 TB of docs spread
    evenly; no cross-doc traffic) -> per-doc hash aggregate.  Docs
    shorter than k words yield no grams on either engine; docs with
    fewer than w grams keep one window covering all of them
    (``pos <= greatest(n_grams - w, 0)``)."""
    sel = _winnow_sel(spark, sf_dir)
    return sel.groupBy("doc_id").agg(
        F.max("n_grams").cast("long").alias("n_grams"),
        F.count("*").alias("n_fp"),
        F.min("wh").alias("fp_min"),
        F.max("wh").alias("fp_max"),
    )


#: Stratified-sample size per group.
_STRAT_K = 4


@register(
    "text_stratified_sample",
    oracle=f"""
WITH h AS (
  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR) || ':strat') AS hv
  FROM documents),
r AS (SELECT lang, doc_id, hv,
             row_number() OVER (PARTITION BY lang
                                ORDER BY hv, doc_id) AS rk
      FROM h)
SELECT lang, rk, doc_id FROM r WHERE rk <= {_STRAT_K}
""",
    tags=("text", "pipeline"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per language, take the
    ``_STRAT_K`` documents with the smallest salted content-id hash —
    hash-order sampling again, so the sample is uniform-at-random
    w.r.t. the salt yet IDENTICAL on every rerun, engine, and
    partitioning (the property ``TABLESAMPLE``/``rand()`` pipelines
    lack, and the one that makes eval subsets reproducible).  One
    shuffle on the stratum key; rank + filter prune everything else.
    At 100 TB this is the per-source inspection/eval-subset draw —
    and the same window is a per-group top-k, so skewed strata cost
    max(stratum)/partition, not a global sort."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    hv = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":strat")))
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        docs.select("lang", "doc_id", hv.alias("hv"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _STRAT_K)
        .select("lang", "rk", "doc_id")
    )


#: Minimum pair support (documents containing both words).
_ASSOC_MIN_SUPPORT = 50


@register(
    "text_word_assoc",
    oracle=f"""
WITH dw AS (
  SELECT doc_id, unnest(list_distinct({_WORDS_SQL})) AS w
  FROM documents),
sup AS (SELECT w, count(*) AS n FROM dw GROUP BY w),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS n_pair
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
  HAVING count(*) >= {_ASSOC_MIN_SUPPORT})
SELECT p.w1, p.w2, CAST(p.n_pair AS BIGINT) AS n_pair,
       CAST(s1.n AS BIGINT) AS n_w1, CAST(s2.n AS BIGINT) AS n_w2
FROM pairs p JOIN sup s1 ON s1.w = p.w1 JOIN sup s2 ON s2.w = p.w2
""",
    tags=("text", "analytics"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_word_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining (market-basket over word sets): frequent
    co-occurring word pairs with their pair and singleton supports —
    everything a consumer needs for confidence
    (``n_pair / n_w1``) and lift without the engine ever emitting a
    float.  The pair join keys on doc_id (never all-pairs globally —
    per-doc item counts bound the fan-out, the standard a-priori
    shape), the support HAVING prunes before the singleton joins, and
    the two support joins broadcast (vocabulary-sized).  At 100 TB
    with real vocabularies the same plan runs with a per-doc distinct
    item cap — the documented Apriori/FP-growth preprocessing step."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    # (doc_id, w) rows are already distinct: array_distinct dedups
    # within a doc and doc_id is unique — no distinct() shuffle needed
    # (r5 review finding: it doubled the largest stage for nothing).
    dw = (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(_words_col())).alias("w"),
        )
        .transform(pin)  # feeds the pair self-join (twice) + supports
    )
    sup = dw.groupBy("w").agg(F.count("*").alias("n"))
    a, b = dw.alias("a"), dw.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= _ASSOC_MIN_SUPPORT)
    )
    s1 = sup.select(F.col("w").alias("w1"), F.col("n").alias("n_w1"))
    s2 = sup.select(F.col("w").alias("w2"), F.col("n").alias("n_w2"))
    return (
        pairs.join(F.broadcast(s1), "w1")
        .join(F.broadcast(s2), "w2")
        .select("w1", "w2", F.col("n_pair").cast("long").alias("n_pair"),
                "n_w1", "n_w2")
    )


# --------------------------------------- r6: sequence packing (LLM)


#: Context-window token budget for pack-sequences (tokens, whitespace
#: word rule — the same split every text query uses).
PACK_BUDGET = 512


@register(
    "text_pack_sequences",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len({_WORDS_SQL}) AS n_tok FROM documents),
cum AS (
  SELECT doc_id, n_tok,
         sum(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - n_tok AS cum_before
  FROM toks)
SELECT CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       CAST(sum(CASE WHEN (cum_before + n_tok - 1)
                          // {PACK_BUDGET} > cum_before // {PACK_BUDGET}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
FROM cum GROUP BY 1
""",
    tags=("text", "llm"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: documents concatenated in
    doc_id order and chunked into fixed token-budget context windows
    (concat-and-chunk packing).  Each document is assigned to the bin
    its FIRST token lands in (``cum_before // budget``); the per-bin
    report carries doc count, token count, doc-id span, and how many
    docs cross the bin boundary (the attention-mask cost of packing).

    Scale: token counts are a per-row projection; the running total is
    ONE global cumulative-sum window.  A single-ordered window is the
    one unavoidable serialization in concat-and-chunk semantics — at
    100 TB the production form runs per shard/partition (pack within
    each input split, doc order within split), which is this same plan
    partitioned by shard; the global form here keeps the oracle exact.
    """
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id", F.size(_words_col()).alias("n_tok")
    )
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.select(
        "doc_id", "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("cum_before"),
    )
    # Integer `div` on both engines (ADVICE r6): exact at any scale —
    # F.floor(col / lit) would round through an IEEE double and could
    # drift from DuckDB's integer `//` once cumulative token counts
    # near 2^53 (the sharded variant already did this).
    return cum.groupBy(
        F.expr(f"cum_before div {PACK_BUDGET}").alias("bin_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum(
            F.when(
                F.expr(f"(cum_before + n_tok - 1) div {PACK_BUDGET}")
                > F.expr(f"cum_before div {PACK_BUDGET}"), 1
            ).otherwise(0)
        ).cast("long").alias("n_boundary_docs"),
    )


# ------------------------------------ r6: float-free TF-IDF top terms


@register(
    "text_tfidf_top_terms",
    oracle=f"""
WITH dw AS (
  SELECT DISTINCT doc_id, unnest({_WORDS_SQL}) AS word FROM documents),
df AS (SELECT word, count(*) AS df FROM dw GROUP BY 1),
ranked AS (
  SELECT dw.doc_id, dw.word, df.df,
         row_number() OVER (PARTITION BY dw.doc_id
                            ORDER BY df.df, dw.word) AS rank
  FROM dw JOIN df ON df.word = dw.word)
SELECT doc_id, word, df, rank FROM ranked WHERE rank <= 3
""",
    tags=("text",),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most distinctive terms per document — the TF-IDF top-k made
    FLOAT-FREE: since every term here appears once per doc (distinct
    doc-term pairs), tf-idf ordering reduces to ascending document
    frequency, so the rank key is the INTEGER (df, word) pair and no
    engine ever computes a logarithm (idf monotone in 1/df).  Top-3
    per doc by (df ASC, word ASC) — rarest-first, deterministic.

    Scale: distinct (doc, word) explode with map-side combine, one
    hash-agg for df, an equi-join back (vocabulary side — AQE
    broadcasts when it fits), and a window partitioned BY DOC (small
    per-partition groups, no global order).
    """
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    dw = docs.select(
        "doc_id", F.explode(_words_col()).alias("word")
    ).distinct()
    df = dw.groupBy("word").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "word")
    return (
        dw.join(df, "word")
        .select("doc_id", "word", "df",
                F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 3)
    )


# -------------------------------------- r6: bigram LM surprisal


@register(
    "text_bigram_surprisal",
    oracle=f"""
WITH t AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
  FROM t, UNNEST(generate_series(1, len(ws) - 1)) AS g(i)
  WHERE len(ws) >= 2),
ctx AS (SELECT w1, count(*) AS cf FROM bg GROUP BY 1),
bgc AS (SELECT w1, w2, count(*) AS bf FROM bg GROUP BY 1, 2),
scored AS (
  SELECT bg.doc_id,
         length(format('{{:b}}', ctx.cf))
           - length(format('{{:b}}', bgc.bf)) AS bits
  FROM bg JOIN ctx ON ctx.w1 = bg.w1
          JOIN bgc ON bgc.w1 = bg.w1 AND bgc.w2 = bg.w2)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(bits) AS BIGINT) AS sum_bits,
       CAST(sum(bits) AS DOUBLE) / count(*) AS avg_surprisal
FROM scored GROUP BY doc_id
""",
    tags=("text", "quality"),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal — the next rung above text_unigram_surprisal
    on the KenLM-perplexity ladder: -log2 p(w2|w1) with p estimated as
    c(w1,w2)/c(w1 ·) over the corpus, approximated with the same
    integer bit-length trick (bits(context) - bits(bigram)), so the
    whole score is exact integer arithmetic with an order-independent
    distributed sum.  Low average surprisal ~ repetitive/templated
    text; high ~ incoherent word salad — both ends are what quality
    filters cut.

    Scale: one bigram explode (map-side pairs from the word array, no
    self-join), two hash aggregates (context + bigram counts), joins
    back on the bigram key — AQE broadcasts the count sides when they
    fit, shuffles by key when they don't.
    """
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    ws = _words_col()
    bg = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(F.expr(
                "transform(sequence(0, size(ws) - 2), "
                "i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"
            )).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"))
    )
    ctx = bg.groupBy("w1").agg(F.count("*").alias("cf"))
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("bf"))
    bits = F.length(F.bin(F.col("cf"))) - F.length(F.bin(F.col("bf")))
    scored = (
        bg.join(ctx, "w1")
        .join(bgc, ["w1", "w2"])
        .select("doc_id", bits.alias("bits"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("bits").cast("long").alias("sum_bits"),
        (F.sum("bits").cast("double") / F.count("*"))
        .alias("avg_surprisal"),
    )


#: Shard count for the production-shape packing variant.
PACK_SHARDS = 8


@register(
    "text_pack_sequences_sharded",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         len({_WORDS_SQL}) AS n_tok
  FROM documents),
cum AS (
  SELECT doc_id, shard, n_tok,
         sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - n_tok AS cum_before
  FROM toks)
SELECT shard, CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM cum GROUP BY 1, 2
""",
    tags=("text", "llm"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of sequence packing: documents are packed
    within hash shards (doc_id % shards), so the cumulative-sum window
    partitions by shard — no global ordering anywhere in the plan, the
    form that runs at 100 TB (each input split packs independently;
    the global variant text_pack_sequences keeps concat-and-chunk
    exactness for comparison).  Bin ids are per-shard; a (shard,
    bin_id) pair names one context window."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id", (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(_words_col()).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.select(
        "doc_id", "shard", "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("cum_before"),
    )
    return cum.groupBy(
        "shard",
        F.expr(f"cum_before div {PACK_BUDGET}").alias("bin_id"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ------------------------------------ r7: BPE merge-candidate mining
#
# The inner loop of BPE tokenizer training: count adjacent symbol-pair
# frequencies across the corpus and take the most frequent pair as the
# next merge (Sennrich et al. 2016).  This is the first iteration —
# character-level pairs within whitespace words, each word occurrence
# counted (not types): exactly the statistic a distributed tokenizer
# trainer materializes per merge round.  Pure explode + hash aggregate
# (map-side combine carries (pair, partial-count) only); the full
# training loop is this query re-run with the winning pair merged —
# the per-round plan is what scale cares about.


@register(
    "text_bpe_merge_candidates",
    oracle="""
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
  FROM documents),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> substr(w, i, 2))) AS pair
  FROM words WHERE len(w) >= 2)
SELECT pair, count(*) AS n
FROM pairs GROUP BY 1 ORDER BY n DESC, pair LIMIT 25
""",
    tags=("text", "tokenizer"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 BPE merge candidates (module note above).  All JVM-side:
    split -> explode words -> explode 2-char windows -> one hash
    aggregate -> TakeOrdered."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    words = docs.select(
        F.explode(_words_col()).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), "
                   "i -> substr(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(25)
    )


# ------------------------------------- r7: domain-mixture sampling
#
# The data-mixing step of corpus assembly (Pile/Dolma-style): each
# source gets a target sampling RATE, applied as a deterministic
# salted-hash threshold so the draw is uniform w.r.t. the salt yet
# identical on every rerun/engine/partitioning — the rate-based
# sibling of text_stratified_sample's per-stratum top-k.  Rates here
# derive from the source index (500..9500 bps) so the query is
# fixture-stable; production passes a weights map the same shape.


@register(
    "text_mixture_sample",
    oracle="""
WITH rated AS (
  SELECT doc_id, source, n_chars,
         500 + ((('0x' || substr(md5(source), 1, 15))::BIGINT % 10)
                * 1000) AS rate_bps,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 15))
           ::BIGINT % 10000 AS hv
  FROM documents)
SELECT source, rate_bps,
       count(*) AS n_total,
       CAST(sum(CASE WHEN hv < rate_bps THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN hv < rate_bps THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM rated GROUP BY source, rate_bps
""",
    tags=("text", "pipeline"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling (module note above): one scan,
    per-row integer hash threshold, one hash aggregate — the keep
    decision never shuffles documents, only (source, counters)."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    # Hash-derived rate: robust to ANY source naming (an index parse
    # ANSI-crashed on degenerate corpora) and the production shape —
    # a weights map keyed by source hashes the same way.
    rate = 500 + (
        F.conv(F.substring(F.md5("source"), 1, 15), 16, 10)
        .cast("long") % 10
    ) * 1000
    hv = (
        F.conv(F.substring(F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))
        ), 1, 15), 16, 10).cast("long") % 10000
    )
    return (
        docs.select("doc_id", "source", "n_chars",
                    rate.alias("rate_bps"), hv.alias("hv"))
        .groupBy("source", "rate_bps")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("hv") < F.col("rate_bps"), 1)
                  .otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("hv") < F.col("rate_bps"),
                         F.col("n_chars")).otherwise(0))
            .cast("long").alias("kept_chars"),
        )
    )


# ----------------------------------------- r7: RAG chunking
#
# Retrieval-prep chunking: split every document into fixed-size
# character windows with overlap (stride < width), emitting offsets
# and a content digest per chunk — the step between corpus curation
# and embedding in a retrieval pipeline.  Pure per-row explode; chunk
# identity is (doc_id, chunk_id) and the digest lets chunk-level
# exact dedup compose downstream.

_CHUNK_W, _CHUNK_STRIDE = 200, 150


#: Chunk pipeline CTEs shared by text_chunk_overlap and
#: dedup_chunk_exact (one definition — a drifting copy would
#: hash-mismatch only one of them).
_CHUNKS_CTE = f"""d AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE length(text) > 0),
ids AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
           CAST(GREATEST(n - {_CHUNK_W} + {_CHUNK_STRIDE} - 1, 0)
                // {_CHUNK_STRIDE} AS BIGINT))) AS chunk_id
  FROM d),
c AS (
  SELECT doc_id, chunk_id, chunk_id * {_CHUNK_STRIDE} AS start,
         substr(text, chunk_id * {_CHUNK_STRIDE} + 1, {_CHUNK_W}) AS chunk
  FROM ids)"""


def _chunks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _CHUNKS_CTE — (doc_id, chunk_id, start, chunk)
    for every non-empty window.  ONE definition for both chunk
    consumers, mirroring the shared SQL CTE (a drifting copy would
    hash-mismatch only one of them)."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    d = docs.filter(F.length("text") > 0).select(
        "doc_id", "text", F.length("text").alias("n"))
    return d.select(
        "doc_id",
        F.explode(F.expr(
            f"sequence(0, greatest(n - {_CHUNK_W} + {_CHUNK_STRIDE} - 1, 0)"
            f" div {_CHUNK_STRIDE})"
        )).alias("chunk_id"),
        "text",
    ).select(
        "doc_id", "chunk_id",
        (F.col("chunk_id") * _CHUNK_STRIDE).alias("start"),
        F.expr(f"substr(text, chunk_id * {_CHUNK_STRIDE} + 1, {_CHUNK_W})")
        .alias("chunk"),
    ).filter(F.length("chunk") > 0)


@register(
    "text_chunk_overlap",
    oracle=f"""
WITH {_CHUNKS_CTE}
SELECT doc_id, chunk_id, start,
       length(chunk) AS chunk_len,
       substr(md5(chunk), 1, 8) AS chunk_md5
FROM c WHERE length(chunk) > 0
""",
    tags=("text", "pipeline"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking (module note): chunk i covers
    [i*stride, i*stride + width) with width/stride from _CHUNK_W /
    _CHUNK_STRIDE.  The chunk count ceil((n - width)/stride) + 1 is
    computed with the same integer arithmetic in both engines, and
    empty tail windows are dropped on both sides.  ASCII-corpus
    precondition as the mm codecs (char == byte)."""
    return _chunks_df(spark, sf_dir).select(
        "doc_id", "chunk_id", "start",
        F.length("chunk").alias("chunk_len"),
        F.substring(F.md5("chunk"), 1, 8).alias("chunk_md5"),
    )


@register(
    "dedup_chunk_exact",
    oracle=f"""
WITH {_CHUNKS_CTE},
ch AS (
  SELECT doc_id, substr(md5(chunk), 1, 8) AS h
  FROM c WHERE length(chunk) > 0),
df AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs FROM ch GROUP BY h)
SELECT ch.doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks
FROM ch JOIN df ON df.h = ch.h
GROUP BY ch.doc_id
""",
    tags=("dedup", "text", "pipeline"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granular exact dedup signal: how much of each document is
    made of chunks that ALSO appear in other documents — the
    Lee-et-al-style cross-document duplication measure at retrieval
    granularity, composing :func:`text_chunk_overlap`'s windows with a
    chunk-digest document-frequency join.  Integer outputs only; the
    digest DF table is tiny relative to the corpus (bounded by
    distinct chunks) and joins back broadcast-or-shuffled by AQE."""
    ch = _chunks_df(spark, sf_dir).select(
        "doc_id", F.substring(F.md5("chunk"), 1, 8).alias("h")
    )
    dfreq = ch.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs"))
    return (
        ch.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("long").alias("n_dup_chunks"),
        )
    )


# ------------------------------------ r7: vocabulary coverage / OOV

_VOCAB_K = 100


@register(
    "text_vocab_coverage",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents),
vocab AS (
  SELECT w FROM (
    SELECT w, count(*) AS n FROM words GROUP BY w
    ORDER BY n DESC, w LIMIT {_VOCAB_K})),
per_doc AS (
  SELECT words.doc_id,
         count(*) AS n_words,
         CAST(sum(CASE WHEN vocab.w IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_in_vocab
  FROM words LEFT JOIN vocab ON vocab.w = words.w
  GROUP BY words.doc_id)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_words - n_in_vocab) AS BIGINT) AS n_oov
FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.source
""",
    tags=("text", "tokenizer"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV accounting per source: fit a top-K
    frequency vocabulary on the corpus itself (deterministic count +
    lexicographic tie-break), then measure what fraction of each
    source's token stream it covers — the coverage metric that drives
    tokenizer vocab sizing and flags domain mismatch (a source with
    high OOV against the global vocab needs its own merges).  Two
    aggregates over one exploded scan; the K-word vocab broadcasts."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    # source rides the explode, so no third documents scan / join is
    # needed to recover it (r7 second-review finding); the words frame
    # is pinned because the vocab fit and the per-doc pass both read it
    words = docs.select(
        "doc_id", "source", F.explode(_words_col()).alias("w")
    ).transform(pin)
    vocab = (
        words.groupBy("w").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w").limit(_VOCAB_K)
        .select("w").withColumn("__v", F.lit(1))
    )
    per_doc = (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.coalesce(F.col("__v"), F.lit(0)))
            .cast("long").alias("n_in_vocab"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum(F.col("n_words") - F.col("n_in_vocab"))
        .cast("long").alias("n_oov"),
    )


# -------------------------- late r9: cross-source vocabulary overlap


@register(
    "text_source_overlap",
    oracle=f"""
WITH sw AS (
  SELECT DISTINCT source, unnest({_WORDS_SQL}) AS w
  FROM documents WHERE trim(text) <> ''),
sz AS (SELECT source, count(*) AS n FROM sw GROUP BY source),
ov AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
  FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2)
SELECT o.src_a, o.src_b,
       CAST(o.n_common AS BIGINT) AS n_common,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(sa.n + sb.n - o.n_common AS BIGINT) AS n_union
FROM ov o JOIN sz sa ON sa.source = o.src_a
          JOIN sz sb ON sb.source = o.src_b
""",
    tags=("text", "analytics"),
    priority=900,  # demoted in r11 after r10 driver green, to rotate the r10/r9 carve-out backlog into the window (verified locally by tools/check_correctness.py)
)
def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap — the source-level
    dedup/contamination signal a corpus curator reads before mixing
    datasets: for every source pair, the EXACT Jaccard components
    (|A ∩ B|, |A|, |B|, |A ∪ B|) of their distinct word sets, emitted
    un-divided (the cross-multiplication discipline — consumers rank
    pairs by n_common * 1.0 / n_union downstream, or compare pairs
    exactly via n_common_1 * n_union_2 vs n_common_2 * n_union_1).

    Plan: one distinct (source, word) explode (map-side combine),
    one vocabulary-keyed self-join — the join key is the WORD, so
    fan-out per word is the number of sources containing it (bounded
    by the source count, NOT document count: at 100 TB with S sources
    the pair space is S^2 and the join traffic is vocabulary-sized x
    S) — and two broadcast-sized size joins."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    sw = (
        docs.filter(F.trim(F.col("text")) != "")
        .select("source", F.explode(F.array_distinct(_words_col()))
                .alias("w"))
        .distinct()
        .transform(pin)  # feeds sizes + both sides of the pair join
    )
    sz = sw.groupBy("source").agg(F.count("*").alias("n"))
    a, b = sw.alias("a"), sw.alias("b")
    ov = (
        a.join(b, (F.col("a.w") == F.col("b.w"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"),
                 F.col("b.source").alias("src_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sz.select(F.col("source").alias("src_a"),
                   F.col("n").alias("n_a"))
    sb = sz.select(F.col("source").alias("src_b"),
                   F.col("n").alias("n_b"))
    return (
        ov.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            .cast("long").alias("n_union"),
        )
    )


# ------------------------------ late r9: winnow near-dup pair mining

_WINNOW_DF_CAP = 50      # hot-fingerprint bucket cap (stop-passages)
_WINNOW_MIN_SHARED = 3   # pair threshold: >= 3 shared fingerprints


@register(
    "dedup_winnow_pairs",
    oracle=f"""
WITH {_WINNOW_SEL_SQL},
dfc AS (SELECT wh, count(*) AS df FROM sel GROUP BY wh),
keep AS (
  SELECT s.doc_id, s.wh FROM sel s JOIN dfc ON dfc.wh = s.wh
  WHERE dfc.df <= {_WINNOW_DF_CAP}),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM keep a JOIN keep b ON a.wh = b.wh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {_WINNOW_MIN_SHARED}),
szs AS (SELECT doc_id, count(*) AS n_fp FROM sel GROUP BY doc_id)
SELECT p.doc_a, p.doc_b, CAST(p.n_shared AS BIGINT) AS n_shared,
       CAST(sa.n_fp AS BIGINT) AS n_fp_a,
       CAST(sb.n_fp AS BIGINT) AS n_fp_b
FROM p JOIN szs sa ON sa.doc_id = p.doc_a
       JOIN szs sb ON sb.doc_id = p.doc_b
""",
    tags=("text", "dedup"),
    priority=900,  # demoted in r11 after r10 driver green, to rotate the r10/r9 carve-out backlog into the window (verified locally by tools/check_correctness.py)
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup pair mining (the MOSS report): documents
    sharing >= {min_shared} winnow fingerprints, with each pair's
    shared count and both fingerprint-set sizes (exact integers —
    overlap coefficients divide downstream).  Completes the dedup
    modality set with the POSITION-ROBUST member: minhash/simhash
    estimate whole-document similarity, chunk/substring need exact
    runs — winnowing catches a plagiarized PASSAGE inside otherwise
    different documents, which is the curation case the others miss.

    Scale: the pair generator is the standard blocked equi-join on
    the fingerprint value — never all-pairs — with a df <= {cap}
    stop-passage cap bounding any bucket's fan-out (boilerplate
    shared by thousands of docs is excluded the same way
    dedup_ngram_jaccard caps shingles); fingerprint sets are winnow-
    sparse (~n_grams/w per doc), so join traffic is a fraction of the
    gram count.  One shared selection chain (:func:`_winnow_sel`)
    feeds this, the per-doc fingerprint stats, and the size joins.
    """
    sel = _winnow_sel(spark, sf_dir).transform(pin)
    fps = sel.select("doc_id", "wh")
    dfc = fps.groupBy("wh").agg(F.count("*").alias("df"))
    keep = fps.join(
        dfc.filter(F.col("df") <= _WINNOW_DF_CAP).select("wh"), "wh")
    a = keep.select(F.col("doc_id").alias("doc_a"), "wh")
    b = keep.select(F.col("doc_id").alias("doc_b"), "wh")
    p = (
        a.join(b, (a["wh"] == b["wh"]) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )
    szs = fps.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    sa = szs.select(F.col("doc_id").alias("doc_a"),
                    F.col("n_fp").alias("n_fp_a"))
    sb = szs.select(F.col("doc_id").alias("doc_b"),
                    F.col("n_fp").alias("n_fp_b"))
    return (
        p.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b",
                F.col("n_shared").cast("long").alias("n_shared"),
                F.col("n_fp_a").cast("long").alias("n_fp_a"),
                F.col("n_fp_b").cast("long").alias("n_fp_b"))
    )


dedup_winnow_pairs.__doc__ = dedup_winnow_pairs.__doc__.format(
    min_shared=_WINNOW_MIN_SHARED, cap=_WINNOW_DF_CAP)


# --------------------------------------------- r10: BPE training loop
#
# text_bpe_merge_candidates scores ONE round of merge candidates; this
# completes the trainer (VERDICT r9 #7): iterate to a fixed merge
# budget over the word-frequency relation — the classic BPE trainer
# shape (Sennrich et al. 2016; the HF trainer aggregates the corpus to
# (word, freq) first for the same reason), so the heavy distributed
# work is ONE word-count aggregate and each round's pair count runs
# over the tiny vocab relation.  Merge application is the
# space-separated-symbols string replace, which both engines execute
# with identical non-overlapping left-to-right semantics (probed:
# replace(' a a a a ', ' a a ', ' aa ') == ' aa a a ' in Spark AND
# DuckDB) — a documented deterministic variant of HF's greedy repeat
# handling.  Ties break (n DESC, l, r): ASCII-only symbols make the
# string order engine-identical.

_BPE_ROUNDS = 8


def _bpe_train_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled per-round CTE chain (the graph_pagerank pattern):
    round k counts adjacent symbol pairs of the round-(k-1)
    tokenization, argmaxes deterministically, and rewrites the
    tokenization for round k+1."""
    parts = [
        ("w0 AS (SELECT w, count(*) AS freq FROM "
         f"(SELECT unnest({_WORDS_SQL}) AS w FROM documents) t "
         "WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2 "
         "GROUP BY w)"),
        ("r0 AS (SELECT ' ' || array_to_string(list_transform("
         "generate_series(1, length(w)), i -> substr(w, i, 1)), ' ') "
         "|| ' ' AS s, freq FROM w0)"),
    ]
    for k in range(1, rounds + 1):
        prev = f"r{k - 1}"
        parts.append(
            f"t{k} AS (SELECT string_split(trim(s), ' ') AS t, freq "
            f"FROM {prev})")
        parts.append(
            f"c{k} AS (SELECT t[i] AS l, t[i+1] AS r, "
            f"CAST(sum(freq) AS BIGINT) AS n "
            f"FROM t{k}, UNNEST(generate_series(1, length(t) - 1)) "
            f"AS u{k}(i) GROUP BY 1, 2)")
        parts.append(
            f"b{k} AS (SELECT {k} AS merge_rank, l, r, n FROM c{k} "
            f"ORDER BY n DESC, l, r LIMIT 1)")
        if k < rounds:
            parts.append(
                f"r{k} AS (SELECT replace(s, ' ' || l || ' ' || r || ' ', "
                f"' ' || l || r || ' ') AS s, freq "
                f"FROM {prev} CROSS JOIN b{k})")
    union = " UNION ALL ".join(
        f"SELECT * FROM b{k}" for k in range(1, rounds + 1))
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT CAST(merge_rank AS BIGINT) AS merge_rank, l, r, "
          "l || r AS merged, n FROM (" + union + ") ORDER BY merge_rank"
    )


@register(
    "text_bpe_train",
    oracle=_bpe_train_oracle(),
    tags=("text", "llm"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete BPE trainer (module note above): one distributed
    word-frequency aggregate, then _BPE_ROUNDS merge rounds over the
    pinned vocab relation — per round ONE tiny pair-count aggregate,
    a 1-row argmax collect, and a literal string-replace rewrite of
    the tokenization.  Returns the (merge_rank, l, r, merged, n)
    merges table — the trained artifact a tokenizer loads."""
    merges, _cur = _bpe_fit(spark, sf_dir)
    return one_slice_df(
        spark,
        merges, "merge_rank long, l string, r string, merged string, n long")


def _bpe_fit(spark: SparkSession, sf_dir: str):
    """Shared trainer loop: returns (merges list, final tokenized
    (s, freq) DataFrame with EVERY learned merge applied — including
    the last one, which the merges-table query never needs but the
    encoder does)."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    wf = (
        docs.select(F.explode(_words_col()).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
        .groupBy("w").agg(F.count("*").alias("freq"))
    )
    cur = pin(wf.select(
        F.concat(
            F.lit(" "),
            F.expr("concat_ws(' ', transform(sequence(1, length(w)), "
                   "i -> substring(w, i, 1)))"),
            F.lit(" "),
        ).alias("s"),
        "freq",
    ))
    merges = []
    for rank in range(1, _BPE_ROUNDS + 1):
        toks = cur.select(
            F.split(F.trim(F.col("s")), " ").alias("t"), "freq"
        ).filter(F.size("t") >= 2)
        pairs = toks.select(
            F.expr("explode(transform(sequence(1, size(t) - 1), "
                   "i -> struct(t[i-1] AS l, t[i] AS r)))").alias("p"),
            "freq",
        ).select("p.l", "p.r", "freq")
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").cast("long").alias("n"))
            .orderBy(F.desc("n"), "l", "r").limit(1).collect()[0]
        )
        merges.append(
            (rank, best.l, best.r, best.l + best.r, int(best.n)))
        cur = pin(cur.withColumn(
            "s",
            F.expr(f"replace(s, ' {best.l} {best.r} ', "
                   f"' {best.l}{best.r} ')"),
        ))
    return merges, cur




def _bpe_encode_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """The trainer chain extended by the FINAL merge application, then
    the corpus token distribution under the learned vocabulary."""
    train = _bpe_train_oracle(rounds)
    # reuse the trainer's CTE chain verbatim; replace its SELECT tail
    with_block = train[: train.rindex("\nSELECT")]
    return (
        with_block
        + f""",
rf AS (SELECT replace(s, ' ' || l || ' ' || r || ' ',
                      ' ' || l || r || ' ') AS s, freq
       FROM r{rounds - 1} CROSS JOIN b{rounds})
SELECT t AS token, CAST(sum(freq) AS BIGINT) AS n
FROM (SELECT unnest(string_split(trim(s), ' ')) AS t, freq FROM rf) x
GROUP BY t ORDER BY n DESC, token LIMIT 25
"""
    )


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("text", "llm"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train -> APPLY: encode the corpus under the learned merges and
    return the top-25 token distribution (frequency-weighted over the
    word table — exactly the corpus token counts, since every
    occurrence of a word tokenizes identically).  This closes the
    tokenizer loop: text_bpe_train produces the merges table, this
    query proves applying them yields the same token stream in both
    engines (the oracle replays the trainer AND the final merge
    application in one unrolled CTE chain)."""
    _merges, cur = _bpe_fit(spark, sf_dir)
    toks = cur.select(
        F.explode(F.split(F.trim(F.col("s")), " ")).alias("token"),
        "freq",
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token").limit(25)
    )
