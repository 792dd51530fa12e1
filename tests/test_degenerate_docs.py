"""Degenerate-document robustness (r5 code review): empty and < 3-word
documents crashed text trigram queries (Spark's sequence(1,0) is the
DESCENDING [1,0], making slice() throw) and mm_decode_ppm (empty text
=> ceil-div by zero => NULL payload => extractor TypeError).  The
fixture's shortest doc masks both, so this suite runs the affected
queries on a tiny degenerate corpus and compares against the very same
DuckDB oracle the driver uses."""

import duckdb
import pandas as pd
import pytest

from rados_timestore_spark import registry

QUERIES = [
    "text_repetition",
    "text_filter_pipeline",
    "text_dup_spans",
    "text_stats",
    "text_token_count",
    "text_pii_scrub",
    "text_unigram_surprisal",
    "mm_decode_ppm",
    "mm_modality_routing",
    # late-r5 doc-driven queries (r5 review finding: every new text
    # splitter belongs here or an empty-doc regression passes CI)
    "mm_decode_png",
    "dedup_fuzzy_prefix",
    "text_word_assoc",
    "graph_pagerank",
    "text_winnow_fingerprint",
    "mm_wav_meta",
    "dedup_bloom",
    "text_stratified_sample",
    "sketch_hll_ngrams",
    "sketch_cms_heavy_hitters",
    "sketch_kmv_sample",
    "streaming_hll_registers",
    # r6 doc-driven queries
    "text_pack_sequences",
    "text_tfidf_top_terms",
    "streaming_dedup_docs",
    "text_bigram_surprisal",
    "mm_wav_rms",
    "text_pack_sequences_sharded",
    # r7 doc-driven queries
    "text_bpe_merge_candidates",
    "mm_jpeg_header",
    "streaming_cms_cells",
    "graph_connected_components",
    "text_mixture_sample",
    "text_chunk_overlap",
    "dedup_chunk_exact",
    "text_vocab_coverage",
    # r9 doc-driven queries
    "dedup_substring_spans",
    "dedup_substring_scrub",
    "graph_kcore",
    "graph_jaccard_neighbors",
    "mm_wav_zero_crossings",
    "mm_wav_autocorr",
    "mm_decode_bmp",
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("degen")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "",                       # empty
            "one",                    # 1 word
            "two words",              # 2 words (< trigram width)
            "a b a b a b a b a b a b a b a b",  # 16 words, repetitive
            "the quick brown fox jumps over the lazy dog and then "
            "the quick brown fox naps",          # normal-ish
        ],
        "lang": ["en"] * 5,
        "source": ["t"] * 5,
        "n_chars": [0, 3, 9, 31, 66],
    })
    docs.to_parquet(root / "documents.parquet", index=False)
    return str(root)


@pytest.mark.parametrize("name", QUERIES)
def test_query_handles_degenerate_docs(spark, corpus, name):
    registry.queries()  # trigger module loading
    q = registry.QUERIES[name]
    got = q.fn(spark, corpus).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus}/documents.parquet'")
    want = con.sql(q.oracle).df()
    assert len(got) == len(want), (name, len(got), len(want))
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        gv, wv = g[c].tolist(), w[c].tolist()
        assert gv == wv, (name, c, gv, wv)
