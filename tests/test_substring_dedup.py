"""Semantic laws for dedup_substring_spans (exact substring dedup,
the Lee et al. 2022 ExactSubstr modality restated as duplicated-K-gram
runs).  The fixture-level oracle equality is the driver's job; these
tests pin the SEMANTICS on hand-crafted corpora with known answers:
span boundaries, unaligned detection, the cross-document requirement,
and the run->span length arithmetic."""

import pandas as pd
import pytest

from rados_timestore_spark.queries_dedup import (
    _SUBSTR_K, _SUBSTR_MIN, dedup_substring_spans,
)


def _corpus(tmp_path, texts):
    pdf = pd.DataFrame({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_span_found_at_true_boundaries(spark, tmp_path):
    # A 20-token span shared between two docs at DIFFERENT offsets
    # (unaligned — the case fixed-block chunking misses) must come out
    # with exact start positions and exact length in both docs.
    shared = _words("s", 20)
    d0 = _words("a", 5) + " " + shared + " " + _words("b", 7)
    d1 = _words("c", 11) + " " + shared + " " + _words("d", 3)
    sf = _corpus(tmp_path, [d0, d1])
    got = {(r.doc_id, r.start_pos, r.span_tokens)
           for r in dedup_substring_spans(spark, sf).collect()}
    # 1-based positions: doc0 span starts after 5 prefix words at 6,
    # doc1 after 11 at 12; both spans are exactly 20 tokens
    assert got == {(0, 6, 20), (1, 12, 20)}


def test_same_doc_repetition_is_not_cross_doc(spark, tmp_path):
    # A >=MIN-token phrase repeated twice WITHIN one document (and
    # appearing nowhere else) is self-repetition, not cross-document
    # duplication — min(doc_id) <> max(doc_id) must exclude it.
    phrase = _words("p", _SUBSTR_MIN)
    d0 = phrase + " " + _words("x", 4) + " " + phrase
    d1 = _words("y", 30)
    sf = _corpus(tmp_path, [d0, d1])
    assert dedup_substring_spans(spark, sf).count() == 0


def test_span_shorter_than_min_is_suppressed(spark, tmp_path):
    # Shared spans of length in [K, MIN) are detected as runs but
    # filtered by the reporting threshold.
    shared = _words("s", _SUBSTR_MIN - 1)
    d0 = shared + " " + _words("a", 10)
    d1 = _words("b", 10) + " " + shared
    sf = _corpus(tmp_path, [d0, d1])
    assert dedup_substring_spans(spark, sf).count() == 0


def test_two_disjoint_spans_stay_separate_runs(spark, tmp_path):
    # Two shared spans separated by a non-shared gap in the same doc
    # must NOT merge into one span (the gaps-and-islands grouping);
    # the gap must exceed K-1 tokens, else the bridging K-grams
    # themselves match and legitimately fuse the spans.
    s1, s2 = _words("p", _SUBSTR_MIN), _words("q", _SUBSTR_MIN)
    gap0, gap1 = _words("g", _SUBSTR_K), _words("h", _SUBSTR_K)
    d0 = s1 + " " + gap0 + " " + s2
    d1 = s1 + " " + gap1 + " " + s2
    sf = _corpus(tmp_path, [d0, d1])
    got = sorted(
        (r.doc_id, r.start_pos, r.span_tokens)
        for r in dedup_substring_spans(spark, sf).collect()
    )
    m, k = _SUBSTR_MIN, _SUBSTR_K
    assert got == [
        (0, 1, m), (0, m + k + 1, m),
        (1, 1, m), (1, m + k + 1, m),
    ]


def test_whole_doc_duplicate_is_one_full_span(spark, tmp_path):
    # Exact full-document duplicates degenerate to one span covering
    # the whole doc — the modality subsumes exact dedup for docs >=
    # MIN tokens.
    t = _words("w", 40)
    sf = _corpus(tmp_path, [t, t, _words("z", 25)])
    got = {(r.doc_id, r.start_pos, r.span_tokens)
           for r in dedup_substring_spans(spark, sf).collect()}
    assert got == {(0, 1, 40), (1, 1, 40)}


def test_scrub_removes_exact_spans_and_hashes_cleaned_text(
        spark, tmp_path):
    # The scrubber's cleaned_md5 must equal the md5 of the document
    # with EXACTLY the reported spans cut out, and untouched docs
    # (removed_tokens == 0) must not appear at all.
    import hashlib

    from rados_timestore_spark.queries_dedup import (
        dedup_substring_scrub,
    )

    shared = _words("s", 20)
    pre0, post0 = _words("a", 5), _words("b", 7)
    pre1, post1 = _words("c", 11), _words("d", 3)
    d0 = pre0 + " " + shared + " " + post0
    d1 = pre1 + " " + shared + " " + post1
    d2 = _words("z", 30)  # untouched
    sf = _corpus(tmp_path, [d0, d1, d2])
    got = {r.doc_id: (r.removed_tokens, r.kept_tokens, r.cleaned_md5)
           for r in dedup_substring_scrub(spark, sf).collect()}
    assert set(got) == {0, 1}

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert got[0] == (20, 12, h(pre0 + " " + post0))
    assert got[1] == (20, 14, h(pre1 + " " + post1))


def test_scrub_whole_doc_duplicate_yields_empty_clean(spark, tmp_path):
    import hashlib

    from rados_timestore_spark.queries_dedup import (
        dedup_substring_scrub,
    )

    t = _words("w", 40)
    sf = _corpus(tmp_path, [t, t, _words("z", 25)])
    got = {r.doc_id: (r.removed_tokens, r.kept_tokens, r.cleaned_md5)
           for r in dedup_substring_scrub(spark, sf).collect()}
    empty = hashlib.md5(b"").hexdigest()
    assert got == {0: (40, 0, empty), 1: (40, 0, empty)}
