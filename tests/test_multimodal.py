"""Injectable-decoder contract for the multimodal feature extractor."""

import pytest

from tests.conftest import SF_DIR


def test_feature_extract_custom_decoder(spark):
    from rados_timestore_spark.queries_multimodal import mm_feature_extract

    # Nested function: cloudpickle serializes it by VALUE into the UDF
    # closure (a test-module-level function would pickle by reference
    # to a module executors cannot import).
    def custom_decode(payload: bytes) -> dict:
        return {
            "width": 7,
            "height": len(payload) % 13,
            "channels": 3,
            "feat_hash": f"len{len(payload)}",
        }

    out = mm_feature_extract(spark, SF_DIR, decoder=custom_decode)
    rows = out.orderBy("doc_id").limit(5).collect()
    assert rows, "expected documents in the fixture"
    for r in rows:
        assert r.width == 7
        assert r.channels == 3
        assert r.height == r.n_bytes % 13
        assert r.feat_hash == f"len{r.n_bytes}"


def test_feature_extract_default_is_fake_decode(spark):
    import hashlib

    from rados_timestore_spark.queries_multimodal import mm_feature_extract

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .orderBy("doc_id").limit(1).collect()
    expect = hashlib.md5(docs[0].text.encode()).hexdigest()[:8]
    row = mm_feature_extract(spark, SF_DIR).orderBy("doc_id").limit(1) \
        .collect()[0]
    assert row.feat_hash == expect


def test_decode_image_real_is_an_explicit_stub():
    from rados_timestore_spark.queries_multimodal import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")
