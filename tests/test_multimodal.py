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


def _md5_8(b: bytes) -> str:
    import hashlib

    return hashlib.md5(b).hexdigest()[:8]


def test_decode_real_ppm_p6():
    from rados_timestore_spark.queries_multimodal import decode_image_real

    raster = bytes(range(2 * 3 * 3))  # 2x3 RGB
    d = decode_image_real(b"P6\n2 3\n255\n" + raster)
    assert d == {"width": 2, "height": 3, "channels": 3,
                 "feat_hash": _md5_8(raster)}


def test_decode_real_ppm_header_comments_and_whitespace():
    from rados_timestore_spark.queries_multimodal import decode_image_real

    raster = bytes(range(6))
    payload = b"P6 # magic comment\n# full line\n 2\t1 # w h\n255 " + raster
    d = decode_image_real(payload)
    assert (d["width"], d["height"], d["channels"]) == (2, 1, 3)
    assert d["feat_hash"] == _md5_8(raster)


def test_decode_real_pgm_p5_grayscale():
    from rados_timestore_spark.queries_multimodal import decode_image_real

    raster = bytes([9, 8, 7, 6])
    d = decode_image_real(b"P5\n4 1\n255\n" + raster)
    assert (d["width"], d["height"], d["channels"]) == (4, 1, 1)
    assert d["feat_hash"] == _md5_8(raster)


def test_decode_real_ascii_p3():
    from rados_timestore_spark.queries_multimodal import decode_image_real

    # 1x2 RGB, ASCII samples; raster hash is over the DECODED bytes
    d = decode_image_real(b"P3\n1 2\n255\n10 20 30\n40 50 60\n")
    assert (d["width"], d["height"], d["channels"]) == (1, 2, 3)
    assert d["feat_hash"] == _md5_8(bytes([10, 20, 30, 40, 50, 60]))


def test_decode_real_bmp_24bit():
    import struct

    from rados_timestore_spark.queries_multimodal import decode_image_real

    w, h = 2, 2
    stride = (w * 3 + 3) & ~3  # 8 bytes: 6 pixel + 2 pad
    raster = bytes(range(stride * h))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(raster), 0, 0, 0, 0))
    d = decode_image_real(header + raster)
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
    assert d["feat_hash"] == _md5_8(raster)


def test_decode_real_rejects_garbage_and_truncation():
    from rados_timestore_spark.queries_multimodal import decode_image_real

    with pytest.raises(ValueError, match="magic"):
        decode_image_real(b"\x89PNG\r\n")
    with pytest.raises(ValueError, match="truncated"):
        decode_image_real(b"P6\n4 4\n255\n\x00\x01")  # raster too short
    with pytest.raises(ValueError, match="maxval"):
        decode_image_real(b"P6\n1 1\n65535\n\x00\x00\x00")


def test_feature_extract_with_real_decoder_on_real_ppm(spark):
    """mm_feature_extract(decoder=decode_image_real) over REAL P6
    payloads — the full Spark path (Arrow batches through mapInPandas),
    not just the pure-Python decoder."""
    import pandas as pd

    from rados_timestore_spark.queries_multimodal import (
        _FEATURES_DDL, decode_image_real, make_feature_extractor)

    raster = bytes(range(12))  # 2x2 RGB
    payload = b"P6\n2 2\n255\n" + raster
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [payload, payload]})
    )
    rows = df.mapInPandas(
        make_feature_extractor(decode_image_real), _FEATURES_DDL
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r.width, r.height, r.channels) == (2, 2, 3)
        assert r.feat_hash == _md5_8(raster)
        assert r.n_bytes == len(payload)


def _wav(chunks_mid=b"", channels=1, rate=8000, frames=4,
         fmt_tag=1, data=None):
    """Minimal PCM WAV builder for parser tests."""
    import struct

    block = channels * 2
    if data is None:
        data = bytes(range(frames * block))
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate, rate * block,
                      block, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + chunks_mid
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_real_basic():
    from rados_timestore_spark.queries_multimodal import decode_wav_real

    d = decode_wav_real(_wav(channels=2, rate=16000, frames=8))
    assert (d["sample_rate"], d["channels"], d["bits"]) == (16000, 2, 16)
    assert d["n_frames"] == 8
    assert d["duration_us"] == 8 * 1_000_000 // 16000


def test_decode_wav_real_skips_odd_chunks_with_padding():
    import struct

    from rados_timestore_spark.queries_multimodal import decode_wav_real

    mid = b"LIST" + struct.pack("<I", 5) + b"INFOJ" + b"\0"
    d = decode_wav_real(_wav(chunks_mid=mid, frames=3))
    assert d["n_frames"] == 3


def test_decode_wav_real_rejects_malformed():
    import struct

    import pytest

    from rados_timestore_spark.queries_multimodal import decode_wav_real

    with pytest.raises(ValueError):
        decode_wav_real(b"OggS\x00\x00\x00\x00")      # wrong container
    with pytest.raises(ValueError):
        decode_wav_real(_wav(fmt_tag=3))               # non-PCM
    with pytest.raises(ValueError):
        decode_wav_real(_wav()[:-3])                   # truncated data
    good = _wav()
    bad = good[:4] + struct.pack("<I", 999) + good[8:]  # riff size lie
    with pytest.raises(ValueError):
        decode_wav_real(bad)


def test_decode_wav_real_rejects_degenerate_fmt():
    import struct

    import pytest

    from rados_timestore_spark.queries_multimodal import decode_wav_real

    def wav_raw(channels, rate, bits, block, data=b"\x00\x00"):
        fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                          block, bits)
        chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", len(data)) + data)
        return (b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
                + chunks)

    # channels=0/block=0 and rate=0 must be ValueError, not
    # ZeroDivisionError (r5 review finding)
    with pytest.raises(ValueError):
        decode_wav_real(wav_raw(channels=0, rate=8000, bits=16, block=0))
    with pytest.raises(ValueError):
        decode_wav_real(wav_raw(channels=1, rate=0, bits=16, block=2))
    with pytest.raises(ValueError):
        decode_wav_real(wav_raw(channels=1, rate=8000, bits=7, block=2))


def test_documents_corpus_is_pure_ascii():
    """Machine-check the invariant every multimodal VARCHAR-side
    oracle rests on (char ops == byte ops): the fixture corpus must
    be pure ASCII at every scale factor present."""
    import os

    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR

    roots = {os.path.dirname(SF_DIR)} | {"/root/testdata"}
    paths = [
        f"{root}/{sf}/documents.parquet"
        for root in sorted(roots)
        for sf in ("sf0.001", "sf0.01", "sf0.1")
    ] + [f"{SF_DIR}/documents.parquet"]
    checked = 0
    for path in paths:
        if not os.path.exists(path):
            continue
        checked += 1
        texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
        bad = [t for t in texts if t is not None and not t.isascii()]
        assert not bad, f"{path}: {len(bad)} non-ASCII documents"
    # a vacuous pass would defeat the machine-check (r5 review)
    assert checked > 0, f"no documents fixture found under {sorted(roots)}"


def test_decode_png_real_roundtrip_all_filters():
    import hashlib

    from rados_timestore_spark.queries_multimodal import (
        decode_png_real, encode_png)

    # 6 rows -> filter types 0,1,2,3,4,0 all exercised
    raster = bytes(range(6 * 4 * 3 % 256)) * 3
    raster = (raster * 3)[: 6 * 4 * 3]
    d = decode_png_real(encode_png(raster, 4, 6, 3))
    assert (d["width"], d["height"], d["channels"]) == (4, 6, 3)
    assert d["feat_hash"] == hashlib.md5(raster).hexdigest()[:8]


def test_decode_png_real_grayscale():
    import hashlib

    from rados_timestore_spark.queries_multimodal import (
        decode_png_real, encode_png)

    raster = bytes((i * 7) % 256 for i in range(5 * 7))
    d = decode_png_real(encode_png(raster, 5, 7, 1))
    assert (d["width"], d["height"], d["channels"]) == (5, 7, 1)
    assert d["feat_hash"] == hashlib.md5(raster).hexdigest()[:8]


def test_decode_png_real_rejects_corruption():
    import pytest

    from rados_timestore_spark.queries_multimodal import (
        decode_png_real, encode_png)

    good = encode_png(b"\x01\x02\x03" * 4, 2, 2, 3)
    with pytest.raises(ValueError):
        decode_png_real(b"\x89PNG\r\n\x1a\njunk")
    # flip one raster-affecting byte inside IDAT -> CRC must catch it
    idat_at = good.index(b"IDAT") + 6
    bad = good[:idat_at] + bytes([good[idat_at] ^ 0xFF]) + good[idat_at + 1:]
    with pytest.raises(ValueError):
        decode_png_real(bad)
    with pytest.raises(ValueError):
        decode_png_real(good[:-20])  # truncated (no IEND)


def test_jpeg_header_roundtrip():
    from rados_timestore_spark.queries_multimodal import (
        _JPG_COM_MAX, decode_jpeg_header, encode_jpeg_header)
    import hashlib

    for text in (b"hello world", b"x", b"a" * 200):
        n = len(text)
        d = decode_jpeg_header(encode_jpeg_header(text, n))
        assert d["width"] == n % 31 + 1
        assert d["height"] == n % 17 + 1
        assert d["components"] == (n % 2) * 2 + 1
        assert d["precision"] == 8
        assert d["progressive"] == (n % 3 == 0)
        assert d["n_segments"] == 4
        assert d["com_md5"] == hashlib.md5(
            text[:min(n, _JPG_COM_MAX)]).hexdigest()[:8]


def test_jpeg_header_rejects_malformed():
    import pytest

    from rados_timestore_spark.queries_multimodal import (
        decode_jpeg_header, encode_jpeg_header)

    good = encode_jpeg_header(b"doc", 3)
    with pytest.raises(ValueError):
        decode_jpeg_header(b"")                      # no SOI
    with pytest.raises(ValueError):
        decode_jpeg_header(b"\x89PNG\r\n\x1a\n")     # wrong magic
    with pytest.raises(ValueError):
        decode_jpeg_header(good[:10])                # truncated segment
    # SOS before SOF: SOI + minimal SOS
    with pytest.raises(ValueError):
        decode_jpeg_header(b"\xff\xd8\xff\xda\x00\x03\x01")
    # corrupt a segment length to run past the end
    bad = bytearray(good)
    bad[4] = 0xFF
    bad[5] = 0xFF
    with pytest.raises(ValueError):
        decode_jpeg_header(bytes(bad))


def test_jpeg_header_skips_fill_bytes_and_standalone_markers():
    from rados_timestore_spark.queries_multimodal import (
        decode_jpeg_header, encode_jpeg_header)

    good = encode_jpeg_header(b"padded", 6)
    # insert fill FFs and a standalone TEM marker after SOI
    padded = good[:2] + b"\xff\xff" + b"\xff\x01" + good[2:]
    assert decode_jpeg_header(padded) == decode_jpeg_header(good)


def test_wav_zero_crossings_laws(spark):
    # DC-removed ZCR: bounded by (frames-1)*channels; geometry agrees
    # with mm_wav_meta; non-trivial on the fixture (the mean split
    # guarantees both sides are populated for any non-constant doc).
    from rados_timestore_spark.queries_multimodal import (
        mm_wav_meta, mm_wav_zero_crossings,
    )
    from tests.conftest import SF_DIR

    zc = mm_wav_zero_crossings(spark, SF_DIR).toPandas() \
        .set_index("doc_id")
    meta = mm_wav_meta(spark, SF_DIR).toPandas().set_index("doc_id")
    assert set(zc.index) == set(meta.index)
    j = zc.join(meta, lsuffix="_z")
    assert (j["channels_z"] == j["channels"]).all()
    assert (j["n_frames_z"] == j["n_frames"]).all()
    assert (j["zero_crossings"] >= 0).all()
    assert (j["zero_crossings"]
            <= (j["n_frames"] - 1) * j["channels"]).all()
    assert (j["zero_crossings"] > 0).any()


# ---------------------------------------------- GIF / LZW round-trip


def test_gif_lzw_roundtrip_fuzz():
    # seeded fuzz over every mcs the query sweeps plus 8-bit, lengths
    # crossing several width bumps — encode/decode must be identity
    import random

    from rados_timestore_spark.queries_multimodal import (
        _gif_lzw_decode, _gif_lzw_encode,
    )

    random.seed(42)
    for _ in range(400):
        mcs = random.choice([2, 3, 4, 8])
        nc = 1 << mcs
        n = random.randint(1, 600)
        idx = bytes(random.randint(1, nc - 1) for _ in range(n))
        assert _gif_lzw_decode(_gif_lzw_encode(idx, mcs), mcs) == idx


def test_gif_lzw_kwkwk_and_dict_cap():
    import random

    from rados_timestore_spark.queries_multimodal import (
        _gif_lzw_decode, _gif_lzw_encode,
    )

    # the cScSc first-use pattern (decoder must synthesize the entry
    # it has not seen yet)
    idx = b"\x01" * 400
    assert _gif_lzw_decode(_gif_lzw_encode(idx, 2), 2) == idx
    # force the 4096-entry cap -> emitted CLEAR + reset mid-stream
    random.seed(11)
    big = bytes(random.randint(1, 3) for _ in range(120_000))
    assert _gif_lzw_decode(_gif_lzw_encode(big, 2), 2) == big


def test_gif_decoder_rejects_malformed():
    import struct

    import pytest

    from rados_timestore_spark.queries_multimodal import (
        _gif_lzw_decode, _gif_lzw_encode, decode_gif_real,
    )

    with pytest.raises(ValueError, match="signature"):
        decode_gif_real(b"NOTAGIF" + b"\x00" * 20)
    # truncated LZW stream
    good = _gif_lzw_encode(b"\x01\x02\x03\x01\x02\x03", 2)
    with pytest.raises(ValueError, match="truncated"):
        _gif_lzw_decode(good[:-1] if len(good) > 1 else b"", 2)
    # a code beyond the table
    with pytest.raises(ValueError, match="beyond table"):
        _gif_lzw_decode(bytes([0xFF, 0xFF, 0xFF]), 2)
    # wrong raster length vs descriptor: build a 2x2 GIF claiming 3x2
    idx = bytes([1, 2, 3, 1])
    lzw = _gif_lzw_encode(idx, 2)
    payload = (
        b"GIF87a" + struct.pack("<HHBBB", 3, 2, 0x80 | 1, 0, 0)
        + bytes(12)  # 4-entry GCT
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 2, 0)
        + bytes([2]) + bytes([len(lzw)]) + lzw + b"\x00\x3b"
    )
    with pytest.raises(ValueError, match="decoded"):
        decode_gif_real(payload)


def test_gif_decoder_skips_extensions_and_validates_palette(spark):
    # end-to-end on the fixture path: the synth kernel embeds a
    # comment extension the parser must skip; every decoded index
    # must sit inside the declared palette (enforced by the decoder,
    # so a pass here pins both)
    from rados_timestore_spark.queries_multimodal import mm_decode_gif

    out = mm_decode_gif(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == 500
    assert (out["n_pixels"] == out["width"] * out["height"]).all()
    assert set(out["ncolors"]) <= {4, 8, 16}
