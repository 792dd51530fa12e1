"""Multimodal-column operators: opaque ``binary`` payloads with typed
metadata, decode/feature-extract/frame-sample plumbing as Arrow-batched
Pandas UDFs (BASELINE.json north star).

:func:`decode_image_real` is a REAL dependency-free decoder (binary/
ASCII PPM+PGM and uncompressed BMP, parsed byte-for-byte — no pillow
needed; JPEG/PNG would slot into the same contract once codec libs
exist).  :func:`mm_decode_ppm` drives it over genuine P6 payloads with
an exact oracle; the md5-based :func:`fake_decode` remains the default
for the plumbing-only queries.  Payload bytes are synthesized
deterministically from ``documents.text`` (UTF-8, pure ASCII —
verified), so DuckDB oracles the binary plumbing on the VARCHAR side
(its md5/substring don't take BLOB): char ops equal byte ops exactly
for this corpus.

Scale notes: binary columns ride Parquet natively (no pointer/offset
machinery — SURVEY.md §1.7); decode stages are ``mapInPandas`` over
row groups, so 100 TB of media shards across executors with Arrow
batches and zero driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rados_timestore_spark.queries_common import load, load_parallel, pin
from rados_timestore_spark.registry import register

#: Fixed fake "frame" size for the frame-sampling plumbing.
FRAME_BYTES = 16


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload column + metadata."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("media_source"),
    )


@register(
    "mm_payload_stats",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       substr(md5(text), 1, 2) AS magic
FROM documents
""",
    tags=("multimodal",),
    priority=900,  # demoted in r13 after r12 driver green, to rotate the r12 certificates + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: byte length, content
    hash, sniffed 'magic' prefix — the catalog columns a media table
    carries next to the blob."""
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.substring(F.md5("payload"), 1, 2).alias("magic"),
    )


@register(
    "mm_frame_sample",
    oracle=f"""
SELECT doc_id, frame_no,
       md5(substring(text, frame_no * {FRAME_BYTES} + 1,
                     {FRAME_BYTES})) AS frame_md5
FROM documents
CROSS JOIN generate_series(0, 3) g(frame_no)
WHERE octet_length(encode(text)) >= (frame_no + 1) * {FRAME_BYTES}
""",
    tags=("multimodal",),
    priority=900,  # demoted in r13 after r12 driver green, to rotate the r12 certificates + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: slice the first 4 fixed-size 'frames'
    out of each binary payload (video keyframe extraction shape —
    offset math + binary substring, no decode)."""
    p = _payloads(spark, sf_dir)
    frames = p.select(
        "doc_id", "payload",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("frame_no"),
    ).filter(
        F.length("payload") >= (F.col("frame_no") + 1) * FRAME_BYTES
    )
    slice_ = F.expr(
        f"substring(payload, frame_no * {FRAME_BYTES} + 1, {FRAME_BYTES})"
    )
    return frames.select(
        "doc_id", "frame_no", F.md5(slice_).alias("frame_md5")
    )


#: Schema produced by the (fake) feature extractor.
_FEATURES_DDL = (
    "doc_id long, n_bytes long, width int, height int, channels int, "
    "feat_hash string"
)


def fake_decode(payload: bytes) -> dict:
    """Deterministic FAKE per-blob decoder (the real one needs
    PIL/ffmpeg — see :func:`decode_image_real`): 'dimensions' derive
    from the payload's md5 so the pipeline shape is verifiable."""
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return {
        "width": int(h[0:2], 16) + 1,       # fake width  1..256
        "height": int(h[2:4], 16) + 1,      # fake height 1..256
        "channels": int(h[4:6], 16) % 3 + 1,  # fake channels 1..3
        "feat_hash": h[:8],
    }


def make_feature_extractor(decode):
    """``mapInPandas`` body around an injectable per-blob ``decode``:
    ``bytes -> {width, height, channels, feat_hash}``.  The Spark-side
    plumbing (Arrow batch in, typed feature frame out) is fixed; a
    production deployment passes :func:`decode_image_real` (or any
    callable) without editing this module.  The callable is shipped to
    executors inside the serialized UDF closure, so it must be
    picklable (module-level function or cloudpickle-able lambda)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                d = decode(b)
                rows.append(
                    (int(doc_id), len(b), d["width"], d["height"],
                     d["channels"], d["feat_hash"])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "width", "height", "channels",
                    "feat_hash",
                ],
            )

    return extract


@register(
    "mm_feature_extract",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       ('0x' || substr(md5(text), 1, 2))::INT + 1 AS width,
       ('0x' || substr(md5(text), 3, 2))::INT + 1 AS height,
       ('0x' || substr(md5(text), 5, 2))::INT % 3 + 1 AS channels,
       substr(md5(text), 1, 8) AS feat_hash
FROM documents
""",
    tags=("multimodal",),
    priority=900,  # demoted in r14 after r13 driver green, to rotate the r13 certificate + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def mm_feature_extract(spark: SparkSession, sf_dir: str,
                       decoder=fake_decode) -> DataFrame:
    """Decode/feature-extract plumbing via ``mapInPandas``: Arrow
    batches of (doc_id, payload) stream through a Python decoder that
    emits a typed feature row per blob.  The decoder is INJECTABLE
    (``decoder=`` kwarg; default is the deterministic md5 fake so the
    oracle can verify exact values) — production passes
    :func:`decode_image_real` or its own callable, no module edits."""
    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(make_feature_extractor(decoder), _FEATURES_DDL)


#: Target byte budget for the fake "thumbnail" resize.
RESIZE_TARGET = 64


def _fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic FAKE resize: stride-decimate each payload down to
    ~``RESIZE_TARGET`` bytes (every k-th byte, k = ceil(n/target)) —
    the exact batch shape of a real thumbnailer (binary in, smaller
    binary + metadata out), with byte-exact output the oracle can
    reproduce.  A real implementation swaps the stride slice for
    PIL.Image.resize (see :func:`decode_image_real`)."""
    import hashlib

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n = len(b)
            k = max(1, (n + RESIZE_TARGET - 1) // RESIZE_TARGET)
            r = b[::k]
            rows.append(
                (int(doc_id), n, len(r), hashlib.md5(r).hexdigest())
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "orig_bytes", "resized_bytes",
                     "resized_md5"],
        )


@register(
    "mm_resize",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         GREATEST((octet_length(encode(text)) + {RESIZE_TARGET - 1})
                  // {RESIZE_TARGET}, 1) AS stride
  FROM documents)
SELECT doc_id, n AS orig_bytes,
       len([i for i in generate_series(1, n, stride)]) AS resized_bytes,
       md5(array_to_string(
         [substr(text, i, 1) for i in generate_series(1, n, stride)],
         '')) AS resized_md5
FROM t
""",
    tags=("multimodal",),
    priority=900,  # r11-refreshed (driver green); demoted in r12 to continue the oldest-first evidence rotation
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample plumbing via ``mapInPandas``: Arrow batches of
    blobs stream through a Python resizer emitting the reduced payload
    hash + size metadata.  At 100 TB this is the per-row-group decode
    shard pattern — no shuffle, executor-local CPU, output a small
    typed row per blob."""
    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(
        _fake_resize,
        "doc_id long, orig_bytes long, resized_bytes long, "
        "resized_md5 string",
    )


def _pnm_header_tokens(payload: bytes, count: int) -> tuple[list[int], int]:
    """Parse ``count`` whitespace-separated integer tokens after a PNM
    magic, honoring ``#`` comments; returns (tokens, offset-past-the-
    single-whitespace-after-the-last-token) per the PNM spec."""
    toks: list[int] = []
    i = 2  # past the 2-byte magic
    n = len(payload)
    while len(toks) < count:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i] == 0x23:  # '#' comment to end of line
            while i < n and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError(f"bad PNM header near byte {i}")
        toks.append(int(payload[i:j]))
        i = j
    if i >= n or not payload[i : i + 1].isspace():
        raise ValueError("PNM header not terminated by whitespace")
    return toks, i + 1  # exactly ONE whitespace before binary raster


def decode_image_real(payload: bytes) -> dict:
    """REAL dependency-free image decode: PPM/PGM binary (P6/P5), PPM/
    PGM ASCII (P3/P2), and uncompressed BI_RGB BMP — all parsed from
    the actual bytes, no pillow needed.  Same contract as
    :func:`fake_decode` (width/height/channels/feat_hash, feat_hash =
    md5 of the raw raster bytes), so it drops straight into
    ``mm_feature_extract(..., decoder=decode_image_real)``;
    :func:`mm_decode_ppm` drives it over real P6 payloads with an
    exact DuckDB oracle."""
    import hashlib
    import struct

    magic = bytes(payload[:2])
    if magic in (b"P2", b"P3", b"P5", b"P6"):
        channels = 3 if magic in (b"P3", b"P6") else 1
        (w, h, maxval), off = _pnm_header_tokens(payload, 3)
        if maxval <= 0 or maxval > 255:
            raise ValueError(f"unsupported PNM maxval {maxval}")
        need = w * h * channels
        if magic in (b"P5", b"P6"):
            pix = bytes(payload[off : off + need])
            if len(pix) != need:
                raise ValueError(
                    f"truncated raster: want {need}, got {len(pix)}"
                )
        else:  # ASCII samples
            vals = bytes(payload[off - 1 :]).split()
            if len(vals) < need:
                raise ValueError(
                    f"truncated ASCII raster: want {need}, got {len(vals)}"
                )
            pix = bytes(int(v) for v in vals[:need])
    elif magic == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp, compression = struct.unpack_from("<HI", payload, 28)
        if compression != 0 or bpp not in (8, 24, 32):
            raise ValueError(f"unsupported BMP (bpp={bpp}, "
                             f"compression={compression})")
        channels = bpp // 8
        h = abs(h)
        # rows are padded to 4-byte boundaries in the file
        stride = (w * channels + 3) & ~3
        need = stride * h
        pix = bytes(payload[data_off : data_off + need])
        if len(pix) != need:
            raise ValueError(f"truncated raster: want {need}, "
                             f"got {len(pix)}")
    else:
        raise ValueError(f"unsupported image magic {magic!r}")
    return {
        "width": int(w),
        "height": int(h),
        "channels": channels,
        "feat_hash": hashlib.md5(pix).hexdigest()[:8],
    }


#: mm_decode_ppm geometry: width/height derived from the byte length so
#: the oracle can reproduce the raster without parsing any binary.
_PPM_W_MOD, _PPM_H_MOD = 31, 17
#: upper bound on w*h (constant generate_series bound — DuckDB's
#: table function rejects lateral column parameters)
_PPM_MAX_PIX = _PPM_W_MOD * (_PPM_H_MOD + 1) - 1


@register(
    "mm_decode_ppm",
    oracle=f"""
WITH g0 AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents),
g AS (
  SELECT doc_id, text, n,
         n % {_PPM_W_MOD} + 1 AS w,
         n % {_PPM_H_MOD} + 2 AS h
  FROM g0),
p AS (
  SELECT doc_id, w, h, w * h * 3 AS pl,
         substr(repeat(text, ((w * h * 3 + n - 1) // n)::INT),
                1, w * h * 3) AS pix
  FROM g)
SELECT doc_id,
       3 + length(w::VARCHAR) + 1 + length(h::VARCHAR) + 5 + pl
         AS n_bytes,
       w AS width, h AS height, 3 AS channels,
       substr(md5(pix), 1, 8) AS feat_hash
FROM p
""",
    tags=("multimodal",),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def mm_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end to end: build an actual binary P6 PPM per
    document JVM-side (header + raster bytes from the doc text, sized
    by deterministic formulas), then stream the payloads through
    :func:`decode_image_real` via the standard ``mapInPandas`` feature
    extractor.  The decoder parses the real bytes (magic, dimensions,
    maxval, raster) — nothing about the construction formulas leaks
    into it — while the oracle recomputes width/height/raster-md5 from
    the formulas alone, verifying the decode exactly.  Scale shape is
    identical to :func:`mm_feature_extract`: executor-local Arrow
    batches, no shuffle, no driver involvement."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    # Empty documents: a zero-length source would make the ceil-div
    # repeat NULL (division by zero) and crash the extractor on a NULL
    # payload (r5 code-review finding) — substitute a single space so
    # every doc yields a well-formed 1-byte-source PPM, identically in
    # both engines.
    n0 = F.octet_length("text")
    n = F.greatest(n0, F.lit(1))
    src = F.when(n0 == 0, F.lit(" ")).otherwise(F.col("text"))
    sized = docs.select(
        "doc_id", src.alias("text"), n.alias("n"),
        (n % _PPM_W_MOD + 1).alias("w"),
        (n % _PPM_H_MOD + 2).alias("h"),
    )
    # raster = first w*h*3 bytes of the text cycled (ceil-div repeat
    # count, mirrored exactly by the oracle's (pl + n - 1) // n)
    pix = F.expr("substring(repeat(text, CAST((w * h * 3 + n - 1) "
                 "DIV n AS INT)), 1, w * h * 3)")
    payload = F.encode(
        F.concat(
            F.lit("P6\n"), F.col("w").cast("string"), F.lit(" "),
            F.col("h").cast("string"), F.lit("\n255\n"), pix,
        ),
        "UTF-8",
    )
    p = sized.select("doc_id", payload.alias("payload"))
    return p.mapInPandas(
        make_feature_extractor(decode_image_real), _FEATURES_DDL
    )


#: mm_decode_bmp geometry (byte-length-derived like the PPM twin;
#: widths 1..13 sweep every stride-padding residue mod 4).
_BMP_W_MOD, _BMP_H_MOD = 13, 17


def _bmp_synth_decode(batches):
    """mapInPandas kernel: build a REAL 24-bit BI_RGB BMP per document
    (binary 54-byte header struct-packed little-endian, rows padded to
    4-byte file strides with spaces, bottom-up h) and decode it with
    :func:`decode_image_real` — the parser sees only bytes."""
    import struct

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            src = text.encode("utf-8") or b" "
            n = len(src)
            w = n % _BMP_W_MOD + 1
            h = n % _BMP_H_MOD + 2
            stride = (w * 3 + 3) & ~3
            pad = stride - w * 3
            need = w * 3 * h
            body = (src * ((need + n - 1) // n))[:need]
            raster = b"".join(
                body[r * w * 3:(r + 1) * w * 3] + b" " * pad
                for r in range(h)
            )
            header = (
                b"BM"
                + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(raster), 2835, 2835, 0, 0)
            )
            payload = header + raster
            d = decode_image_real(payload)
            rows.append((int(doc_id), len(payload), d["width"],
                         d["height"], d["channels"], d["feat_hash"]))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_bytes", "width", "height",
                           "channels", "feat_hash"],
        )


@register(
    "mm_decode_bmp",
    # ASCII PRECONDITION: the oracle rebuilds the raster from VARCHAR
    # characters (ord == byte only for the pure-ASCII corpus, pinned
    # by test_documents_corpus_is_pure_ascii).
    oracle=f"""
WITH g0 AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents),
g AS (
  SELECT doc_id, text, n,
         n % {_BMP_W_MOD} + 1 AS w,
         n % {_BMP_H_MOD} + 2 AS h
  FROM g0),
p AS (
  SELECT doc_id, w, h,
         ((w * 3 + 3) // 4) * 4 AS stride,
         substr(repeat(text, ((w * 3 * h + n - 1) // n)::INT),
                1, w * 3 * h) AS body
  FROM g),
r AS (
  SELECT doc_id, w, h, stride,
         list_aggregate(list_transform(generate_series(0, h - 1), rr ->
             substr(body, rr * w * 3 + 1, w * 3)
               || repeat(' ', stride - w * 3)),
           'string_agg', '') AS raster
  FROM p)
SELECT doc_id, CAST(54 + stride * h AS BIGINT) AS n_bytes,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       3 AS channels, substr(md5(raster), 1, 8) AS feat_hash
FROM r
""",
    tags=("multimodal",),
    priority=900,  # demoted in r11 after r10 driver green, to rotate the r10/r9 carve-out backlog into the window (verified locally by tools/check_correctness.py)
)
def mm_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode end to end — the third raster container after
    PPM and PNG: a binary BI_RGB 24-bit BMP per document
    (struct-packed 54-byte header, rows padded to 4-byte FILE strides
    — the BMP-specific parsing hazard, swept across every w*3 mod 4
    residue by the width formula) is built and then parsed back by
    :func:`decode_image_real`, which validates header geometry,
    compression mode and raster length and hashes the padded raster.
    The oracle rebuilds the same padded raster character-wise (row
    slices + space padding) and must match the parser bit-exactly.
    One ``mapInPandas`` map stage, zero shuffle."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select("doc_id", "text").mapInPandas(
        _bmp_synth_decode, _FEATURES_DDL,
    )


@register(
    "mm_modality_routing",
    oracle="""
SELECT CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'image'
            WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       count(*) AS n,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       max(octet_length(encode(text))) AS max_bytes
FROM documents GROUP BY 1
""",
    tags=("multimodal",),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def mm_modality_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality routing/aggregation: classify blobs (fake sniff on
    size), aggregate per-modality byte budgets — the partition-planning
    query a media ingest pipeline runs before sharding decode work."""
    p = _payloads(spark, sf_dir)
    modality = (
        F.when(F.length("payload") % 3 == 0, "image")
        .when(F.length("payload") % 3 == 1, "audio")
        .otherwise("video")
    )
    return (
        p.select(modality.alias("modality"),
                 F.length("payload").alias("nb"))
        .groupBy("modality")
        .agg(
            F.count("*").alias("n"),
            F.sum("nb").alias("total_bytes"),
            F.max("nb").alias("max_bytes"),
        )
    )


# ------------------------------------------------- real audio decode

#: mm_wav_meta geometry: all parameters derive from the byte length of
#: the source text so the oracle can reproduce the data chunk without
#: parsing any binary (same convention as mm_decode_ppm).
_WAV_RATES = (8000, 16000, 44100)
_WAV_FRAMES_MOD, _WAV_FRAMES_MIN = 50, 10


def decode_wav_real(payload: bytes) -> dict:
    """REAL dependency-free RIFF/WAV decode: verifies the RIFF/WAVE
    container, then WALKS the chunk list generically (honoring the
    spec's even-byte chunk padding), pulling PCM parameters from the
    ``fmt `` chunk and the raw samples from the ``data`` chunk —
    unknown chunks (LIST/INFO, cues, junk) are skipped by size, the
    way a real parser must.  Returns sample_rate / channels / bits /
    n_frames / duration_us / md5-of-samples; raises on anything
    malformed (truncated chunk, missing fmt/data, non-PCM)."""
    import hashlib
    import struct

    if len(payload) < 12 or bytes(payload[:4]) != b"RIFF" \
            or bytes(payload[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if riff_size != len(payload) - 8:
        raise ValueError(f"RIFF size {riff_size} != {len(payload) - 8}")
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(payload):
        cid = bytes(payload[i : i + 4])
        sz = struct.unpack_from("<I", payload, i + 4)[0]
        body = bytes(payload[i + 8 : i + 8 + sz])
        if len(body) != sz:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if sz < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are padded to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, rate, byte_rate, block_align, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"not PCM (fmt tag {audio_fmt})")
    # degenerate parameters would otherwise surface as
    # ZeroDivisionError below instead of the documented ValueError
    if rate <= 0 or channels <= 0 or bits < 8 or bits % 8 != 0:
        raise ValueError(
            f"degenerate fmt (rate={rate}, channels={channels}, "
            f"bits={bits})")
    if block_align != channels * (bits // 8) \
            or byte_rate != rate * block_align:
        raise ValueError("inconsistent fmt parameters")
    if len(data) % block_align:
        raise ValueError("data chunk not frame-aligned")
    n_frames = len(data) // block_align
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_us": n_frames * 1_000_000 // rate,
        "data_md5": hashlib.md5(data).hexdigest()[:8],
    }


def _wav_synth_decode(batches):
    """mapInPandas kernel: synthesize a REAL PCM WAV per document
    (struct-packed RIFF container; parameters from deterministic
    byte-length formulas; even-length docs get an extra odd-sized LIST
    chunk + pad byte so the parser's generic chunk walk and padding
    handling are genuinely exercised), then decode it with
    :func:`decode_wav_real`.  The parser sees only bytes — none of the
    construction formulas leak into it."""
    import struct

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            src = text.encode("utf-8") or b" "
            n = len(src)
            rate = _WAV_RATES[n % len(_WAV_RATES)]
            channels = n % 2 + 1
            bits = 16
            block = channels * (bits // 8)
            frames = n % _WAV_FRAMES_MOD + _WAV_FRAMES_MIN
            dl = frames * block
            data = (src * ((dl + n - 1) // n))[:dl]
            fmt = struct.pack(
                "<HHIIHH", 1, channels, rate, rate * block, block, bits
            )
            chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
            if n % 2 == 0:
                chunks += b"LIST" + struct.pack("<I", 5) + b"INFOJ" + b"\0"
            chunks += b"data" + struct.pack("<I", dl) + data
            payload = (
                b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
                + chunks
            )
            d = decode_wav_real(payload)
            rows.append(
                (int(doc_id), d["sample_rate"], d["channels"], d["bits"],
                 d["n_frames"], d["duration_us"], d["data_md5"])
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "sample_rate", "channels", "bits",
                     "n_frames", "duration_us", "data_md5"],
        )


@register(
    "mm_wav_meta",
    # ASCII PRECONDITION (ADVICE r5): repeat/substr/md5 below operate on
    # VARCHAR characters while the Spark kernel slices UTF-8 BYTES —
    # equal only because the documents corpus is pure ASCII (pinned by
    # test_documents_corpus_is_pure_ascii); a non-ASCII fixture would
    # hash-mismatch here, not in the kernel.
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents),
p AS (
  SELECT doc_id, text, n,
         [{", ".join(str(r) for r in _WAV_RATES)}]
           [n % {len(_WAV_RATES)} + 1] AS rate,
         n % 2 + 1 AS channels,
         (n % {_WAV_FRAMES_MOD} + {_WAV_FRAMES_MIN}) AS frames
  FROM g),
d AS (
  SELECT doc_id, rate, channels, frames,
         frames * channels * 2 AS dl
  FROM p)
SELECT d.doc_id,
       CAST(d.rate AS INT) AS sample_rate,
       CAST(d.channels AS INT) AS channels,
       16 AS bits,
       CAST(d.frames AS BIGINT) AS n_frames,
       CAST(d.frames * 1000000 // d.rate AS BIGINT) AS duration_us,
       substr(md5(substr(repeat(p.text, ((d.dl + p.n - 1) // p.n)::INT),
                         1, d.dl)), 1, 8) AS data_md5
FROM d JOIN p ON p.doc_id = d.doc_id
""",
    tags=("multimodal",),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def mm_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, end to end: synthesize an actual PCM RIFF/
    WAV container per document (real chunk structure, including odd-
    sized skip chunks with pad bytes on even-length docs) and parse it
    back with :func:`decode_wav_real` — the audio twin of
    :func:`mm_decode_ppm`.  The oracle recomputes sample rate /
    frame count / duration / sample-bytes md5 purely from the sizing
    formulas, verifying the parser bit-exactly.  Scale shape:
    executor-local Arrow batches through ``mapInPandas``, no shuffle,
    no driver involvement — 100 TB of audio shards linearly."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select("doc_id", "text").mapInPandas(
        _wav_synth_decode,
        "doc_id long, sample_rate int, channels int, bits int, "
        "n_frames long, duration_us long, data_md5 string",
    )



def _wav_synth_rms(batches):
    """mapInPandas kernel: same WAV synthesis as mm_wav_meta, decoded
    by :func:`decode_wav_real`, then SAMPLE-DOMAIN math: the data
    chunk reinterpreted as little-endian signed 16-bit PCM and reduced
    to integer sum-of-squares / max-abs — the energy features an audio
    curation pipeline computes (silence/clipping detection), all in
    exact int64 (no sqrt, no float: RMS ordering is monotone in the
    sum of squares)."""
    import struct

    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            src = text.encode("utf-8") or b" "
            n = len(src)
            rate = _WAV_RATES[n % len(_WAV_RATES)]
            channels = n % 2 + 1
            bits = 16
            block = channels * (bits // 8)
            frames = n % _WAV_FRAMES_MOD + _WAV_FRAMES_MIN
            dl = frames * block
            data = (src * ((dl + n - 1) // n))[:dl]
            fmt = struct.pack(
                "<HHIIHH", 1, channels, rate, rate * block, block, bits
            )
            chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
            if n % 2 == 0:
                chunks += b"LIST" + struct.pack("<I", 5) + b"INFOJ" + b"\0"
            chunks += b"data" + struct.pack("<I", dl) + data
            payload = (
                b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
                + chunks
            )
            d = decode_wav_real(payload)
            # decode gives back the verified container; the samples are
            # the data chunk bytes as <i2 (the parser proved alignment)
            samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
            rows.append((
                int(doc_id), len(samples),
                int((samples * samples).sum()),
                int(np.abs(samples).max()) if len(samples) else 0,
                d["sample_rate"],
            ))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_samples", "sumsq", "max_abs",
                           "sample_rate"],
        )


@register(
    "mm_wav_rms",
    # ASCII PRECONDITION: like mm_wav_meta, the oracle rebuilds the
    # PCM bytes from VARCHAR characters (ord == byte only for the
    # pure-ASCII corpus pinned by test_documents_corpus_is_pure_ascii).
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents),
p AS (
  SELECT doc_id, text, n,
         [{", ".join(str(r) for r in _WAV_RATES)}]
           [n % {len(_WAV_RATES)} + 1] AS rate,
         (n % 2 + 1) * 2 AS block,
         (n % {_WAV_FRAMES_MOD} + {_WAV_FRAMES_MIN}) AS frames
  FROM g),
d AS (
  SELECT doc_id, rate, frames * block AS dl,
         substr(repeat(text, ((frames * block + n - 1) // n)::INT),
                1, frames * block) AS raw
  FROM p),
sm AS (
  SELECT doc_id, rate, dl // 2 AS n_samples,
         list_transform(generate_series(1, dl // 2), i ->
           CASE WHEN ord(raw[2*i-1]) + 256 * ord(raw[2*i]) >= 32768
                THEN ord(raw[2*i-1]) + 256 * ord(raw[2*i]) - 65536
                ELSE ord(raw[2*i-1]) + 256 * ord(raw[2*i]) END) AS s
  FROM d)
SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS sumsq,
       CAST(list_max(list_transform(s, x -> abs(x))) AS INT) AS max_abs,
       CAST(rate AS INT) AS sample_rate
FROM sm
""",
    tags=("multimodal",),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def mm_wav_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio energy features over REAL decoded PCM: per document, the
    WAV container is synthesized, chunk-walked and verified by
    :func:`decode_wav_real`, and the sample stream reduced to integer
    sum-of-squares + max-abs (RMS ordering is monotone in sumsq, so no
    sqrt/float enters the result) — the silence/clipping screen of an
    audio curation pipeline.  Scale: one ``mapInPandas`` map stage,
    zero shuffle; the oracle rebuilds the int16 stream character-wise
    and must match bit-exactly."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select("doc_id", "text").mapInPandas(
        _wav_synth_rms,
        "doc_id long, n_samples long, sumsq long, max_abs int, "
        "sample_rate int",
    )


def _wav_synth_zcr(batches):
    """mapInPandas kernel: same WAV synthesis/decode as mm_wav_rms,
    then the DC-REMOVED zero-crossing count computed CHANNEL-
    CORRECTLY — the interleaved int16 stream reshaped (frames,
    channels) and adjacent FRAMES compared per channel (stride =
    channels; comparing interleaved neighbors would count L/R
    alternation as signal).  Crossings are counted about the stream
    MEAN, not raw zero (standard practice — and on this corpus raw
    zero would be vacuous: pure-ASCII high bytes can never set the
    int16 sign bit).  The mean never materializes: ``s*N >= S`` is
    the cross-multiplied exact integer form of ``s >= mean``."""
    import struct

    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            src = text.encode("utf-8") or b" "
            n = len(src)
            rate = _WAV_RATES[n % len(_WAV_RATES)]
            channels = n % 2 + 1
            bits = 16
            block = channels * (bits // 8)
            frames = n % _WAV_FRAMES_MOD + _WAV_FRAMES_MIN
            dl = frames * block
            data = (src * ((dl + n - 1) // n))[:dl]
            fmt = struct.pack(
                "<HHIIHH", 1, channels, rate, rate * block, block, bits
            )
            chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
            if n % 2 == 0:
                chunks += b"LIST" + struct.pack("<I", 5) + b"INFOJ" + b"\0"
            chunks += b"data" + struct.pack("<I", dl) + data
            payload = (
                b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
                + chunks
            )
            decode_wav_real(payload)  # container verified as in rms
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            fr = s.reshape(frames, channels)
            nonneg = fr * s.size >= s.sum()
            zc = int((nonneg[1:] != nonneg[:-1]).sum())
            rows.append((int(doc_id), channels, frames, zc))
        yield pd.DataFrame(
            rows, columns=["doc_id", "channels", "n_frames",
                           "zero_crossings"],
        )


@register(
    "mm_wav_zero_crossings",
    # ASCII PRECONDITION: same character-wise PCM rebuild as
    # mm_wav_rms (ord == byte only for the pure-ASCII corpus).
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents),
p AS (
  SELECT doc_id, text, n,
         n % 2 + 1 AS ch,
         (n % 2 + 1) * 2 AS block,
         (n % {_WAV_FRAMES_MOD} + {_WAV_FRAMES_MIN}) AS frames
  FROM g),
d AS (
  SELECT doc_id, ch, frames, frames * block AS dl,
         substr(repeat(text, ((frames * block + n - 1) // n)::INT),
                1, frames * block) AS raw
  FROM p),
sm AS (
  SELECT doc_id, ch, frames,
         list_transform(generate_series(1, dl // 2), i ->
           CASE WHEN ord(raw[2*i-1]) + 256 * ord(raw[2*i]) >= 32768
                THEN ord(raw[2*i-1]) + 256 * ord(raw[2*i]) - 65536
                ELSE ord(raw[2*i-1]) + 256 * ord(raw[2*i]) END) AS s
  FROM d),
t AS (
  SELECT doc_id, ch, frames, s,
         list_sum(s) AS ssum, ch * frames AS ns
  FROM sm)
SELECT doc_id, CAST(ch AS INT) AS channels,
       CAST(frames AS BIGINT) AS n_frames,
       CAST(COALESCE(list_sum(list_transform(
         generate_series(1, ns - ch), i ->
           CASE WHEN (s[i] * ns >= ssum) <> (s[i + ch] * ns >= ssum)
                THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings
FROM t
""",
    tags=("multimodal",),
    priority=900,  # demoted in r11 after r10 driver green, to rotate the r10/r9 carve-out backlog into the window (verified locally by tools/check_correctness.py)
)
def mm_wav_zero_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing rate over REAL decoded PCM — with energy (RMS),
    the other workhorse frame feature of audio curation (voiced/
    unvoiced and speech/noise screens use exactly the ZCR x energy
    plane).  Crossings are counted about the stream MEAN (DC-offset
    removal, as real pipelines do before counting — and required
    here, where ASCII-derived samples are never negative), via the
    cross-multiplied exact integer compare ``s*N >= S``.  The count
    is channel-correct: the stream is compared at stride
    ``channels``, so only genuine within-channel sign changes count
    (the oracle states the same stride over the flat sample list).
    Integer compares end to end; one ``mapInPandas`` map stage, zero
    shuffle."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select("doc_id", "text").mapInPandas(
        _wav_synth_zcr,
        "doc_id long, channels int, n_frames long, zero_crossings long",
    )



def _wav_synth_autocorr(batches):
    """mapInPandas kernel: same WAV synthesis/decode as mm_wav_rms,
    then the DC-removed LAG-1 AUTOCORRELATION components, channel-
    correctly (stride = channels) and in exact integers: with
    ``d_i = s_i*N - S`` (the cross-multiplied deviation, as in the
    ZCR kernel), the numerator is sum(d_i * d_{i+ch}) over adjacent
    same-channel frames and the denominator sum(d_i^2) over all
    samples — their ratio (computed downstream) is the classic
    normalized rho_1 of voiced/unvoiced detection.  Bounded exactly:
    |d| <= 2*32639*N with N <= 118 on this corpus, so every product
    and sum stays far inside int64."""
    import struct

    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            src = text.encode("utf-8") or b" "
            n = len(src)
            rate = _WAV_RATES[n % len(_WAV_RATES)]
            channels = n % 2 + 1
            bits = 16
            block = channels * (bits // 8)
            frames = n % _WAV_FRAMES_MOD + _WAV_FRAMES_MIN
            dl = frames * block
            data = (src * ((dl + n - 1) // n))[:dl]
            fmt = struct.pack(
                "<HHIIHH", 1, channels, rate, rate * block, block, bits
            )
            chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
            if n % 2 == 0:
                chunks += b"LIST" + struct.pack("<I", 5) + b"INFOJ" + b"\0"
            chunks += b"data" + struct.pack("<I", dl) + data
            payload = (
                b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
                + chunks
            )
            decode_wav_real(payload)  # container verified as in rms
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            N = s.size
            S = int(s.sum())
            d = s * N - S
            fr = d.reshape(frames, channels)
            lag1 = int((fr[1:] * fr[:-1]).sum())
            sumsq = int((d * d).sum())
            rows.append((int(doc_id), channels, frames, lag1, sumsq))
        yield pd.DataFrame(
            rows, columns=["doc_id", "channels", "n_frames",
                           "lag1_num", "sumsq_dev"],
        )


@register(
    "mm_wav_autocorr",
    # ASCII PRECONDITION: same character-wise PCM rebuild as
    # mm_wav_rms (ord == byte only for the pure-ASCII corpus).
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents),
p AS (
  SELECT doc_id, text, n,
         n % 2 + 1 AS ch,
         (n % 2 + 1) * 2 AS block,
         (n % {_WAV_FRAMES_MOD} + {_WAV_FRAMES_MIN}) AS frames
  FROM g),
d AS (
  SELECT doc_id, ch, frames, frames * block AS dl,
         substr(repeat(text, ((frames * block + n - 1) // n)::INT),
                1, frames * block) AS raw
  FROM p),
sm AS (
  SELECT doc_id, ch, frames,
         list_transform(generate_series(1, dl // 2), i ->
           CASE WHEN ord(raw[2*i-1]) + 256 * ord(raw[2*i]) >= 32768
                THEN ord(raw[2*i-1]) + 256 * ord(raw[2*i]) - 65536
                ELSE ord(raw[2*i-1]) + 256 * ord(raw[2*i]) END) AS s
  FROM d),
t AS (
  SELECT doc_id, ch, frames, s,
         list_sum(s) AS ssum, ch * frames AS ns
  FROM sm)
SELECT doc_id, CAST(ch AS INT) AS channels,
       CAST(frames AS BIGINT) AS n_frames,
       CAST(COALESCE(list_sum(list_transform(
         generate_series(1, ns - ch), i ->
           (s[i] * ns - ssum) * (s[i + ch] * ns - ssum))), 0)
         AS BIGINT) AS lag1_num,
       CAST(list_sum(list_transform(generate_series(1, ns), i ->
           (s[i] * ns - ssum) * (s[i] * ns - ssum)))
         AS BIGINT) AS sumsq_dev
FROM t
""",
    tags=("multimodal",),
    priority=900,  # demoted in r11 after r10 driver green, to rotate the r10/r9 carve-out backlog into the window (verified locally by tools/check_correctness.py)
)
def mm_wav_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation over REAL decoded PCM — the third frame
    feature of the audio-curation screen (with RMS energy and ZCR):
    normalized rho_1 separates voiced/tonal content (rho_1 -> 1) from
    noise (rho_1 -> 0), and is the 1-tap special case of the
    autocorrelation pitch detectors.  Both the numerator (adjacent
    same-channel frame products, stride = channels like the ZCR
    kernel) and the denominator (total squared deviation) are emitted
    as EXACT integers in the cross-multiplied ``s*N - S`` form, so no
    float enters either engine.  One ``mapInPandas`` map stage, zero
    shuffle — audio shards linearly at 100 TB."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select("doc_id", "text").mapInPandas(
        _wav_synth_autocorr,
        "doc_id long, channels int, n_frames long, lag1_num long, "
        "sumsq_dev long",
    )


# -------------------------------------------------- real PNG decode

#: mm_decode_png geometry (byte-length-derived, like mm_decode_ppm).
_PNG_W_MOD, _PNG_H_MOD = 29, 13


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_real(payload: bytes) -> dict:
    """REAL dependency-free PNG decode (zlib is stdlib): verifies the
    signature and every chunk CRC, parses IHDR, concatenates IDAT,
    inflates, and reconstructs ALL FIVE scanline filters (None/Sub/
    Up/Average/Paeth) to recover the raw raster.  Supports 8-bit
    greyscale (color type 0) and truecolor RGB (color type 2),
    non-interlaced — the baseline every real PNG writer emits.  Same
    contract as :func:`decode_image_real` (width/height/channels/
    feat_hash = md5 of the raw raster)."""
    import hashlib
    import struct
    import zlib

    if bytes(payload[:8]) != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    i = 8
    ihdr = None
    idat = b""
    seen_end = False
    while i + 8 <= len(payload):
        ln, ctype = struct.unpack_from(">I4s", payload, i)
        data = bytes(payload[i + 8 : i + 8 + ln])
        if len(data) != ln or i + 12 + ln > len(payload):
            raise ValueError(f"truncated chunk {ctype!r}")
        crc = struct.unpack_from(">I", payload, i + 8 + ln)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in chunk {ctype!r}")
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"IHDR length {len(data)} != 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_end = True
            break
        i += 12 + ln
    if ihdr is None or not idat or not seen_end:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, ctype_v, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, "
                         f"interlace={interlace})")
    channels = {0: 1, 2: 3}.get(ctype_v)
    if channels is None:
        raise ValueError(f"unsupported color type {ctype_v}")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:  # contract: malformed => ValueError
        raise ValueError(f"bad IDAT deflate stream: {exc}") from exc
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError(f"inflated size {len(raw)} != expected "
                         f"{h * (stride + 1)}")
    out = bytearray()
    prior = bytes(stride)
    bpp = channels
    for r in range(h):
        row = raw[r * (stride + 1) : (r + 1) * (stride + 1)]
        ftype, filt_bytes = row[0], row[1:]
        recon = bytearray(stride)
        for x in range(stride):
            fx = filt_bytes[x]
            a = recon[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                v = fx
            elif ftype == 1:
                v = fx + a
            elif ftype == 2:
                v = fx + b
            elif ftype == 3:
                v = fx + (a + b) // 2
            elif ftype == 4:
                v = fx + _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter type {ftype}")
            recon[x] = v & 0xFF
        out += recon
        prior = bytes(recon)
    return {
        "width": int(w),
        "height": int(h),
        "channels": channels,
        "feat_hash": hashlib.md5(bytes(out)).hexdigest()[:8],
    }


def encode_png(raster: bytes, w: int, h: int, channels: int) -> bytes:
    """Minimal REAL PNG writer (test/fixture side): 8-bit grey or RGB,
    one IDAT, filter type ``row % 5`` per scanline so a decoder must
    implement every filter reconstruction to round-trip it."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    stride = w * channels
    bpp = channels
    filtered = bytearray()
    prior = bytes(stride)
    for r in range(h):
        raw = raster[r * stride : (r + 1) * stride]
        ftype = r % 5
        filtered.append(ftype)
        for x in range(stride):
            a = raw[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                v = raw[x]
            elif ftype == 1:
                v = raw[x] - a
            elif ftype == 2:
                v = raw[x] - b
            elif ftype == 3:
                v = raw[x] - (a + b) // 2
            else:
                v = raw[x] - _paeth(a, b, c)
            filtered.append(v & 0xFF)
        prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8,
                       0 if channels == 1 else 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(filtered)))
            + chunk(b"IEND", b""))


def _png_synth_decode(batches):
    """mapInPandas kernel: build a REAL PNG per document (raster =
    text bytes cycled; filter types rotate through all five per
    scanline) and decode it back with :func:`decode_png_real` — the
    deflate round-trip and filter reconstructions are genuinely
    exercised; only width/height/raster derive from formulas the
    oracle can replay."""
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            src = text.encode("utf-8") or b" "
            n = len(src)
            w = n % _PNG_W_MOD + 1
            h = n % _PNG_H_MOD + 2
            need = w * h * 3
            raster = (src * ((need + n - 1) // n))[:need]
            payload = encode_png(raster, w, h, 3)
            d = decode_png_real(payload)
            rows.append(
                (int(doc_id), len(payload), d["width"], d["height"],
                 d["channels"], d["feat_hash"])
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_bytes", "width", "height", "channels",
                     "feat_hash"],
        )


@register(
    "mm_decode_png",
    # ASCII PRECONDITION (ADVICE r5): see mm_wav_meta — VARCHAR char ops
    # stand in for byte ops only while the corpus stays pure ASCII
    # (pinned by test_documents_corpus_is_pure_ascii).
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents),
p AS (
  SELECT doc_id, text, n,
         n % {_PNG_W_MOD} + 1 AS w,
         n % {_PNG_H_MOD} + 2 AS h
  FROM g)
SELECT doc_id, w AS width, h AS height, 3 AS channels,
       substr(md5(substr(repeat(text, ((w * h * 3 + n - 1) // n)::INT),
                         1, w * h * 3)), 1, 8) AS feat_hash
FROM p
""",
    tags=("multimodal",),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def mm_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end to end: a genuine deflate-compressed,
    CRC-checked, per-row-filtered PNG is built and decoded per
    document inside one ``mapInPandas`` pass — the decoder reverses
    real zlib compression and all five PNG filters, nothing about the
    sizing formulas leaks into it.  The oracle verifies width/height/
    raster-md5 exactly; ``n_bytes`` is intentionally NOT in the output
    (deflate length depends on zlib's encoder version, which the
    oracle cannot replay — the raster hash is the decode proof)."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select("doc_id", "text").mapInPandas(
        _png_synth_decode,
        "doc_id long, n_bytes long, width int, height int, "
        "channels int, feat_hash string",
    ).select("doc_id", "width", "height", "channels", "feat_hash")


# --------------------------------------------- r7: JPEG marker walk

_JPG_W_MOD, _JPG_H_MOD = 31, 17
_JPG_COM_MAX = 40


def decode_jpeg_header(payload: bytes) -> dict:
    """REAL dependency-free JPEG header parse: verify SOI, then WALK
    the marker segments the way every JPEG tool must — skip fill bytes
    (0xFF padding before a marker), read each segment's big-endian
    length, skip unknown/irrelevant segments by size, pull the image
    geometry from the first SOFn (distinguishing baseline SOF0 from
    progressive SOF2), and stop at SOS (entropy-coded data follows —
    a header parser never scans it).  Raises on anything malformed
    (missing SOI, truncated segment, standalone marker where a
    segment is required, SOS before SOF)."""
    if len(payload) < 4 or payload[0] != 0xFF or payload[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")
    i = 2
    sof = None
    progressive = False
    n_segments = 0
    com = b""
    while True:
        if i >= len(payload):
            raise ValueError("ran off the end before SOS/EOI")
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        while i < len(payload) and payload[i] == 0xFF:
            i += 1  # fill bytes
        if i >= len(payload):
            raise ValueError("truncated marker")
        marker = payload[i]
        i += 1
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if i + 2 > len(payload):
            raise ValueError("truncated segment length")
        seg_len = (payload[i] << 8) | payload[i + 1]
        if seg_len < 2 or i + seg_len > len(payload):
            raise ValueError(f"bad segment length {seg_len}")
        body = bytes(payload[i + 2 : i + seg_len])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if sof is None:
                if len(body) < 6:
                    raise ValueError("short SOF")
                precision = body[0]
                height = (body[1] << 8) | body[2]
                width = (body[3] << 8) | body[4]
                ncomp = body[5]
                if len(body) != 6 + 3 * ncomp:
                    raise ValueError("SOF component table size mismatch")
                sof = (precision, height, width, ncomp)
                progressive = marker == 0xC2
        elif marker == 0xFE:
            com = body
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            break
        n_segments += 1
        i += seg_len
    if sof is None:
        raise ValueError("no SOF segment")
    import hashlib

    return {
        "precision": sof[0], "height": sof[1], "width": sof[2],
        "components": sof[3], "progressive": progressive,
        "n_segments": n_segments,
        "com_md5": hashlib.md5(com).hexdigest()[:8],
    }


def encode_jpeg_header(text: bytes, n: int) -> bytes:
    """Structurally-genuine JPEG for one document: SOI, JFIF APP0, a
    COM segment carrying the doc prefix (variable size — exercises
    skip-by-length), a correctly-sized DQT, SOF0/SOF2 with real
    geometry, SOS, stuffed entropy bytes, EOI."""
    import struct

    w = n % _JPG_W_MOD + 1
    h = n % _JPG_H_MOD + 1
    ncomp = (n % 2) * 2 + 1          # 1 (gray) or 3 (YCbCr)
    sof_marker = 0xC2 if n % 3 == 0 else 0xC0
    com = text[:min(n, _JPG_COM_MAX)]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    comseg = seg(0xFE, com)
    dqt = seg(0xDB, bytes([0]) + bytes((i * 3 + n) % 256
                                       for i in range(64)))
    sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof_body += bytes([c + 1, 0x11, 0])
    sof = seg(sof_marker, sof_body)
    sos_body = bytes([ncomp]) + b"".join(
        bytes([c + 1, 0]) for c in range(ncomp)) + bytes([0, 63, 0])
    sos = seg(0xDA, sos_body)
    entropy = bytes(b if b != 0xFF else 0x00
                    for b in (text * 2)[:8])  # FF-free stuffed data
    return (b"\xff\xd8" + app0 + comseg + dqt + sof + sos + entropy
            + b"\xff\xd9")


def _jpeg_synth_decode(batches):
    import pandas as pd  # noqa: F811 — executor-side import

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            raw = text.encode("utf-8") or b" "
            n = len(raw)
            d = decode_jpeg_header(encode_jpeg_header(raw, n))
            rows.append((
                int(doc_id), d["width"], d["height"], d["components"],
                d["precision"], bool(d["progressive"]),
                d["n_segments"], d["com_md5"],
            ))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "width", "height", "components",
                     "precision", "progressive", "n_segments", "com_md5"],
        )


@register(
    "mm_jpeg_header",
    # ASCII precondition as mm_wav_meta: substr/md5 below act on
    # VARCHAR characters, the kernel on UTF-8 bytes — equal because
    # the corpus is pure ASCII (test_documents_corpus_is_pure_ascii).
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents)
SELECT doc_id,
       CAST(n % {_JPG_W_MOD} + 1 AS INT) AS width,
       CAST(n % {_JPG_H_MOD} + 1 AS INT) AS height,
       CAST((n % 2) * 2 + 1 AS INT) AS components,
       8 AS precision,
       n % 3 = 0 AS progressive,
       4 AS n_segments,
       substr(md5(substr(text, 1, LEAST(n, {_JPG_COM_MAX}))), 1, 8)
         AS com_md5
FROM g
""",
    tags=("multimodal",),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def mm_jpeg_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG header parse, end to end: synthesize a structurally-
    genuine JPEG per document (marker segments with real big-endian
    lengths, baseline/progressive SOF variants, a variable-size COM,
    FF-stuffed entropy bytes) and walk it back with
    :func:`decode_jpeg_header` — the image-container twin of
    :func:`mm_wav_meta`.  The oracle recomputes geometry and the COM
    digest purely from the sizing formulas, verifying the marker walk
    bit-exactly.  Scale shape: executor-local Arrow batches via
    ``mapInPandas``, no shuffle."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select("doc_id", "text").mapInPandas(
        _jpeg_synth_decode,
        "doc_id long, width int, height int, components int, "
        "precision int, progressive boolean, n_segments int, "
        "com_md5 string",
    )


# ------------------------------------------- r8: perceptual image hash

#: aHash grid: 4x4 cells -> 16-bit hash (the classic average-hash
#: geometry shrunk to the synthetic rasters' size; production uses 8x8
#: over 64px thumbnails — same math, bigger constants).
_AHASH_G = 4


def _ahash_cte_sql(g: int) -> str:
    """Oracle CTE chain computing (doc_id, w, h, ahash) at grid
    ``g``x``g`` from the generation formulas — shared by
    mm_image_ahash (g=4) and mm_ahash_neardup_pairs (g=7)."""
    return f"""g0 AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents),
g AS (
  SELECT doc_id, text, n,
         n % {_PPM_W_MOD} + 1 AS w,
         n % {_PPM_H_MOD} + 2 AS h
  FROM g0),
p AS (
  SELECT doc_id, w, h,
         substr(repeat(text, ((w * h * 3 + n - 1) // n)::INT),
                1, w * h * 3) AS pix
  FROM g),
px AS (
  SELECT doc_id, w, h,
         ascii(substr(pix, 3 * i + 1, 1))
           + ascii(substr(pix, 3 * i + 2, 1))
           + ascii(substr(pix, 3 * i + 3, 1)) AS lum,
         ((i % w) * {g}) // w AS gx,
         ((i // w) * {g}) // h AS gy
  FROM p, generate_series(0, {_PPM_MAX_PIX}) s(i)
  WHERE i < w * h),
cells AS (
  SELECT doc_id, w, h, gx, gy,
         CAST(sum(lum) AS BIGINT) AS cs, count(*) AS cn
  FROM px GROUP BY 1, 2, 3, 4, 5),
tot AS (
  SELECT doc_id, CAST(sum(cs) AS BIGINT) AS gs,
         CAST(sum(cn) AS BIGINT) AS gn
  FROM cells GROUP BY 1),
bits AS (
  SELECT c.doc_id, c.w, c.h,
         CASE WHEN c.cs * t.gn >= t.gs * c.cn THEN 1 ELSE 0 END
           * (1::BIGINT << (c.gy * {g} + c.gx)) AS bv
  FROM cells c JOIN tot t USING (doc_id)),
hashes AS (
  SELECT doc_id, CAST(max(w) AS BIGINT) AS width,
         CAST(max(h) AS BIGINT) AS height,
         CAST(sum(bv) AS BIGINT) AS ahash
  FROM bits GROUP BY doc_id)"""


@register(
    "mm_image_ahash",
    oracle=f"""
WITH {_ahash_cte_sql(_AHASH_G)}
SELECT doc_id, width, height, ahash FROM hashes
""",
    tags=("multimodal", "dedup"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash over REAL image decode — the image-side
    near-dup primitive (two images whose aHashes sit within a small
    Hamming distance are visual duplicates; banding then follows
    dedup_simhash's blocking exactly).  Each synthesized P6 payload is
    parsed from its actual bytes (header tokens + raster slice — the
    same parser mm_decode_ppm drives), the raster is reduced to a
    {_AHASH_G}x{_AHASH_G} luminance grid with floor-mapped cells, and
    bit (gy,gx) is set iff the cell's mean luminance >= the global
    mean — compared as exact integer cross-products (cs*gn >= gs*cn),
    so no float ever appears and the oracle reproduces the hash from
    the generation formulas alone.  Scale shape: executor-local Arrow
    batches through ``mapInPandas``, one small output row per image,
    no shuffle."""
    return _ahash_df(spark, sf_dir, _AHASH_G)


def _ahash_df(spark: SparkSession, sf_dir: str, g: int) -> DataFrame:
    """(doc_id, width, height, ahash) at grid ``g``x``g`` via the real
    P6 parse — the Spark twin of :func:`_ahash_cte_sql`."""
    import numpy as np
    import pandas as pd

    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    n0 = F.octet_length("text")
    n = F.greatest(n0, F.lit(1))
    src = F.when(n0 == 0, F.lit(" ")).otherwise(F.col("text"))
    sized = docs.select(
        "doc_id", src.alias("text"), n.alias("n"),
        (n % _PPM_W_MOD + 1).alias("w"),
        (n % _PPM_H_MOD + 2).alias("h"),
    )
    pix = F.expr("substring(repeat(text, CAST((w * h * 3 + n - 1) "
                 "DIV n AS INT)), 1, w * h * 3)")
    payload = F.encode(
        F.concat(
            F.lit("P6\n"), F.col("w").cast("string"), F.lit(" "),
            F.col("h").cast("string"), F.lit("\n255\n"), pix,
        ),
        "UTF-8",
    )
    p = sized.select("doc_id", payload.alias("payload"))
    G = g

    def kernel(batches):
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(blob)
                (w, h, maxval), off = _pnm_header_tokens(b, 3)
                raster = np.frombuffer(
                    b, dtype=np.uint8, count=w * h * 3, offset=off
                ).astype(np.int64)
                lum = raster.reshape(h, w, 3).sum(axis=2)
                ys, xs = np.indices((h, w))
                cell = (ys * G) // h * G + (xs * G) // w
                cs = np.bincount(cell.ravel(), weights=lum.ravel(),
                                 minlength=G * G).astype(np.int64)
                cn = np.bincount(cell.ravel(), minlength=G * G) \
                    .astype(np.int64)
                gs, gn = int(cs.sum()), int(cn.sum())
                bits = (cs * gn >= gs * cn) & (cn > 0)
                ahash = int(sum(1 << k for k in np.nonzero(bits)[0]))
                out.append((int(doc_id), w, h, ahash))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "ahash"])

    return p.mapInPandas(
        kernel, "doc_id long, width long, height long, ahash long"
    )


#: Banded-Hamming geometry for image near-dup pairs: 7x7 grid ->
#: 49-bit hash, 7 bands of 7 bits; hd <= _AHASH_MAX_HD pairs survive.
#: Pigeonhole: two hashes within Hamming distance 6 must agree on at
#: least one of 7 bands, so the band equi-join loses nothing.
_AHASH_PAIR_G = 7
_AHASH_BANDS = 7
_AHASH_MAX_HD = 6


@register(
    "mm_ahash_neardup_pairs",
    oracle=f"""
WITH {_ahash_cte_sql(_AHASH_PAIR_G)},
banded AS (
  SELECT doc_id, ahash, b,
         (ahash >> (b * {_AHASH_BANDS})) & 127 AS bandval
  FROM hashes, generate_series(0, {_AHASH_BANDS - 1}) s(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.ahash AS ha, b.ahash AS hb
  FROM banded a JOIN banded b
    ON a.b = b.b AND a.bandval = b.bandval
   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hd
FROM cand
WHERE bit_count(xor(ha, hb)) <= {_AHASH_MAX_HD}
""",
    tags=("multimodal", "dedup"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def mm_ahash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-duplicate pairs by banded Hamming blocking over the
    perceptual hash — dedup_simhash_pairs' architecture applied to the
    image modality: a 7x7 (49-bit) average-hash per image, split into
    7 bands of 7 bits; candidate pairs share at least one exact band
    (pigeonhole: hd <= 6 over 49 bits guarantees an agreeing band, so
    blocking is LOSSLESS for the threshold), then the exact Hamming
    distance verifies.  Never all-pairs: the join is a band-value
    equi-join whose bucket sizes the 128-value band domain bounds.
    One decode scan + one bounded self-join — the image twin of the
    text near-dup plan, proving the dedup architecture is
    modality-generic."""
    hashes = _ahash_df(spark, sf_dir, _AHASH_PAIR_G).select(
        "doc_id", "ahash").transform(pin)
    bands = hashes.select(
        "doc_id", "ahash",
        F.explode(
            F.array(*[F.lit(b) for b in range(_AHASH_BANDS)])
        ).alias("b"),
    ).select(
        "doc_id", "ahash", "b",
        F.expr(f"shiftright(ahash, CAST(b * {_AHASH_BANDS} AS INT)) "
               f"& 127").alias("bandval"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bandval") == F.col("b.bandval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    hd = F.bit_count(F.expr("ha ^ hb"))
    return (
        cand.filter(hd <= _AHASH_MAX_HD)
        .select("doc_a", "doc_b", hd.cast("long").alias("hd"))
    )


# ------------------------- late r9: real GIF decode (real LZW codec)

_GIF_W_MOD, _GIF_H_MOD = 11, 7
_GIF_MAX_WIDTH = 12  # spec: LZW codes never exceed 12 bits


def _gif_lzw_encode(indices: bytes, mcs: int) -> bytes:
    """REAL variable-width GIF LZW encoder: dictionary-building
    phrase compression, the 4096-entry cap handled by an emitted
    CLEAR + reset, LSB-first bit packing.  Code WIDTH is driven by a
    simulation of the DECODER's table growth (the decoder adds one
    entry per code read except the first after a clear, so its table
    lags the encoder's by one except at the final flush code — no
    static rule on the encoder's own table stays in sync at both
    places; tracking the reader's state does, by construction).
    Round-trip fuzzed incl. width bumps, KwKwK and the cap in
    tests/test_multimodal.py."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits, nbits = 0, 0
    out = bytearray()
    dec_len, dec_width, first = eoi + 1, mcs + 1, True

    def emit(code: int) -> None:
        nonlocal bits, nbits
        bits |= code << nbits
        nbits += dec_width
        while nbits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8

    def emit_data(code: int) -> None:
        # a data code: after reading it the decoder adds one table
        # entry (unless it is the first after a clear) and may widen
        nonlocal dec_len, dec_width, first
        emit(code)
        if first:
            first = False
            return
        dec_len += 1
        if dec_len == (1 << dec_width) and dec_width < _GIF_MAX_WIDTH:
            dec_width += 1

    def reset_reader() -> None:
        nonlocal dec_len, dec_width, first
        dec_len, dec_width, first = eoi + 1, mcs + 1, True

    table = {(i,): i for i in range(1 << mcs)}
    next_code = eoi + 1
    emit(clear)
    w: tuple = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit_data(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << _GIF_MAX_WIDTH):
            emit(clear)
            reset_reader()
            table = {(i,): i for i in range(1 << mcs)}
            next_code = eoi + 1
        w = (k,)
    if w:
        emit_data(table[w])
    emit(eoi)
    if nbits:
        out.append(bits & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int) -> bytes:
    """REAL GIF LZW decoder: variable code width, the KwKwK
    first-use case, CLEAR resets, EOI termination — raises on any
    malformed stream (code beyond the table, missing EOI)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = 0  # bit cursor
    total = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total:
            raise ValueError("gif: LZW stream truncated")
        byte, bit = pos >> 3, pos & 7
        val = int.from_bytes(
            data[byte:byte + (bit + width + 7) // 8 + 1], "little")
        pos += width
        return (val >> bit) & ((1 << width) - 1)

    def fresh():
        return ([bytes([i]) for i in range(1 << mcs)]
                + [b"", b""]), mcs + 1

    table, width = fresh()
    out = bytearray()
    prev = None
    while True:
        code = read(width)
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"gif: LZW code {code} beyond table")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if (len(table) == (1 << width)
                    and width < _GIF_MAX_WIDTH):
                width += 1
        prev = entry
    raise ValueError("gif: missing EOI")


def decode_gif_real(payload: bytes) -> dict:
    """REAL dependency-free GIF decode: validates the GIF87a/89a
    signature, reads the logical screen descriptor + global color
    table, SKIPS extension blocks generically (0x21 introducer +
    sub-block walk — the way a real parser must), parses the image
    descriptor, then LZW-decompresses the pixel data from its
    sub-block chain and verifies the index raster's length and range
    against the descriptor and palette.  Returns width / height /
    ncolors / n_pixels / md5-of-index-raster."""
    import hashlib
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    w_s, h_s, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    off = 13
    ncolors = 0
    if flags & 0x80:
        ncolors = 2 << (flags & 0x07)
        off += 3 * ncolors
    while True:
        if off >= len(payload):
            raise ValueError("gif: no image descriptor")
        intro = payload[off]
        if intro == 0x21:  # extension: label + sub-blocks
            off += 2
            while payload[off]:
                off += 1 + payload[off]
            off += 1
        elif intro == 0x2C:
            break
        else:
            raise ValueError(f"gif: unexpected block 0x{intro:02x}")
    left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload,
                                                 off + 1)
    off += 10
    if iflags & 0x80:
        raise ValueError("gif: local color tables unsupported here")
    if iflags & 0x40:
        raise ValueError("gif: interlace unsupported here")
    mcs = payload[off]
    off += 1
    lzw = bytearray()
    while payload[off]:
        n = payload[off]
        lzw += payload[off + 1:off + 1 + n]
        off += 1 + n
    off += 1
    if payload[off:off + 1] != b"\x3b":
        raise ValueError("gif: missing trailer")
    idx = _gif_lzw_decode(bytes(lzw), mcs)
    if len(idx) != w * h:
        raise ValueError(
            f"gif: decoded {len(idx)} pixels for {w}x{h}")
    if ncolors and idx and max(idx) >= ncolors:
        raise ValueError("gif: index beyond palette")
    return {
        "width": int(w), "height": int(h), "ncolors": int(ncolors),
        "n_pixels": len(idx),
        "feat_hash": hashlib.md5(idx).hexdigest()[:8],
    }


def _gif_synth_decode(batches):
    """mapInPandas kernel: build a REAL GIF87a per document (global
    color table, a skipped 0x21 comment extension for parser realism,
    LZW-compressed index raster in sub-blocks) and decode it with
    :func:`decode_gif_real` — the parser sees only bytes."""
    import struct

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            src = text.encode("utf-8") or b" "
            n = len(src)
            w = n % _GIF_W_MOD + 2
            h = n % _GIF_H_MOD + 2
            mcs = n % 3 + 2
            nc = 1 << mcs
            need = w * h
            body = (src * ((need + n - 1) // n))[:need]
            idx = bytes(b % (nc - 1) + 1 for b in body)
            gct = bytes(
                x for i in range(nc)
                for x in ((i * 37) % 256, (i * 59) % 256,
                          (i * 83) % 256))
            lzw = _gif_lzw_encode(idx, mcs)
            blocks = b"".join(
                bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
                for i in range(0, len(lzw), 255)) + b"\x00"
            payload = (
                b"GIF87a"
                + struct.pack("<HHBBB", w, h, 0x80 | (mcs - 1), 0, 0)
                + gct
                + b"\x21\xfe\x04gifc\x00"  # comment ext (skipped)
                + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
                + bytes([mcs]) + blocks + b"\x3b"
            )
            d = decode_gif_real(payload)
            rows.append((int(doc_id), d["n_pixels"], d["width"],
                         d["height"], d["ncolors"], d["feat_hash"]))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_pixels", "width", "height",
                           "ncolors", "feat_hash"],
        )


@register(
    "mm_decode_gif",
    # ASCII PRECONDITION: the oracle rebuilds the index raster from
    # VARCHAR characters (same contract as mm_decode_bmp); indices
    # are 1..ncolors-1 so chr() never needs NUL.
    oracle=f"""
WITH g0 AS (
  SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN ' '
              ELSE text END AS text,
         GREATEST(octet_length(encode(text)), 1) AS n
  FROM documents),
g AS (
  SELECT doc_id, text, n,
         n % {_GIF_W_MOD} + 2 AS w,
         n % {_GIF_H_MOD} + 2 AS h,
         1 << (n % 3 + 2) AS nc
  FROM g0),
px AS (
  SELECT doc_id, w, h, nc,
         substr(repeat(text, ((w * h + n - 1) // n)::INT),
                1, w * h) AS body
  FROM g),
idx AS (
  SELECT doc_id, w, h, nc,
         list_aggregate(list_transform(generate_series(1, w * h),
             i -> chr(CAST(ord(substr(body, i, 1)) % (nc - 1) + 1
                           AS INT))),
           'string_agg', '') AS raster
  FROM px)
SELECT doc_id, CAST(w * h AS BIGINT) AS n_pixels,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(nc AS INT) AS ncolors,
       substr(md5(raster), 1, 8) AS feat_hash
FROM idx
""",
    tags=("multimodal",),
    priority=900,  # demoted in r11 after r10 driver green, to rotate the r10/r9 carve-out backlog into the window (verified locally by tools/check_correctness.py)
)
def mm_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode end to end — the fourth raster container
    (after PPM, PNG, BMP) and the first with a REAL dictionary
    compression codec: each document becomes a GIF87a with a global
    color table, a comment extension the parser must skip, and an
    LZW-compressed index raster (variable code widths swept by the
    mcs = n%3+2 formula; the sub-block chain split at 255 bytes),
    decoded back by :func:`decode_gif_real` whose
    :func:`_gif_lzw_decode` is a full decoder — width growth, KwKwK,
    CLEAR resets (round-trip fuzzed incl. the 4096-entry cap in
    tests/test_multimodal.py).  The oracle restates only
    POST-decode facts (geometry, palette size, md5 of the index
    raster rebuilt character-wise) — compressed byte counts are
    dictionary-dependent and deliberately absent.  One
    ``mapInPandas`` map stage, zero shuffle."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select("doc_id", "text").mapInPandas(
        _gif_synth_decode,
        "doc_id long, n_pixels long, width int, height int, "
        "ncolors int, feat_hash string",
    )
