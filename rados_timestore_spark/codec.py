"""Wire codec for the reference's packed point blobs.

Wire format (lib/TimeStore/Algorithms.hs:100-178, Core.hs:260-270):
a concatenation of records, each starting with a 24-byte header of
three little-endian Word64s — (address, time, payload).  If the
address LSB is clear the record is exactly the header (payload = the
simple value); if set, the header is followed by ``payload`` raw bytes
(the extended blob).

Decoding is a sequential scan (record boundaries depend on prior
lengths), so one blob decodes on one executor — parallelism comes from
many blobs (one per row of a binary-column DataFrame), exactly how the
reference parallelizes over many client writes.  Implemented with
``mapInPandas`` (Arrow batches in, Arrow batches out); numpy does the
fixed-stride header decode vectorized where possible.

A parse error poisons the whole blob (``Either SomeException`` in
``groupMixed``, Algorithms.hs:111-127) — we mirror that by raising,
failing the task.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

POINT_SCHEMA_DDL = (
    "address long, time long, value long, payload binary, seq long"
)


def decode_blob(blob: bytes, seq_start: int = 0) -> list[tuple]:
    """Decode one packed wire blob into point tuples.

    Returns [(address, time, value, payload, seq)] where value is set
    for simple points and payload for extended ones.  ``seq`` numbers
    records in blob order (the reference's implicit append order that
    first-write-wins dedup depends on, Algorithms.hs:209).
    """
    out: list[tuple] = []
    off = 0
    n = len(blob)
    seq = seq_start
    while off < n:
        if off + 24 > n:
            raise ValueError(f"truncated point header at offset {off}")
        addr, time, payload = struct.unpack_from("<QQQ", blob, off)
        off += 24
        # Reinterpret Word64 as signed i64 (Spark LongType); bit
        # patterns — and therefore bucket placement and kind — are
        # preserved.
        addr_s = addr - (1 << 64) if addr >= (1 << 63) else addr
        time_s = time - (1 << 64) if time >= (1 << 63) else time
        if addr & 1:  # extended: length-prefixed blob follows
            if off + payload > n:
                raise ValueError(f"truncated extended payload at offset {off}")
            out.append((addr_s, time_s, None, blob[off : off + payload], seq))
            off += payload
        else:
            val_s = payload - (1 << 64) if payload >= (1 << 63) else payload
            out.append((addr_s, time_s, val_s, None, seq))
        seq += 1
    return out


def encode_points(points: Iterable[tuple]) -> bytes:
    """Inverse of :func:`decode_blob`: pack (address, time, value,
    payload) tuples into the wire format."""
    parts: list[bytes] = []
    for row in points:
        addr, time, value, payload = row[0], row[1], row[2], row[3]
        addr_u = addr & ((1 << 64) - 1)
        time_u = time & ((1 << 64) - 1)
        if addr_u & 1:
            if payload is None:
                raise ValueError("extended point requires payload bytes")
            parts.append(struct.pack("<QQQ", addr_u, time_u, len(payload)))
            parts.append(bytes(payload))
        else:
            if value is None:
                raise ValueError("simple point requires a value")
            parts.append(struct.pack("<QQQ", addr_u, time_u, value & ((1 << 64) - 1)))
    return b"".join(parts)


def decode_wire_df(blobs: DataFrame, blob_col: str = "blob",
                   seq_col: str | None = "seq_base") -> DataFrame:
    """Decode a DataFrame of wire blobs into a points DataFrame.

    ``blobs`` must have a binary column ``blob_col``; if ``seq_col`` is
    present it seeds each blob's sequence numbers (callers assign
    disjoint blocks, e.g. ``blob_no << 32``) so cross-blob first-wins
    order is deterministic.
    """
    has_seq = seq_col is not None and seq_col in blobs.columns
    cols = [blob_col] + ([seq_col] if has_seq else [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for i in range(len(pdf)):
                blob = pdf[blob_col].iloc[i]
                base = int(pdf[seq_col].iloc[i]) if has_seq else 0
                rows.extend(decode_blob(bytes(blob), base))
            yield pd.DataFrame(
                rows, columns=["address", "time", "value", "payload", "seq"]
            )

    return blobs.select(*cols).mapInPandas(gen, POINT_SCHEMA_DDL)
