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
reference parallelizes over many client writes.  Within a blob, runs
of consecutive *simple* records have a fixed 24-byte stride and are
decoded with one numpy ``frombuffer`` view per run (vectorized header
decode); the Python loop only advances at extended records, whose
variable length forces sequential parsing.

A parse error poisons the whole blob (``Either SomeException`` in
``groupMixed``, Algorithms.hs:111-127) — we mirror that by raising,
failing the task.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

POINT_SCHEMA_DDL = (
    "address long, time long, value long, payload binary, seq long"
)


def _signed(u: int) -> int:
    """Reinterpret Word64 as signed i64 (Spark LongType); bit patterns
    — and therefore bucket placement and kind — are preserved."""
    return u - (1 << 64) if u >= (1 << 63) else u


def decode_blob_columns(
    blob: bytes,
) -> tuple[np.ndarray, np.ndarray, list, list]:
    """Decode one packed wire blob into columns
    ``(address, time, value, payload)``.

    ``address``/``time`` are i64 numpy arrays; ``value``/``payload``
    are Python lists with ``None`` holes (nullable columns).  Simple
    runs decode via strided numpy views; only extended records take the
    scalar path.
    """
    off = 0
    n = len(blob)
    addr_parts: list[np.ndarray] = []
    time_parts: list[np.ndarray] = []
    values: list = []
    payloads: list = []
    while off < n:
        if off + 24 > n:
            raise ValueError(f"truncated point header at offset {off}")
        k = (n - off) // 24
        arr = np.frombuffer(blob, dtype="<u8", offset=off, count=3 * k)
        arr = arr.reshape(k, 3)
        odd = np.nonzero(arr[:, 0] & 1)[0]
        m = int(odd[0]) if odd.size else k
        if m:  # a run of m simple records, fixed 24-byte stride
            addr_parts.append(arr[:m, 0].astype("<u8").view("<i8"))
            time_parts.append(arr[:m, 1].astype("<u8").view("<i8"))
            values.extend(arr[:m, 2].astype("<u8").view("<i8").tolist())
            payloads.extend([None] * m)
            off += 24 * m
            # tail shorter than 24B after a clean run is a torn header
            if off < n and n - off < 24:
                raise ValueError(f"truncated point header at offset {off}")
            continue
        addr_u, time_u, length = struct.unpack_from("<QQQ", blob, off)
        off += 24
        if off + length > n:
            raise ValueError(f"truncated extended payload at offset {off}")
        addr_parts.append(np.array([_signed(addr_u)], dtype="<i8"))
        time_parts.append(np.array([_signed(time_u)], dtype="<i8"))
        values.append(None)
        payloads.append(blob[off : off + length])
        off += length
    if not addr_parts:
        empty = np.empty(0, dtype="<i8")
        return empty, empty, [], []
    return (
        np.concatenate(addr_parts),
        np.concatenate(time_parts),
        values,
        payloads,
    )


def decode_blob(blob: bytes, seq_start: int = 0) -> list[tuple]:
    """Decode one packed wire blob into point tuples.

    Returns [(address, time, value, payload, seq)] where value is set
    for simple points and payload for extended ones.  ``seq`` numbers
    records in blob order (the reference's implicit append order that
    first-write-wins dedup depends on, Algorithms.hs:209).
    """
    addrs, times, values, payloads = decode_blob_columns(blob)
    return [
        (int(a), int(t), v, p, seq_start + i)
        for i, (a, t, v, p) in enumerate(
            zip(addrs.tolist(), times.tolist(), values, payloads)
        )
    ]


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
            frames = []
            for i in range(len(pdf)):
                blob = bytes(pdf[blob_col].iloc[i])
                base = int(pdf[seq_col].iloc[i]) if has_seq else 0
                addrs, times, values, payloads = decode_blob_columns(blob)
                frames.append(pd.DataFrame({
                    "address": addrs,
                    "time": times,
                    "value": pd.Series(values, dtype=object),
                    "payload": pd.Series(payloads, dtype=object),
                    "seq": np.arange(base, base + len(addrs), dtype="<i8"),
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)
            else:
                yield pd.DataFrame({
                    "address": pd.Series(dtype="int64"),
                    "time": pd.Series(dtype="int64"),
                    "value": pd.Series(dtype=object),
                    "payload": pd.Series(dtype=object),
                    "seq": pd.Series(dtype="int64"),
                })

    return blobs.select(*cols).mapInPandas(gen, POINT_SCHEMA_DDL)
